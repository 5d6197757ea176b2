"""Device-resident sampler (sampler/device_sampler.py): same distribution
contract as the host samplers — negatives never collide with train-true
triples, iid uniform over the allowed set, word2vec subsampling weights,
tail-first alternation — with the whole pipeline jitted on the device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu.data.filterset import FilterSets, subsampling_weights
from knowledgegraphembedding_tpu.sampler.device_sampler import (
    DeviceSampler,
    _DeviceCSR,
    build_device_iterator,
)
from knowledgegraphembedding_tpu.sampler.negative import HEAD_BATCH, TAIL_BATCH


def _graph(E=60, R=4, T=400, seed=0):
    rng = np.random.default_rng(seed)
    tr = np.stack(
        [rng.integers(0, E, T), rng.integers(0, R, T), rng.integers(0, E, T)], 1
    )
    return np.unique(tr, axis=0).astype(np.int32)


def test_device_csr_membership_matches_numpy():
    """CSR member() == exact set membership, including the neighbor-window
    masking (values of key k+1 must not contaminate key k's window)."""
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 50, 300).astype(np.int32)
    vals = rng.integers(0, 70, 300).astype(np.int32)
    csr = _DeviceCSR(keys, vals, n_keys=50, sentinel=70)
    pairs = set(zip(keys.tolist(), vals.tolist()))
    qk = rng.integers(0, 50, 8).astype(np.int32)
    qv = rng.integers(0, 70, (8, 64)).astype(np.int32)
    got = np.asarray(csr.member(jnp.asarray(qk), jnp.asarray(qv)))
    want = np.array(
        [[(int(k), int(v)) in pairs for v in row] for k, row in zip(qk, qv)]
    )
    assert (got == want).all()


def test_device_csr_adjacent_key_no_contamination():
    # key 0 has ONE value, key 1 has many — key 0 lookups near key 1's
    # values must not collide through the shared Kmax window
    keys = np.array([0] + [1] * 10, np.int32)
    vals = np.array([5] + list(range(10, 20)), np.int32)
    csr = _DeviceCSR(keys, vals, n_keys=2, sentinel=99)
    qk = jnp.asarray(np.zeros(1, np.int32))
    qv = jnp.asarray(np.array([[5, 10, 15, 19]], np.int32))
    got = np.asarray(csr.member(qk, qv))[0]
    assert got.tolist() == [True, False, False, False]


@pytest.mark.parametrize("mode", [HEAD_BATCH, TAIL_BATCH])
def test_no_train_true_collisions(mode):
    train = _graph()
    s = DeviceSampler(train, 60, 4, batch_size=32, negative_sample_size=16,
                      mode=mode, seed=3)
    tr = set(map(tuple, train.tolist()))
    for _ in range(5):
        pos, neg, w, m = s.next_batch()
        pos, neg = np.asarray(pos), np.asarray(neg)
        for b in range(32):
            h, r, t = pos[b]
            for x in neg[b]:
                corrupted = (x, r, t) if mode == HEAD_BATCH else (h, r, x)
                assert corrupted not in tr


def test_uniform_over_allowed():
    """Negatives for a fixed positive are uniform over the non-true set."""
    E = 20
    train = np.array([[0, 0, j] for j in range(6)], np.int32)  # true tails 0..5
    s = DeviceSampler(train, E, 1, batch_size=4, negative_sample_size=64,
                      mode=TAIL_BATCH, seed=0)
    counts = np.zeros(E)
    for _ in range(60):
        pos, neg, w, _ = s.next_batch()
        pos, neg = np.asarray(pos), np.asarray(neg)
        for b in range(4):
            if pos[b, 0] == 0:
                np.add.at(counts, neg[b], 1)
    assert counts[:6].sum() == 0  # true tails never drawn
    allowed = counts[6:]
    assert allowed.min() > 0
    # chi-square-ish sanity: all allowed entities within 4 sigma of the mean
    mean = allowed.mean()
    assert (np.abs(allowed - mean) < 4 * np.sqrt(mean) + 8).all()


def test_weights_and_positions_match_host_path():
    train = _graph(seed=7)
    w_host = subsampling_weights(train, 4)
    s = DeviceSampler(train, 60, 4, batch_size=16, negative_sample_size=8,
                      mode=TAIL_BATCH, seed=5)
    pos, neg, w, _ = s.next_batch()
    pos, w = np.asarray(pos), np.asarray(w)
    # every positive is a train triple and carries ITS subsampling weight
    lookup = {tuple(t): w_host[i] for i, t in enumerate(train.tolist())}
    for b in range(16):
        assert tuple(pos[b].tolist()) in lookup
        assert w[b] == pytest.approx(lookup[tuple(pos[b].tolist())], rel=1e-6)


def test_tail_first_alternation_and_epoch_coverage():
    train = _graph(seed=2)
    it = build_device_iterator(train, 60, 4, batch_size=25,
                               negative_sample_size=4, seed=0)
    modes = [next(it)[3] for _ in range(4)]
    assert modes == [TAIL_BATCH, HEAD_BATCH, TAIL_BATCH, HEAD_BATCH]

    # one full epoch of tail batches covers every train triple exactly once
    n = len(train)
    bs = 25
    seen = []
    it2 = build_device_iterator(train, 60, 4, batch_size=bs,
                                negative_sample_size=4, seed=0)
    n_batches = -(-n // bs)
    got = 0
    while got < n_batches:
        pos, _, _, mode = next(it2)
        if mode != TAIL_BATCH:
            continue
        seen.append(np.asarray(pos))
        got += 1
    seen = np.concatenate(seen)[:n]
    assert len(np.unique(seen, axis=0)) == n


def test_shared_negatives_shape():
    train = _graph()
    it = build_device_iterator(train, 60, 4, batch_size=16,
                               negative_sample_size=8, seed=0,
                               negative_sharing="batch")
    pos, neg, w, mode = next(it)
    assert neg.shape == (1, 8)


def test_int32_key_guard():
    train = np.zeros((4, 3), np.int32)
    with pytest.raises(ValueError, match="int32"):
        DeviceSampler(train, 2**17, 2**15, 4, 4, TAIL_BATCH)


def test_train_e2e_with_device_sampler(tmp_path):
    """CLI flow with --sampler_backend device learns and matches artifact
    contract."""
    from knowledgegraphembedding_tpu import cli
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from tests.test_cli import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test",
        "--data_path", data_dir, "--model", "RotatE", "-de",
        "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
        "-lr", "0.01", "--max_steps", "120", "--log_steps", "60",
        "--sampler_backend", "device", "--test_batch_size", "4",
        "-save", save_dir,
    ])
    assert metrics["test"]["MRR"] > 0.15  # learns well above chance (~0.06)


def test_dense_graph_topup_terminates():
    """A (h,r) whose true-tail set covers 90% of entities: completing n=8
    negatives from the 2 allowed entities requires accumulating valid draws
    across rounds (a replace-instead-of-merge loop would effectively never
    terminate: P(>=8 valid in one 16-draw round) ~ 1e-5)."""
    E, n = 20, 8
    train = np.array([[0, 0, t] for t in range(18)], np.int32)  # tails 0..17
    s = DeviceSampler(train, E, 1, batch_size=4, negative_sample_size=n,
                      mode=TAIL_BATCH, seed=0)
    for _ in range(3):
        pos, neg, w, _ = s.next_batch()
        neg = np.asarray(neg)
        assert set(np.unique(neg)) <= {18, 19}  # only the allowed entities


def test_gap_map_is_exhaustively_exact():
    """gap_map(u) must return EXACTLY the u-th smallest non-true entity for
    every u in [0, E - c), for keys with gaps at the edges, adjacent runs,
    duplicate train triples (deduplicated at CSR build), and an empty set."""
    from knowledgegraphembedding_tpu.sampler.device_sampler import (
        build_mode_csr, gap_map)

    E = 23
    trues = {0: [1, 2, 7, 8, 9, 15, 22], 1: [0], 2: [], 3: list(range(17))}
    rows = [[h, 0, t] for h, ts in trues.items() for t in ts]
    rows += [[0, 0, 7], [3, 0, 4]]  # duplicate triples must not shift the map
    train = np.array(rows, np.int32)
    offsets, counts, values, k_max = build_mode_csr(train, E, 1, TAIL_BATCH)
    csr = {"offsets": jnp.asarray(offsets), "counts": jnp.asarray(counts),
           "values": jnp.asarray(values)}
    for h, ts in trues.items():
        allowed = sorted(set(range(E)) - set(ts))
        qk = jnp.asarray([h * 1 + 0], jnp.int32)
        u = jnp.asarray([list(range(len(allowed)))], jnp.int32)
        got = np.asarray(gap_map(u, qk, csr, k_max, E))[0]
        assert got.tolist() == allowed, (h, got.tolist(), allowed)
