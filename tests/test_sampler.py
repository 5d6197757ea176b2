"""Property tests for the host-side rejection sampler
(SURVEY.md §4 item b): negatives never collide with train-true entities,
subsampling weights follow the start=4 word2vec formula, strict head/tail
alternation, static output shapes."""

import numpy as np

from knowledgegraphembedding_tpu.data.filterset import (
    FilterSets,
    count_frequency,
    subsampling_weights,
)
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.sampler import (
    BidirectionalIterator,
    PrefetchIterator,
    TrainSampler,
    build_train_iterator,
)


def make_env(seed=0):
    ds = make_random_kg(nentity=200, nrelation=6, ntriples=2000, n_valid=150, n_test=150, seed=seed)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    return ds, filters


def test_negatives_never_true_train_entities():
    ds, filters = make_env()
    for mode in ("head-batch", "tail-batch"):
        s = TrainSampler(ds.train, ds.nentity, ds.nrelation, 32, 16, mode, filters, seed=1)
        for _ in range(5):
            pos, neg, w, m = s.next_batch()
            assert m == mode
            assert pos.shape == (32, 3) and neg.shape == (32, 16) and w.shape == (32,)
            for i in range(32):
                h, r, t = (int(x) for x in pos[i])
                if mode == "head-batch":
                    true = set(filters.train_true_heads(r, t).tolist())
                else:
                    true = set(filters.train_true_tails(h, r).tolist())
                assert not (set(neg[i].tolist()) & true)


def test_subsampling_weight_formula():
    ds, _ = make_env(seed=2)
    w = subsampling_weights(ds.train, ds.nrelation)
    count = count_frequency(ds.train)
    for i in range(0, len(ds.train), 97):
        h, r, t = (int(x) for x in ds.train[i])
        expected = np.sqrt(1.0 / (count[(h, r)] + count[(t, -r - 1)]))
        np.testing.assert_allclose(w[i], expected, rtol=1e-6)


def test_counts_use_start_4():
    triples = np.asarray([[0, 0, 1], [0, 0, 2]], np.int32)
    count = count_frequency(triples)
    assert count[(0, 0)] == 4 + 2  # (h, r) seen twice, start=4
    assert count[(1, -1)] == 4 + 1
    assert count[(2, -1)] == 4 + 1


def test_bidirectional_alternation_tail_first():
    """codes/dataloader.py ≈L170: step incremented BEFORE the parity check,
    so batch #1 is tail-batch, #2 head-batch, ..."""
    ds, filters = make_env()
    it = BidirectionalIterator(
        TrainSampler(ds.train, ds.nentity, ds.nrelation, 8, 4, "head-batch", filters),
        TrainSampler(ds.train, ds.nentity, ds.nrelation, 8, 4, "tail-batch", filters),
    )
    modes = [next(it)[3] for _ in range(6)]
    assert modes == ["tail-batch", "head-batch"] * 3


def test_epoch_coverage():
    """DataLoader(shuffle=True) semantics: every train triple appears once
    per epoch worth of batches."""
    ds, filters = make_env()
    n = len(ds.train)
    bs = 50
    s = TrainSampler(ds.train, ds.nentity, ds.nrelation, bs, 2, "tail-batch", filters, seed=3)
    seen = []
    for _ in range(n // bs):
        pos, _, _, _ = s.next_batch()
        seen.extend(map(tuple, pos.tolist()))
    # all triples from one epoch, each exactly once
    assert len(seen) == (n // bs) * bs
    uniq = set(seen)
    all_triples = set(map(tuple, ds.train.tolist()))
    assert uniq <= all_triples
    assert len(seen) == len(uniq)  # no repeats within the epoch window


def test_prefetch_iterator_matches_and_closes():
    ds, filters = make_env()
    it = build_train_iterator(ds.train, ds.nentity, ds.nrelation, 16, 8, filters, prefetch_depth=3)
    batches = [next(it) for _ in range(10)]
    assert batches[0][3] == "tail-batch"
    assert all(b[0].shape == (16, 3) for b in batches)
    it.close()


def test_prefetch_device_put_matches_host_stream():
    """to_device=True (r5: overlaps batch i+1's host->device upload with
    step i's compute) must deliver the SAME batch stream as the host-array
    default — device arrays, identical values, mode strings untouched."""
    import jax

    ds, filters = make_env(seed=7)
    host = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, 16, 8, filters, prefetch_depth=0)
    dev = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, 16, 8, filters,
        prefetch_depth=3, device_put=True)
    for _ in range(6):
        hp, hn, hw, hm = next(host)
        dp, dn, dw, dm = next(dev)
        assert hm == dm
        assert isinstance(dp, jax.Array) and isinstance(dw, jax.Array)
        np.testing.assert_array_equal(np.asarray(dp), hp)
        np.testing.assert_array_equal(np.asarray(dn), hn)
        np.testing.assert_array_equal(np.asarray(dw), hw)
    dev.close()
