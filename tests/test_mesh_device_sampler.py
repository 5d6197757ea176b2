"""Mesh-wide SPMD device sampler (sampler/device_sampler.py
§MeshDeviceSampler, VERDICT r1 next-item #4): each device samples its own
shard of the global batch inside one shard_map program; outputs are global
arrays in the trainer's batch layout; the distribution contract matches the
single-device sampler (no train-true collisions, epoch coverage, shared
negatives replicated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets, subsampling_weights
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding
from knowledgegraphembedding_tpu.sampler.device_sampler import (
    MeshDeviceSampler,
    build_mesh_device_iterator,
)
from knowledgegraphembedding_tpu.sampler.negative import HEAD_BATCH, TAIL_BATCH

N_DEV = 8


def _graph(E=60, R=4, T=400, seed=0):
    rng = np.random.default_rng(seed)
    tr = np.stack(
        [rng.integers(0, E, T), rng.integers(0, R, T), rng.integers(0, E, T)], 1
    )
    return np.unique(tr, axis=0).astype(np.int32)


@pytest.fixture(scope="module")
def mesh():
    return sharding.build_mesh(N_DEV)


@pytest.mark.parametrize("mode", [HEAD_BATCH, TAIL_BATCH])
def test_outputs_sharded_and_no_collisions(mesh, mode):
    train = _graph()
    E, R = 60, 4
    B, n = 32, 16
    s = MeshDeviceSampler(train, E, R, B, n, mode, mesh, seed=3)
    true = set(map(tuple, train.tolist()))
    for _ in range(5):
        pos, neg, w, m = s.next_batch()
        assert m == mode
        # global arrays in the trainer's batch layout
        assert pos.shape == (B, 3) and neg.shape == (B, n) and w.shape == (B,)
        assert pos.sharding.spec[0] == "data"  # batch axis sharded
        assert neg.sharding.spec[0] == "data"
        posn, negn = np.asarray(pos), np.asarray(neg)
        # reference rejection contract: a negative must not form a
        # train-true triple with its positive
        for b in range(B):
            h, r, t = posn[b]
            for v in negn[b]:
                trip = (v, r, t) if mode == HEAD_BATCH else (h, r, v)
                assert tuple(int(x) for x in trip) not in true
        # weights are the full-train word2vec subsampling weights
        want_w = subsampling_weights(train, R)
        idx = {tuple(row): i for i, row in enumerate(map(tuple, train.tolist()))}
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(w)[b], want_w[idx[tuple(posn[b].tolist())]],
                rtol=1e-6,
            )


def test_per_device_streams_differ_and_shared_negs_replicate(mesh):
    train = _graph()
    B, n = 32, 16
    s = MeshDeviceSampler(train, 60, 4, B, n, TAIL_BATCH, mesh, seed=0)
    pos, neg, w, _ = s.next_batch()
    negn = np.asarray(neg)
    per_dev = negn.reshape(N_DEV, B // N_DEV, n)
    # fold_in(axis_index): devices draw INDEPENDENT negative streams
    assert len({d.tobytes() for d in per_dev}) == N_DEV

    sh = MeshDeviceSampler(train, 60, 4, B, n, TAIL_BATCH, mesh, seed=0,
                           negative_sharing="batch")
    pos, neg, w, _ = sh.next_batch()
    assert neg.shape == (1, n)
    assert not any(neg.sharding.spec)  # fully replicated
    # the replicated value is genuinely identical on every device
    shards = [np.asarray(x.data) for x in neg.addressable_shards]
    assert all((s0 == shards[0]).all() for s0 in shards)


def test_epoch_coverage_and_alternation(mesh):
    train = _graph(T=128)
    T = len(train)
    B = 16
    it = build_mesh_device_iterator(mesh, train, 60, 4, B, 4, seed=1)
    modes, seen = [], []
    steps = 2 * ((2 * T) // B)
    rows = {tuple(r): i for i, r in enumerate(map(tuple, train.tolist()))}
    for _ in range(steps):
        pos, neg, w, mode = next(it)
        modes.append(mode)
        seen.extend(rows[tuple(r)] for r in map(tuple, np.asarray(pos).tolist()))
    it.close()
    assert modes[0] == TAIL_BATCH  # tail-first, like the reference iterator
    assert all(a != b for a, b in zip(modes, modes[1:]))  # strict alternation
    # every train row appears (epoch permutation covers the pool)
    assert len(set(seen)) == T


def test_mesh_sampler_trains_sharded_model(mesh):
    """End to end: mesh sampler feeding ShardedTrainer.one_step directly
    with device batches (zero host assembly) clears the planted-graph bar."""
    ds = make_clustered_kg(n_clusters=6, entities_per_cluster=10, nrelation=3, seed=0)
    spec = ModelSpec("RotatE", ds.nentity, ds.nrelation, 32, 6.0, True, False)
    tspec = TrainSpec(negative_sample_size=32, batch_size=64,
                      negative_adversarial_sampling=True)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    trainer = sharding.ShardedTrainer(
        spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
        lr=5e-3, warm_up_steps=10**9, mesh=mesh,
    )
    it = build_mesh_device_iterator(mesh, ds.train, ds.nentity, ds.nrelation,
                                    64, 32, seed=0)
    for _ in range(300):
        trainer.one_step(next(it))
    it.close()
    from knowledgegraphembedding_tpu.parallel import eval_sharded

    metrics = eval_sharded.sharded_test_step(
        trainer.params, spec, ds.test, filters, mesh, test_batch_size=8,
    )
    assert metrics["HITS@10"] > 0.35, metrics
