"""Shared-negative (PBG-style) throughput mode: [1, n] negatives broadcast
through the scorers, loss shapes hold, and training quality on the synthetic
benchmark graph stays in family with per-positive sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.sampler import TrainSampler, build_train_iterator
from knowledgegraphembedding_tpu.train import Trainer


def test_shared_batch_shape_and_broadcast():
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=6, nrelation=2, seed=0)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    s = TrainSampler(ds.train, ds.nentity, ds.nrelation, 16, 8, "tail-batch",
                     filters, negative_sharing="batch")
    pos, neg, w, mode = s.next_batch()
    assert neg.shape == (1, 8)
    spec = ModelSpec("RotatE", ds.nentity, ds.nrelation, 8, 4.0, True, False)
    params = kge.init_params(spec, jax.random.PRNGKey(0))
    score = kge.forward(params, spec, (jnp.asarray(pos), jnp.asarray(neg)), mode)
    assert score.shape == (16, 8)
    # broadcast equals explicit tiling
    tiled = kge.forward(
        params, spec, (jnp.asarray(pos), jnp.asarray(np.tile(neg, (16, 1)))), mode
    )
    np.testing.assert_allclose(np.asarray(score), np.asarray(tiled), rtol=1e-6)


def test_shared_negatives_learn():
    ds = make_clustered_kg(n_clusters=6, entities_per_cluster=10, nrelation=3, seed=0)
    spec = ModelSpec("RotatE", ds.nentity, ds.nrelation, 32, 6.0, True, False)
    tspec = TrainSpec(negative_sample_size=32, batch_size=64,
                      negative_adversarial_sampling=True)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    trainer = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                      lr=5e-3, warm_up_steps=10**9)
    it = build_train_iterator(ds.train, ds.nentity, ds.nrelation, 64, 32, filters,
                              prefetch_depth=0, negative_sharing="batch")
    for _ in range(300):
        pos, neg, w, mode = next(it)
        trainer.one_step((jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode))
    metrics = eval_mod.test_step(trainer.params, spec, ds.test, filters,
                                 test_batch_size=8, eval_chunk_size=32)
    # same bar the per-positive sampler clears in test_train_e2e
    assert metrics["HITS@10"] > 0.35, metrics


def test_shared_negative_seed_host_consistency():
    """Two 'hosts' (different base seeds, same shared_negative_seed) must
    draw IDENTICAL shared negative streams — the [1, n] set is replicated
    on a multi-host mesh and GSPMD requires replicated data to agree."""
    import numpy as np
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.sampler.negative import TrainSampler, TAIL_BATCH

    rng = np.random.default_rng(0)
    train = np.unique(np.stack(
        [rng.integers(0, 50, 300), rng.integers(0, 4, 300),
         rng.integers(0, 50, 300)], 1), axis=0).astype(np.int32)
    filters = FilterSets.build(train, train, 50, 4)

    def make(base_seed, subset):
        return TrainSampler(train, 50, 4, batch_size=8, negative_sample_size=6,
                            mode=TAIL_BATCH, filters=filters, seed=base_seed,
                            backend="numpy", negative_sharing="batch",
                            index_subset=subset,
                            shared_negative_seed=1234)

    n = len(train)
    h0 = make(100, np.arange(n)[0::2])
    h1 = make(200, np.arange(n)[1::2])
    for _ in range(5):
        p0, n0, w0, _ = h0.next_batch()
        p1, n1, w1, _ = h1.next_batch()
        np.testing.assert_array_equal(n0, n1)  # identical shared negatives
    # while the positive streams differ (different shards and seeds)
    assert not np.array_equal(p0, p1)
