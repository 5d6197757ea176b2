"""bf16 mixed-precision mode: forward scores track f32 within bf16
tolerance, gradients flow (f32 master), and training still learns."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.sampler import build_train_iterator
from knowledgegraphembedding_tpu.train import Trainer, loss_and_logs
from knowledgegraphembedding_tpu import eval as eval_mod


def test_bf16_scores_track_f32():
    spec = ModelSpec("RotatE", 60, 5, 16, 6.0, True, False)
    rng = np.random.default_rng(0)
    r = spec.embedding_range
    params = {
        "entity_embedding": jnp.asarray(rng.uniform(-r, r, (60, 32)).astype(np.float32)),
        "relation_embedding": jnp.asarray(rng.uniform(-r, r, (5, 16)).astype(np.float32)),
    }
    pos = jnp.asarray(np.stack([rng.integers(0, 60, 8), rng.integers(0, 5, 8),
                                rng.integers(0, 60, 8)], 1).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, 60, (8, 12)).astype(np.int32))
    s32 = kge.forward(params, spec, (pos, neg), "tail-batch")
    s16 = kge.forward(params, spec, (pos, neg), "tail-batch", jnp.bfloat16)
    assert s16.dtype == jnp.float32  # f32 reductions keep the output f32
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), rtol=0.05, atol=0.05)


def test_bf16_grads_are_f32_masters():
    spec = ModelSpec("TransE", 40, 4, 12, 4.0)
    rng = np.random.default_rng(1)
    r = spec.embedding_range
    params = {
        "entity_embedding": jnp.asarray(rng.uniform(-r, r, (40, 12)).astype(np.float32)),
        "relation_embedding": jnp.asarray(rng.uniform(-r, r, (4, 12)).astype(np.float32)),
    }
    pos = jnp.asarray(np.stack([rng.integers(0, 40, 8), rng.integers(0, 4, 8),
                                rng.integers(0, 40, 8)], 1).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, 40, (8, 6)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.1, 1, 8).astype(np.float32))
    tspec = TrainSpec(precision="bf16")
    g = jax.grad(lambda p: loss_and_logs(p, spec, tspec, pos, neg, w, "tail-batch")[0])(params)
    assert g["entity_embedding"].dtype == jnp.float32
    g32 = jax.grad(
        lambda p: loss_and_logs(p, spec, dataclasses.replace(tspec, precision="f32"),
                                pos, neg, w, "tail-batch")[0]
    )(params)
    np.testing.assert_allclose(
        np.asarray(g["entity_embedding"]), np.asarray(g32["entity_embedding"]),
        rtol=0.2, atol=0.02,
    )


def test_bf16_training_learns():
    ds = make_clustered_kg(n_clusters=5, entities_per_cluster=8, nrelation=2, seed=7)
    spec = ModelSpec("RotatE", ds.nentity, ds.nrelation, 24, 5.0, True, False)
    tspec = TrainSpec(negative_sample_size=16, batch_size=64,
                      negative_adversarial_sampling=True, precision="bf16")
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    trainer = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                      lr=5e-3, warm_up_steps=10**9)
    it = build_train_iterator(ds.train, ds.nentity, ds.nrelation, 64, 16, filters,
                              prefetch_depth=0)
    first = last = None
    for _ in range(250):
        pos, neg, w, mode = next(it)
        logs = trainer.one_step((jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode))
        if first is None:
            first = float(logs["loss"])
        last = float(logs["loss"])
    assert last < first
    metrics = eval_mod.test_step(trainer.params, spec, ds.test, filters,
                                 test_batch_size=8, eval_chunk_size=16)
    assert metrics["HITS@10"] > 0.3, metrics
