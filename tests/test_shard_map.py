"""Parity: the explicit-collective shard_map train step (all_gather table /
psum_scatter grads, parallel/shard_map_step.py) must reproduce the
single-device step's math exactly — params, Adam moments, and logs — on the
virtual 8-device CPU mesh (SURVEY.md §4 item d)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import optim
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding
from knowledgegraphembedding_tpu.parallel.routed_step import make_routed_train_step
from knowledgegraphembedding_tpu.parallel.shard_map_step import make_shardmap_train_step
from knowledgegraphembedding_tpu.train import train_step

N_DEV = 8


def _specs(model, **tkw):
    spec = ModelSpec(
        model_name=model,
        nentity=16 * N_DEV + 5,  # deliberately ragged -> exercises padding
        nrelation=9,
        hidden_dim=24,
        gamma=6.0,
        double_entity_embedding=model in ("RotatE", "ComplEx"),
        double_relation_embedding=model == "ComplEx",
    )
    tspec = TrainSpec(negative_sample_size=12, batch_size=4 * N_DEV, **tkw)
    return spec, tspec


def _batch(spec, tspec, seed=0, shared=False):
    rng = np.random.default_rng(seed)
    B, n = tspec.batch_size, tspec.negative_sample_size
    pos = np.stack(
        [rng.integers(0, spec.nentity, B), rng.integers(0, spec.nrelation, B),
         rng.integers(0, spec.nentity, B)], axis=1,
    ).astype(np.int32)
    neg = rng.integers(0, spec.nentity, (1 if shared else B, n)).astype(np.int32)
    w = rng.uniform(0.2, 1.0, B).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w)


def _run_both(model, n_steps=3, shared=False, make_fn=make_shardmap_train_step,
              rtol=2e-5, atol=2e-6, **tkw):
    spec, tspec = _specs(model, **tkw)
    params0 = kge.init_params(spec, jax.random.PRNGKey(3))

    # single-device trajectory
    p1 = jax.tree.map(jnp.copy, params0)
    s1 = optim.init_state(p1)
    logs1 = []
    for i in range(n_steps):
        pos, neg, w = _batch(spec, tspec, seed=i, shared=shared)
        mode = "head-batch" if i % 2 == 0 else "tail-batch"
        p1, s1, lg = train_step(p1, s1, pos, neg, w, jnp.float32(1e-2),
                                spec=spec, tspec=tspec, mode=mode)
        logs1.append({k: float(v) for k, v in lg.items()})

    # shard_map trajectory on the 8-device mesh
    mesh = sharding.build_mesh(N_DEV)
    p2 = sharding.shard_params(
        sharding.pad_params(jax.tree.map(jnp.copy, params0), N_DEV), spec, mesh
    )
    s2 = sharding.shard_opt_state(optim.init_state(p2), spec, mesh)
    fns = {
        m: make_fn(spec, tspec, mesh, m, shared_negatives=shared)
        for m in ("head-batch", "tail-batch")
    }
    logs2 = []
    for i in range(n_steps):
        pos, neg, w = _batch(spec, tspec, seed=i, shared=shared)
        mode = "head-batch" if i % 2 == 0 else "tail-batch"
        pos, neg, w = sharding.shard_batch(mesh, pos, neg, w)
        p2, s2, lg = fns[mode](p2, s2, pos, neg, w, jnp.float32(1e-2))
        logs2.append({k: float(v) for k, v in lg.items()})

    E = spec.nentity
    for k in p1:
        a = np.asarray(p1[k])
        b = np.asarray(jax.device_get(p2[k]))
        if k == "entity_embedding":
            b = b[:E]
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=k)
    for k in s1.m:
        a, b = np.asarray(s1.m[k]), np.asarray(jax.device_get(s2.m[k]))
        if k == "entity_embedding":
            b = b[:E]
        np.testing.assert_allclose(a, b, rtol=rtol, atol=max(atol / 20, 1e-7),
                                   err_msg=f"m/{k}")
    for l1, l2 in zip(logs1, logs2):
        assert l2.pop("routed_overflow", 0.0) == 0.0
        for k in l1:
            assert l1[k] == pytest.approx(l2[k], rel=max(rtol, 1e-5)), k
    # padding rows must stay exactly zero (no grad, no reg drift)
    pad = np.asarray(jax.device_get(p2["entity_embedding"]))[E:]
    assert pad.size and not pad.any()


def test_rotate_adv_weighted():
    _run_both("RotatE", negative_adversarial_sampling=True,
              adversarial_temperature=0.7)


def test_transe_uniform():
    _run_both("TransE", uni_weight=True)


def test_distmult_dense_reg():
    # dense MXU scoring path + L3 regularization (psum'd across shards)
    _run_both("DistMult", regularization=1e-4, scoring="dense")


def test_complex_gather_reg():
    _run_both("ComplEx", regularization=5e-5, scoring="gather",
              negative_adversarial_sampling=True)


def test_protate_modulus_grad():
    # the trainable scalar modulus is replicated -> its grad is psum'd
    _run_both("pRotatE", negative_adversarial_sampling=True)


def test_shared_negatives():
    _run_both("RotatE", shared=True, negative_adversarial_sampling=True)


# --- the row-routing all_to_all exchange (parallel/routed_step.py) ---

def test_routed_rotate_adv_weighted():
    _run_both("RotatE", make_fn=make_routed_train_step,
              negative_adversarial_sampling=True, adversarial_temperature=0.7)


def test_routed_transe_uniform_reg():
    _run_both("TransE", make_fn=make_routed_train_step, uni_weight=True,
              regularization=1e-4)


def test_routed_protate_shared():
    _run_both("pRotatE", make_fn=make_routed_train_step, shared=True,
              negative_adversarial_sampling=True)


def test_routed_rejects_dense_scoring():
    spec, tspec = _specs("DistMult", scoring="dense")
    mesh = sharding.build_mesh(N_DEV)
    with pytest.raises(ValueError, match="dense"):
        make_routed_train_step(spec, tspec, mesh, "tail-batch")


def test_fetch_rows_routes_exactly():
    """fetch_rows returns table[ids] bit-exactly for ids spanning all
    shards, in arbitrary order, with duplicates."""
    import jax
    import jax.numpy as jnp
    from knowledgegraphembedding_tpu.parallel import routed_step

    mesh = sharding.build_mesh(N_DEV)
    E, d = 16 * N_DEV, 8
    table = jnp.arange(E * d, dtype=jnp.float32).reshape(E, d)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, E, 200).astype(np.int32))

    def body(table_local, ids):
        rows, fill = routed_step.fetch_rows(
            table_local, ids, n_shards=N_DEV,
            capacity=routed_step._capacity(200, N_DEV),
        )
        return rows

    P = jax.sharding.PartitionSpec
    # the exchange output is VMA-typed as device-varying (it IS identical
    # here because ids are replicated, but that's not statically provable)
    rows = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("data", None), P()), out_specs=P(),
        check_vma=False,
    ))(table, ids)
    np.testing.assert_array_equal(np.asarray(rows), np.asarray(table)[np.asarray(ids)])


def test_bf16_mixed_precision_sharded():
    # bf16 compute under the explicit-collective schedule: the sharded
    # [B/D, ...] layout rounds reductions differently from the single-device
    # [B, ...] layout at bf16 precision, so parity is tolerance-based (the
    # f32-master Adam keeps the drift bounded at ~bf16 eps per step)
    _run_both("RotatE", negative_adversarial_sampling=True, precision="bf16",
              rtol=5e-2, atol=2e-3)


def test_routed_bf16_mixed_precision():
    _run_both("RotatE", make_fn=make_routed_train_step,
              negative_adversarial_sampling=True, precision="bf16",
              rtol=5e-2, atol=2e-3)
