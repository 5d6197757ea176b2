"""Parameter initialization and the gather→score forward pass.

Functional redesign of the reference's ``KGEModel`` nn.Module
(reference: codes/model.py §KGEModel.__init__ ≈L25-100, §forward ≈L102-170).
Parameters live in a plain dict pytree so they can be sharded with
``jax.sharding`` PartitionSpecs and threaded through jit/shard_map:

  params = {
    "entity_embedding":   f32[nentity, entity_dim],
    "relation_embedding": f32[nrelation, relation_dim],
    "modulus":            f32[] (pRotatE only),
  }
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import ModelSpec
from . import scorers

Params = Dict[str, jnp.ndarray]


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    """Uniform(-range, range) init of both tables, matching
    codes/model.py ≈L40-50 (``nn.init.uniform_``), plus pRotatE's
    ``modulus = 0.5 * embedding_range`` scalar (≈L52-55)."""
    k_ent, k_rel = jax.random.split(key)
    rng = spec.embedding_range
    params: Params = {
        "entity_embedding": jax.random.uniform(
            k_ent, (spec.nentity, spec.entity_dim), dtype, minval=-rng, maxval=rng
        ),
        "relation_embedding": jax.random.uniform(
            k_rel, (spec.nrelation, spec.relation_dim), dtype, minval=-rng, maxval=rng
        ),
    }
    if spec.has_modulus:
        params["modulus"] = jnp.asarray(0.5 * rng, dtype)
    return params


def _gather(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Row gather. ``jnp.take`` lowers to an XLA gather that GSPMD knows how
    to partition when ``table`` is row-sharded over a mesh axis (the TPU
    analogue of the reference's ``torch.index_select``, codes/model.py
    ≈L110-140)."""
    return jnp.take(table, ids, axis=0)


def forward(
    params: Params,
    spec: ModelSpec,
    sample,
    mode: str = scorers.SINGLE,
    compute_dtype=None,
) -> jnp.ndarray:
    """Mode-dependent gather + score (codes/model.py §KGEModel.forward).

    - ``single``:     sample = i32[B, 3]                     -> f32[B, 1]
    - ``head-batch``: sample = (pos i32[B, 3], neg i32[B, n]) -> f32[B, n]
      (negatives replace the *head*)
    - ``tail-batch``: sample = (pos i32[B, 3], neg i32[B, n]) -> f32[B, n]
      (negatives replace the *tail*)

    ``compute_dtype=jnp.bfloat16`` casts the tables before the gather (the
    cast copy is materialized once; the B·n row gather then moves half the
    HBM bytes) and runs the elementwise score math in bf16 with f32
    reductions (scorers force f32 sum accumulation). Scores return f32.
    """
    ent = params["entity_embedding"]
    rel = params["relation_embedding"]
    if compute_dtype is not None and ent.dtype != compute_dtype:
        ent = ent.astype(compute_dtype)
        rel = rel.astype(compute_dtype)
    if mode == scorers.SINGLE:
        pos = sample
        h = _gather(ent, pos[:, 0])[:, None, :]
        r = _gather(rel, pos[:, 1])[:, None, :]
        t = _gather(ent, pos[:, 2])[:, None, :]
    elif mode == scorers.HEAD_BATCH:
        pos, neg = sample
        h = _gather(ent, neg)  # [B, n, de]
        r = _gather(rel, pos[:, 1])[:, None, :]
        t = _gather(ent, pos[:, 2])[:, None, :]
    elif mode == scorers.TAIL_BATCH:
        pos, neg = sample
        h = _gather(ent, pos[:, 0])[:, None, :]
        r = _gather(rel, pos[:, 1])[:, None, :]
        t = _gather(ent, neg)  # [B, n, de]
    else:
        raise ValueError(f"mode {mode} not supported")

    return scorers.score_fn(
        spec.model_name,
        h,
        r,
        t,
        gamma=spec.gamma,
        embedding_range=spec.embedding_range,
        modulus=params.get("modulus"),
        mode=mode,
    )


def score_triples(
    params: Params, spec: ModelSpec, h_ids, r_ids, t_ids, mode: str = scorers.SINGLE
) -> jnp.ndarray:
    """Score pre-gathered id arrays of any broadcastable shape. Used by the
    chunked evaluator, where the candidate axis is a *contiguous slice* of
    the entity table rather than a gather."""
    ent = params["entity_embedding"]
    rel = params["relation_embedding"]
    return scorers.score_fn(
        spec.model_name,
        _gather(ent, h_ids),
        _gather(rel, r_ids),
        _gather(ent, t_ids),
        gamma=spec.gamma,
        embedding_range=spec.embedding_range,
        modulus=params.get("modulus"),
        mode=mode,
    )
