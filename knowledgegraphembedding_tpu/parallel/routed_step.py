"""Row-routing SPMD train step: boundary embeddings exchanged with
``all_to_all`` (``--spmd_mode routed``).

This is the classic distributed-embedding exchange the north star names:
each device asks the owner shard for exactly the rows its local batch
touches, overlapping the exchange with local compute. Compare
``shard_map_step.py`` (FSDP-style table gather): at reference scales the
table gather moves FEWER bytes (each entity is requested ~B·n/E ≈ 18× per
step — see BENCH_NOTES.md), so ``shardmap`` is the default scale path and
``routed`` is the right choice only past ~1M entities at small batch. Both
are exact; tests pin them to the single-device trajectory.

Mechanics (all inside one ``jax.shard_map``):

  fetch_rows(table_local, ids):
    owner    = ids // rows_per_shard                     (uniform row shard)
    send     = bucket ids by owner into [D, C] slots     (sort + scatter)
    requests = all_to_all(send)                          (ids ride ICI)
    rows     = table_local[requests - my_offset]         (local gather)
    replies  = all_to_all(rows)                          (rows ride ICI)
    result   = unbucket back to the ids' original order  (gather)

The backward needs no hand-written code: JAX transposes the gathers to
scatter-adds and each ``all_to_all`` to its reverse, so gradient rows are
routed back to their owner shards automatically — exactly the reverse
exchange a hand-rolled implementation would schedule.

Capacity: the per-(device, owner) bucket is a static ``C``. Negative ids
are uniform (Binomial across owners: 1.3x mean + 64 suffices); positive
ids follow the graph's Zipfian degree distribution, so the budget assumes
ALL of a device's positives can land on one owner shard (see _capacity).
Because silent truncation would corrupt training, the step reports
``routed_overflow`` in its logs (1.0 if any bucket exceeded C) and the CLI
train loop raises on it at the next log window. Static shapes are
non-negotiable under jit — this is the honest price of the routed scheme
vs the always-dense table gather, and one more reason the latter is the
default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelSpec, TrainSpec
from ..models import scorers
from ..ops import loss as loss_ops
from .. import optim
from .sharding import DATA_AXIS, batch_specs, opt_specs, param_specs

P = jax.sharding.PartitionSpec
LANE = 128


def _capacity(n_uniform: int, n_shards: int, n_skewed: int = 0) -> int:
    """Static per-(device, owner) bucket size.

    Negative ids are uniform by construction (rejection-sampled uniform), so
    1.3x their Binomial mean + 64 makes overflow astronomically rare. The
    POSITIVE ids follow the graph's (Zipfian) degree distribution and hub
    rows share one contiguous shard — budget for ALL of them landing on a
    single owner."""
    c = n_skewed + int(n_uniform / n_shards * 1.3) + 64
    return -(-c // LANE) * LANE


def fetch_rows(table_local: jnp.ndarray, ids: jnp.ndarray, *,
               n_shards: int, capacity: int):
    """[L] ids (any shard's rows) -> ([L, d] rows, scalar max bucket fill).

    Differentiable: grads w.r.t. ``table_local`` are routed back through the
    transposed all_to_alls and scatter-added into the owner shards."""
    rows_per_shard = table_local.shape[0]
    L = ids.shape[0]
    owner = ids // rows_per_shard  # [L]
    order = jnp.argsort(owner)  # stable bucket-sort by destination
    ids_sorted = jnp.take(ids, order)
    owner_sorted = jnp.take(owner, order)
    counts = jnp.bincount(owner, length=n_shards)  # [D]
    starts = jnp.cumsum(counts) - counts  # [D] bucket starts
    slot = jnp.arange(L, dtype=jnp.int32) - jnp.take(starts, owner_sorted)

    # pack requests into [D, C]; slot >= capacity would silently truncate,
    # so the fill level is surfaced to the caller
    overflow_fill = jnp.max(counts)
    slot_c = jnp.minimum(slot, capacity - 1)
    send_ids = jnp.zeros((n_shards, capacity), ids.dtype)
    send_ids = send_ids.at[owner_sorted, slot_c].set(ids_sorted)

    # route request ids to their owners: recv[s, c] = what device s asked me
    recv_ids = jax.lax.all_to_all(
        send_ids, DATA_AXIS, split_axis=0, concat_axis=0, tiled=True
    )
    my_offset = jax.lax.axis_index(DATA_AXIS) * rows_per_shard
    local_idx = jnp.clip(recv_ids - my_offset, 0, rows_per_shard - 1)
    rows = jnp.take(table_local, local_idx, axis=0)  # [D, C, d]

    # route the rows back; replies[s, c] answers my send_ids[s, c]
    replies = jax.lax.all_to_all(
        rows, DATA_AXIS, split_axis=0, concat_axis=0, tiled=True
    )
    flat = replies.reshape(n_shards * capacity, -1)
    gathered_sorted = jnp.take(flat, owner_sorted * capacity + slot_c, axis=0)
    inv = jnp.argsort(order)
    return jnp.take(gathered_sorted, inv, axis=0), overflow_fill


def make_routed_train_step(spec: ModelSpec, tspec: TrainSpec, mesh,
                           mode: str, shared_negatives: bool = False):
    """Same signature/semantics as the other two SPMD schedules:
    (params, opt_state, pos, neg, weight, lr) -> (params, opt_state, logs);
    logs carry ``routed_overflow`` (must stay <= capacity)."""
    if tspec.scoring == "dense":
        raise ValueError(
            "routed exchange fetches sampled rows; dense scoring computes "
            "against the whole table — use spmd_mode gspmd/shardmap"
        )
    n_shards = mesh.devices.size
    p_specs = param_specs(spec)
    o_specs = opt_specs(spec)
    pos_s, neg_s, w_s = batch_specs(shared_negatives)

    def loss_fn(params, pos, neg, weight):
        ent_local = params["entity_embedding"]
        Bl = pos.shape[0]
        n_neg = neg.shape[0] * neg.shape[1]  # [1, n] when shared — uniform ids
        ids = jnp.concatenate(
            [pos[:, 0], pos[:, 2], neg.reshape(-1)]
        )
        cap = _capacity(n_neg, n_shards, n_skewed=2 * Bl)
        rows, fill = fetch_rows(ent_local, ids, n_shards=n_shards,
                                capacity=cap)
        r_rows = jnp.take(params["relation_embedding"], pos[:, 1], axis=0)
        if tspec.precision == "bf16":
            # same mixed-precision contract as the other schedules: bf16
            # score math (the exchange already moved f32 rows), f32
            # reductions in the loss, f32 master weights in Adam
            rows = rows.astype(jnp.bfloat16)
            r_rows = r_rows.astype(jnp.bfloat16)
        h = rows[:Bl][:, None, :]
        t = rows[Bl: 2 * Bl][:, None, :]
        neg_rows = rows[2 * Bl:].reshape(*neg.shape, -1)  # [Bl|1, n, de]
        r = r_rows[:, None, :]

        kw = dict(gamma=spec.gamma, embedding_range=spec.embedding_range,
                  modulus=params.get("modulus"))
        if mode == scorers.HEAD_BATCH:
            negative_score = scorers.score_fn(
                spec.model_name, neg_rows, r, t, mode=mode, **kw)
        else:
            negative_score = scorers.score_fn(
                spec.model_name, h, r, neg_rows, mode=mode, **kw)
        positive_score = scorers.score_fn(
            spec.model_name, h, r, t, mode=scorers.SINGLE, **kw)

        # global loss assembly: shared with shard_map_step.py (ops/loss.py)
        loss, logs = loss_ops.kge_loss_global(
            positive_score, negative_score, weight, tspec, DATA_AXIS,
            n_shards, ent_local=ent_local,
            rel_replicated=params["relation_embedding"],
        )
        logs["routed_overflow"] = jax.lax.pmax(
            (fill > cap).astype(jnp.int32), DATA_AXIS
        )
        return loss, logs

    def per_device(params, opt_state, pos, neg, weight, lr):
        (_, logs), grads = jax.value_and_grad(
            lambda p: loss_fn(p, pos, neg, weight), has_aux=True
        )(params)
        params, opt_state = optim.apply_update(params, grads, opt_state, lr)
        return params, opt_state, logs

    body = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(p_specs, o_specs, pos_s, neg_s, w_s, P()),
        out_specs=(p_specs, o_specs, P()),
        check_vma=True,
    )
    return jax.jit(body, donate_argnums=(0, 1))
