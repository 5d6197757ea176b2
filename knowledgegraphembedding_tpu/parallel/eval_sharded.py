"""Multi-chip filtered ranking: candidate axis sharded over the mesh.

The reference evaluates on one device (codes/model.py §test_step). Here the
full-entity candidate axis — the O(E) part — shards across chips: the
entity table is already row-sharded for training (sharding.py), each device
counts score-beats among ITS rows, and one ``psum`` over the mesh yields
exact global ranks (SURVEY.md §5.7: no argsort, no gather of the full row).

Everything candidate-independent (the L rows / bilinear phi rows and the
true-triple score) is tiny [B, d] work computed replicated before the
``shard_map`` region.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelSpec
from ..data.filterset import FilterSets
from ..models import scorers
from ..ops import matmul_scoring, pallas_rank
from .sharding import DATA_AXIS, MODEL_AXIS, is_model_sharded

from .. import eval as eval_mod


def _left_and_true(params, spec: ModelSpec, pos, mode: str):
    """Replicated per-positive precompute: (left rows, true score, true ids).

    distance family: left = L such that score(c) = gamma - sum f(L - c̃)
    bilinear family: left = phi such that score(c) = <phi, c>
    """
    true_ids = pos[:, 0] if mode == scorers.HEAD_BATCH else pos[:, 2]
    if matmul_scoring.supports_dense(spec.model_name):
        rel = jnp.take(params["relation_embedding"], pos[:, 1], axis=0)
        fixed_ids = pos[:, 2] if mode == scorers.HEAD_BATCH else pos[:, 0]
        fixed = jnp.take(params["entity_embedding"], fixed_ids, axis=0)
        left = matmul_scoring.phi_for_mode(spec.model_name, fixed, rel, mode)
        true_rows = jnp.take(params["entity_embedding"], true_ids, axis=0)
        true_score = jnp.sum(left * true_rows, axis=-1)
        return left, true_score, true_ids
    left = pallas_rank.left_rows(params, spec, pos, mode)
    true_rows = jnp.take(params["entity_embedding"], true_ids, axis=0)
    true_score = pallas_rank.true_scores(
        left, true_rows, spec, params.get("modulus", jnp.float32(1.0))
    )
    return left, true_score, true_ids


def _local_scores(table_local, left, spec: ModelSpec, modulus):
    """f32[B, E_local]: scores of the local candidate rows."""
    name = spec.model_name
    if matmul_scoring.supports_dense(name):
        # HIGHEST: the MXU's default precision truncates f32 to bf16 and
        # flips ranks of near-tied candidates (see ops/matmul_scoring.py)
        return jnp.dot(left, table_local.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if name == "RotatE":
        half = left.shape[-1] // 2
        dre = left[:, None, :half] - table_local[None, :, :half]
        dim = left[:, None, half:] - table_local[None, :, half:]
        sq = dre * dre + dim * dim
        # unguarded like pallas_rank.true_scores: eval-only (no gradient),
        # sqrt(0) == 0 exactly, matches the reference's unguarded norm
        mag = jnp.sqrt(sq)
        return spec.gamma - jnp.sum(mag, axis=-1, dtype=jnp.float32)
    if name == "TransE":
        return spec.gamma - jnp.sum(
            jnp.abs(left[:, None, :] - table_local[None, :, :]), axis=-1,
            dtype=jnp.float32,
        )
    inv_scale = pallas_rank.PI / spec.embedding_range
    return spec.gamma - modulus * jnp.sum(
        jnp.abs(jnp.sin(left[:, None, :] - table_local[None, :, :] * inv_scale)),
        axis=-1, dtype=jnp.float32,
    )


# jit wrappers cached per (spec, mesh, mode): rebuilding them on every
# periodic validation would force full XLA recompiles of both mode programs
# each time (tens of seconds each on a remote-dispatch runtime)
_ranks_fn_cache: dict = {}


def get_sharded_ranks_fn(spec: ModelSpec, mesh, mode: str):
    key = (spec, mode, mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
    fn = _ranks_fn_cache.get(key)
    if fn is None:
        fn = make_sharded_ranks_fn(spec, mesh, mode)
        _ranks_fn_cache[key] = fn
    return fn


def _ranks_body(spec: ModelSpec, mesh, mode: str):
    """The raw (unjitted) SPMD rank computation for one batch — shared by
    the per-batch jit (make_sharded_ranks_fn) and the whole-mode scan
    driver (make_sharded_scan_fn).

    1-D mesh: hand-scheduled shard_map (each device counts beats among its
    table rows, one psum). 2-D (data, model) mesh: the same counting
    written DENSELY and left to GSPMD — the embedding-dim axis is
    column-sharded with boundaries that need not align with the re/im
    half-split, so per-device slicing is the partitioner's job; XLA
    partial-reduces the per-dim sums over ``model`` and the beat counts
    over ``data``. This removes the r2 "trains sharded, evals
    host-gathered" asymmetry on 2-D meshes (VERDICT r2 weak #6)."""
    if is_model_sharded(mesh):
        def ranks2d(params, pos, filter_mask):
            left, true_score, true_ids = _left_and_true(params, spec, pos, mode)
            modulus = params.get("modulus", jnp.float32(1.0))
            table = params["entity_embedding"]
            Epad = table.shape[0]
            scores = _local_scores(table, left, spec, modulus)  # [B, Epad]
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, Epad), 1)
            mask = jax.lax.slice_in_dim(filter_mask, 0, Epad, axis=1)
            beats = (
                (scores > true_score[:, None])
                & (ids < spec.nentity)
                & (~mask)
                & (ids != true_ids[:, None])
            )
            return jnp.sum(beats, axis=1, dtype=jnp.int32) + 1

        return ranks2d

    def ranks(params, pos, filter_mask):
        left, true_score, true_ids = _left_and_true(params, spec, pos, mode)
        modulus = params.get("modulus", jnp.float32(1.0))

        def local(table_local, left, true_score, true_ids, mask):
            shard = jax.lax.axis_index(DATA_AXIS)
            e_local = table_local.shape[0]
            offset = shard * e_local
            scores = _local_scores(table_local, left, spec, modulus)
            ids = offset + jax.lax.broadcasted_iota(
                jnp.int32, (1, e_local), 1
            )
            mask_local = jax.lax.dynamic_slice_in_dim(
                mask, offset, e_local, axis=1
            )
            beats = (
                (scores > true_score[:, None])
                & (ids < spec.nentity)
                & (~mask_local)
                & (ids != true_ids[:, None])
            )
            counts = jnp.sum(beats, axis=1, dtype=jnp.int32)
            return jax.lax.psum(counts, DATA_AXIS)

        counts = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(), P(), P(), P()),
            out_specs=P(),
        )(params["entity_embedding"], left, true_score, true_ids, filter_mask)
        return counts + 1

    return ranks


def _ranks_body_window(spec: ModelSpec, mesh, mode: str):
    """Window-correction SPMD ranks for BILINEAR models (the fleet
    analogue of eval.dense_ranks_window): no [B, W] filter mask is
    materialized — rank = 1 + #{all candidates beating} − #{CSR-window
    candidates beating}. Measured single-chip the mask build was ~90% of
    a bilinear eval batch (BENCH_NOTES §Round-4).

    1-D mesh: each shard counts beats among ITS rows AND subtracts the
    window entries that fall in its row range (window ids are global;
    ownership = [offset, offset + e_local)), one psum total. 2-D mesh:
    written densely for GSPMD, the window take is a tiny [B, k_max]
    gather."""
    E = spec.nentity

    if is_model_sharded(mesh):
        def ranks2d_w(params, pos, win, valid):
            left, true_score, true_ids = _left_and_true(params, spec, pos, mode)
            modulus = params.get("modulus", jnp.float32(1.0))
            table = params["entity_embedding"]
            Epad = table.shape[0]
            scores = _local_scores(table, left, spec, modulus)  # [B, Epad]
            ids = jax.lax.broadcasted_iota(jnp.int32, (1, Epad), 1)
            beats_all = jnp.sum(
                (scores > true_score[:, None]) & (ids < E)
                & (ids != true_ids[:, None]), axis=1, dtype=jnp.int32)
            win_scores = jnp.take_along_axis(scores, win, axis=1)
            beats_f = jnp.sum(
                (win_scores > true_score[:, None]) & valid
                & (win != true_ids[:, None]), axis=1, dtype=jnp.int32)
            return beats_all - beats_f + 1

        return ranks2d_w

    def ranks_w(params, pos, win, valid):
        left, true_score, true_ids = _left_and_true(params, spec, pos, mode)
        modulus = params.get("modulus", jnp.float32(1.0))

        def local(table_local, left, true_score, true_ids, win, valid):
            shard = jax.lax.axis_index(DATA_AXIS)
            e_local = table_local.shape[0]
            offset = shard * e_local
            scores = _local_scores(table_local, left, spec, modulus)
            ids = offset + jax.lax.broadcasted_iota(
                jnp.int32, (1, e_local), 1)
            beats_all = jnp.sum(
                (scores > true_score[:, None]) & (ids < E)
                & (ids != true_ids[:, None]), axis=1, dtype=jnp.int32)
            mine = (win >= offset) & (win < offset + e_local)
            win_scores = jnp.take_along_axis(
                scores, jnp.clip(win - offset, 0, e_local - 1), axis=1)
            beats_f = jnp.sum(
                (win_scores > true_score[:, None]) & valid & mine
                & (win != true_ids[:, None]), axis=1, dtype=jnp.int32)
            return jax.lax.psum(beats_all - beats_f, DATA_AXIS)

        counts = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(), P(), P(), P(), P()),
            out_specs=P(),
        )(params["entity_embedding"], left, true_score, true_ids, win, valid)
        return counts + 1

    return ranks_w


def _param_shardings(spec: ModelSpec, mesh):
    col = MODEL_AXIS if is_model_sharded(mesh) else None
    table_sh = NamedSharding(mesh, P(DATA_AXIS, col))
    repl = NamedSharding(mesh, P())
    param_sh = {
        "entity_embedding": table_sh,
        # 2-D training shards relation columns too (sharding.param_specs)
        "relation_embedding": NamedSharding(mesh, P(None, col)),
    }
    if spec.has_modulus:
        param_sh["modulus"] = repl
    return param_sh, repl


def make_sharded_ranks_fn(spec: ModelSpec, mesh, mode: str):
    """jit-compiled SPMD rank function over a row-sharded (padded) table.

    (params row-sharded as in sharding.param_specs; pos/mask replicated —
    eval batches are tiny. Returns exact global ranks.)
    """
    param_sh, repl = _param_shardings(spec, mesh)
    return jax.jit(
        _ranks_body(spec, mesh, mode),
        in_shardings=(param_sh, repl, repl),
        out_shardings=repl,
    )


def get_sharded_scan_fn(spec: ModelSpec, mesh, mode: str, k_max: int,
                        width: int, Epad: int):
    """Whole-mode scanned evaluator: mask build (eval._device_mask) + SPMD
    ranks for EVERY batch fused into one lax.scan dispatch — the fleet
    analogue of eval._eval_scan_* (per-batch dispatch latency dominated
    the call rate on a remote-dispatch runtime; see BENCH_NOTES.md)."""
    key = (spec, mode, mesh.axis_names,
           tuple(d.id for d in mesh.devices.flat), k_max, width, Epad, "scan")
    fn = _ranks_fn_cache.get(key)
    if fn is not None:
        return fn
    dense = matmul_scoring.supports_dense(spec.model_name)
    ranks = (_ranks_body_window if dense else _ranks_body)(spec, mesh, mode)

    def scan_ranks(params, offsets, counts, values, pos_stack):
        def body(_, pos):
            if dense:
                # window-correction path: replicated tiny window build,
                # no [B, W] mask (see _ranks_body_window)
                if mode == scorers.HEAD_BATCH:
                    keys = pos[:, 1] * spec.nentity + pos[:, 2]
                else:
                    keys = pos[:, 0] * spec.nrelation + pos[:, 1]
                starts = jnp.take(offsets, keys)
                cnts = jnp.take(counts, keys)
                win = jax.vmap(
                    lambda s: jax.lax.dynamic_slice(values, (s,), (k_max,))
                )(starts)
                valid = jax.lax.broadcasted_iota(
                    jnp.int32, win.shape, 1) < cnts[:, None]
                return None, ranks(params, pos, win, valid)
            mask = eval_mod._device_mask(
                pos, offsets, counts, values, k_max=k_max, mode=mode,
                nentity=spec.nentity, nrelation=spec.nrelation, width=width,
            )
            if mask.shape[1] > Epad:
                mask = mask[:, :Epad]
            elif mask.shape[1] < Epad:
                mask = jnp.pad(mask, ((0, 0), (0, Epad - mask.shape[1])))
            return None, ranks(params, pos, mask)
        return jax.lax.scan(body, None, pos_stack)[1]

    param_sh, repl = _param_shardings(spec, mesh)
    fn = jax.jit(
        scan_ranks,
        in_shardings=(param_sh, repl, repl, repl, repl),
        out_shardings=repl,
    )
    _ranks_fn_cache[key] = fn
    return fn


def sharded_test_step(
    params,
    spec: ModelSpec,
    test_triples: np.ndarray,
    filters: FilterSets,
    mesh,
    test_batch_size: int = 16,
    modes: Sequence[str] = (scorers.HEAD_BATCH, scorers.TAIL_BATCH),
    device_filter: bool = None,
) -> Dict[str, float]:
    """Drop-in multi-chip analogue of eval.test_step. ``params`` must hold
    the (padded) row-sharded entity table from sharding.shard_params.

    Uses the device-resident filter path of eval.DeviceFilter when the
    composite key space fits int32 (always at reference scales): masks are
    built on-device and the per-batch ranks stay on-device until one final
    pull — the same zero-per-batch-traffic scheme as eval.test_step."""
    Epad = params["entity_embedding"].shape[0]
    n_real = len(test_triples)
    if n_real == 0:
        return {}  # empty split: nothing to rank (mirrors eval.test_step)

    if device_filter is None:
        from ..data.filterset import MAX_DENSE_KEYS

        device_filter = spec.nentity * spec.nrelation <= MAX_DENSE_KEYS
    elif device_filter and spec.nentity * spec.nrelation >= 2**31:
        # an EXPLICIT --eval_filter device on a key space the CSR cannot
        # index: warn and fall back — crashing a fleet mid-validation would
        # be worse than the host-mask path
        import logging

        logging.warning(
            "--eval_filter device: composite key space E*R = %d exceeds "
            "int32; using host filter masks",
            spec.nentity * spec.nrelation,
        )
        device_filter = False
    multi = jax.process_count() > 1
    dev_filter = None
    stacked = None
    if device_filter:
        # multi-process fleets: the CSR + test triples are placed as GLOBAL
        # replicated arrays (every host holds identical copies of both), so
        # the on-device mask build and the sharded rank program compose
        # into the same zero-per-batch-host-traffic pipeline as single-host
        # (the r1 host-mask fallback is gone)
        dev_filter = eval_mod.get_device_filter(
            filters, mesh=mesh if multi else None
        )
        eff_batch = eval_mod.eff_eval_batch(spec, test_batch_size)
        n_pad = -(-n_real // eff_batch) * eff_batch
        trip = np.asarray(test_triples, np.int32)
        if n_pad != n_real:
            trip = np.concatenate(
                [trip, np.repeat(trip[-1:], n_pad - n_real, axis=0)]
            )
        stacked = trip.reshape(-1, eff_batch, 3)
        # fixed-size scan chunks (host-side pad BEFORE placement): one
        # compiled executable shape covers every eval-set size (see
        # eval._SCAN_CHUNK)
        nb = stacked.shape[0]
        SC = min(nb, eval_mod._SCAN_CHUNK)
        n_scan = -(-nb // SC) * SC
        if n_scan != nb:
            stacked = np.concatenate(
                [stacked, np.repeat(stacked[-1:], n_scan - nb, axis=0)]
            )
        if multi:
            from ..sampler.device_sampler import _place_replicated

            stacked = _place_replicated(stacked, mesh)
        else:
            stacked = jnp.asarray(stacked)

    logs = []
    if dev_filter is not None:
        # scanned dispatches per mode (mask build + SPMD ranks fused);
        # per-batch dispatches were call-latency-bound (BENCH_NOTES.md)
        width = max(Epad, spec.nentity + 1)
        per_mode_ranks = []
        for mode in modes:
            offsets, counts, values, k_max = dev_filter._modes[mode]
            fn = get_sharded_scan_fn(spec, mesh, mode, k_max, width, Epad)
            for s in range(0, n_scan, SC):
                sub = stacked if n_scan == SC else stacked[s: s + SC]
                per_mode_ranks.append(
                    fn(params, offsets, counts, values, sub).reshape(-1)
                )
        per_mode = np.asarray(
            eval_mod._concat_bounded(per_mode_ranks)
        ).reshape(len(modes), n_scan * eff_batch)[:, :n_real]
        for ranks in per_mode:
            logs.extend(eval_mod.metrics_from_ranks(ranks))
        return {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}

    fns = {mode: get_sharded_ranks_fn(spec, mesh, mode) for mode in modes}
    for mode in modes:
        for i in range(0, n_real, test_batch_size):
            pos = np.asarray(test_triples[i : i + test_batch_size], np.int32)
            B = pos.shape[0]
            if B < test_batch_size:
                pos_p = np.concatenate(
                    [pos, np.repeat(pos[-1:], test_batch_size - B, axis=0)]
                )
            else:
                pos_p = pos
            mask = filters.filter_mask_rows(pos_p, mode)
            if mask.shape[1] < Epad:
                mask = np.pad(mask, ((0, 0), (0, Epad - mask.shape[1])))
            # numpy (uncommitted) inputs: the mesh jit places them per its
            # in_shardings — a committed jnp array would break multi-host
            ranks = np.asarray(
                fns[mode](params, np.asarray(pos_p), np.asarray(mask))
            )[:B]
            logs.extend(eval_mod.metrics_from_ranks(ranks))
    return {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}
