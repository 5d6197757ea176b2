"""Filtered link-prediction evaluation + countries AUC-PR.

TPU-native redesign of the reference's ``KGEModel.test_step``
(reference: codes/model.py ≈L332-390 and codes/dataloader.py §TestDataset
≈L118-162).  Key departures, same semantics:

  - The reference materializes a ``[B, nentity]`` score row, adds a -1
    filter bias (which, because filtered candidate *ids* are replaced by the
    true entity, guarantees filtered candidates score exactly
    ``true_score - 1``), then argsorts.  Equivalent semantics, far cheaper
    on TPU: ``rank = 1 + #{unfiltered candidates with score > true_score}``
    — no argsort, no O(E) row gather (candidates are a *contiguous slice*
    of the entity table, streamed chunk-by-chunk through VMEM), and the
    count shards across devices with one ``psum`` (SURVEY.md §5.7).
  - The reference's per-candidate Python filter loop becomes a vectorized
    CSR mask paint on the host (data/filterset.py).
"""

from __future__ import annotations

import functools
import weakref
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSpec
from .data.filterset import FilterSets
from .models import kge, scorers
from .ops import matmul_scoring


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# On a remote-dispatch runtime EVERY eager op costs a host<->device round
# trip (~30-60 ms measured), while jitted calls enqueue in ~1 ms. The eval
# loop therefore goes through module-level jitted helpers for its batching
# plumbing (unstack / concat), bounded to _GROUP operands per program so
# trace/compile time stays O(1) in the number of eval batches.
_unstack = jax.jit(lambda s: tuple(s))
_concat = jax.jit(lambda *rs: jnp.concatenate(rs))
_GROUP = 256
# scan-driver chunk: batches per compiled eval dispatch (see test_step) —
# large enough that dispatch overhead is amortized (~32 x 5 ms kernels per
# enqueue), small enough that one executable shape covers every eval size
_SCAN_CHUNK = 32


def _unstack_bounded(stacked) -> list:
    """Split axis 0 into a list of device arrays with <= _GROUP outputs per
    compiled program (two levels handle up to _GROUP^2 batches)."""
    nb = stacked.shape[0]
    if nb <= _GROUP:
        return list(_unstack(stacked))
    ngf = nb // _GROUP
    out = []
    full = stacked[: ngf * _GROUP].reshape(ngf, _GROUP, *stacked.shape[1:])
    for g in _unstack(full):
        out.extend(_unstack(g))
    if nb % _GROUP:
        out.extend(_unstack(stacked[ngf * _GROUP:]))
    return out


def _concat_bounded(arrays: list):
    """Concatenate many device arrays with <= _GROUP operands per compiled
    program."""
    while len(arrays) > _GROUP:
        nxt = []
        n_full = len(arrays) - len(arrays) % _GROUP
        for i in range(0, n_full, _GROUP):
            nxt.append(_concat(*arrays[i: i + _GROUP]))
        rem = arrays[n_full:]
        if len(rem) == 1:
            nxt.append(rem[0])
        elif rem:
            nxt.append(_concat(*rem))
        arrays = nxt
    return arrays[0] if len(arrays) == 1 else _concat(*arrays)

def get_device_filter(filters: FilterSets, mesh=None) -> "DeviceFilter":
    """DeviceFilter construction uploads the dense CSR arrays (~70 MB at
    YAGO scale) — cache ONE instance per (FilterSets, mesh) so every
    evaluation path (periodic valid, sharded, final test — whatever mask
    width each needs) reuses the same resident copy; the width is a
    per-call argument of mask_rows. Pass ``mesh`` on multi-host fleets so
    the CSR is placed as GLOBAL replicated arrays every host's jit can
    consume (committed single-host arrays cannot join a global-mesh
    program)."""
    cache = getattr(filters, "_device_filter_cache", None)
    if cache is None:
        cache = filters._device_filter_cache = {}
    key = (
        None if mesh is None
        else (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
    )
    got = cache.get(key)
    if got is None:
        got = cache[key] = DeviceFilter(filters, mesh=mesh)
    return got


# PallasRanker construction pads + re-uploads the whole entity table
# (~1 GB at YAGO d=1000 scale). test_step is called several times against
# the SAME params (valid then test at run end; bench matrix; evaluate_train)
# — cache rankers keyed on (table identity, spec) so only the first call
# per (table, model) pays the prep. Multi-model processes (the bench
# matrix, model sweeps) alternate tables in one interpreter, so a small
# DICT (bounded, FIFO-evicted) replaces the r2 single slot that re-paid
# the ~1 GB pad+upload on every alternation. Each weakref's DEATH
# CALLBACK drops its entry (and padded table) the moment training
# replaces the params buffer — merely checking liveness on the next
# lookup would pin the stale copy in HBM for the whole inter-validation
# interval. The cap is a deliberate HBM budget: each live entry pins one
# padded table copy (~1 GB at YAGO d=1000), and pRotatE entries pin 3x
# that (the r5 factorized-trig sin/cos tables ride the ranker), so 2
# covers the common two-model alternation while bounding worst-case
# pinning at ~6 GB (two pRotatE entries at d=1000 scale) — well inside
# v5e's 16 GB next to the live training state.
_RANKER_CACHE_MAX = 2
_pallas_ranker_cache: dict = {}  # {(id(table), spec): (weakref(table), ranker)}


def _drop_ranker_entry(key):
    def cb(dead_ref):
        got = _pallas_ranker_cache.get(key)
        if got is not None and got[0] is dead_ref:
            del _pallas_ranker_cache[key]
    return cb


def get_pallas_ranker(params: kge.Params, spec: ModelSpec) -> "object":
    from .ops import pallas_rank

    table = params["entity_embedding"]
    key = (id(table), spec)
    got = _pallas_ranker_cache.get(key)
    if got is not None and got[0]() is table:
        return got[1]
    ranker = pallas_rank.PallasRanker(params, spec)
    while len(_pallas_ranker_cache) >= _RANKER_CACHE_MAX:
        # FIFO eviction (dicts preserve insertion order): multi-model sweeps
        # cycle through models, so oldest-inserted is the best cheap victim.
        _pallas_ranker_cache.pop(next(iter(_pallas_ranker_cache)))
    _pallas_ranker_cache[key] = (weakref.ref(table, _drop_ranker_entry(key)),
                                 ranker)
    return ranker


@functools.partial(jax.jit, static_argnames=("spec", "mode", "chunk"))
def ranks_batch(
    params: kge.Params,
    pos: jnp.ndarray,  # i32[B, 3]
    filter_mask: jnp.ndarray,  # bool[B, Epad] True = known-true (excl. self)
    *,
    spec: ModelSpec,
    mode: str,
    chunk: int,
) -> jnp.ndarray:
    """Filtered ranks (1-based) of the true entity for one eval batch."""
    ent = params["entity_embedding"]
    rel = params["relation_embedding"]
    E = spec.nentity
    n_chunks = _cdiv(E, chunk)

    if matmul_scoring.supports_dense(spec.model_name):
        # Bilinear models: one MXU matmul scores every candidate at once —
        # no candidate-axis loop at all (ops/matmul_scoring.py).
        scores = matmul_scoring.dense_scores_all(
            spec, params, pos, mode,
            compute_dtype=ent.dtype)  # [B, Etab]; dtype follows the params
        # (a hardcoded f32 here broke f64 rank parity — one flipped rank
        # at the published ComplEx shape; tools/full_shape_parity.py)
        Etab = scores.shape[1]
        true_ids = pos[:, 0] if mode == scorers.HEAD_BATCH else pos[:, 2]
        true_score = jnp.take_along_axis(scores, true_ids[:, None], axis=1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, Etab), 1)
        mask = filter_mask[:, :Etab]
        if mask.shape[1] < Etab:
            mask = jnp.pad(mask, ((0, 0), (0, Etab - mask.shape[1])))
        beats = (scores > true_score) & (ids < E) & (~mask)
        return jnp.sum(beats, axis=1, dtype=jnp.int32) + 1

    # Score the true entity through the SAME mode-specific grouped form the
    # candidates use: in the reference the true entity sits inside the one
    # [B, E] score row being argsorted, so its score comes from the batch
    # layout, not the 'single' layout (they differ in float for RotatE's two
    # groupings). Comparing like-vs-like keeps rank parity exact.
    true_ids = pos[:, 0:1] if mode == scorers.HEAD_BATCH else pos[:, 2:3]
    true_score = kge.forward(params, spec, (pos, true_ids), mode)[:, 0]  # [B]
    # The chunk scoring below reduces over a [B, chunk, de] shape while the
    # line above reduced over [B, 1, de]; XLA may pick different reduction
    # orders, so the true candidate's chunk score can differ from true_score
    # by float noise and "beat itself". Exclude it by id — the reference's
    # argsort formulation compares the true entity to itself and never
    # counts it (codes/model.py ≈L365-375).

    r = jnp.take(rel, pos[:, 1], axis=0)[:, None, :]  # [B,1,dr]
    if mode == scorers.HEAD_BATCH:
        fixed = jnp.take(ent, pos[:, 2], axis=0)[:, None, :]  # tail fixed
    else:
        fixed = jnp.take(ent, pos[:, 0], axis=0)[:, None, :]  # head fixed

    def body(c, count):
        start = c * chunk
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0)
        valid = ids < E
        rows = jnp.take(ent, jnp.minimum(ids, E - 1), axis=0)[None, :, :]  # [1,chunk,de]
        if mode == scorers.HEAD_BATCH:
            score = scorers.score_fn(
                spec.model_name, rows, r, fixed,
                gamma=spec.gamma, embedding_range=spec.embedding_range,
                modulus=params.get("modulus"), mode=mode,
            )  # [B, chunk]
        else:
            score = scorers.score_fn(
                spec.model_name, fixed, r, rows,
                gamma=spec.gamma, embedding_range=spec.embedding_range,
                modulus=params.get("modulus"), mode=mode,
            )
        mask_chunk = jax.lax.dynamic_slice_in_dim(filter_mask, start, chunk, axis=1)
        beats = (
            (score > true_score[:, None])
            & valid[None, :]
            & (~mask_chunk)
            & (ids[None, :] != true_ids)
        )
        return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

    count = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros(pos.shape[0], jnp.int32)
    )
    return count + 1


def _pad_mask(mask: np.ndarray, chunk: int) -> np.ndarray:
    E = mask.shape[1]
    Epad = _cdiv(E, chunk) * chunk
    if Epad == E:
        return mask
    return np.pad(mask, ((0, 0), (0, Epad - E)))


class DeviceFilter:
    """Device-resident eval filter (all-true CSR in HBM): builds the
    [B, W] bool filter mask ON the device — a Kmax-window gather from the
    CSR plus one scatter-set — so the eval inner loop ships no [B, E]
    host-built mask over the interconnect (≈2 MB/batch at YAGO scale; see
    BENCH_NOTES.md on the host↔device path). Same semantics as
    FilterSets.filter_mask_rows: True = known-true corruption, the positive
    itself un-filtered (codes/dataloader.py ≈L140-148)."""

    def __init__(self, filters: FilterSets, mesh=None):
        E, R = filters.nentity, filters.nrelation
        if E * R >= 2**31:
            raise ValueError("composite key space exceeds int32")
        self.nentity, self.nrelation = E, R
        self._modes = {}
        from .data.filterset import dense_key_arrays

        if mesh is None:
            place = jnp.asarray
        else:
            from .sampler.device_sampler import _place_replicated

            place = lambda x: _place_replicated(x, mesh)  # noqa: E731

        for mode, idx, n_keys in (
            (scorers.HEAD_BATCH, filters.all_true_head, R * E),
            (scorers.TAIL_BATCH, filters.all_true_tail, E * R),
        ):
            offsets, counts, values, k_max = dense_key_arrays(
                idx, n_keys, pad_value=0
            )
            self._modes[mode] = (
                place(offsets),
                place(counts),
                place(values),
                k_max,
            )

    def mask_rows(self, pos: jnp.ndarray, mode: str, width: int) -> jnp.ndarray:
        """bool[B, max(width, E+1)]: the extra column past E is the scatter
        sink for invalid window slots (every rank path guards ids < E)."""
        offsets, counts, values, k_max = self._modes[mode]
        return _device_mask(
            pos, offsets, counts, values,
            k_max=k_max, mode=mode, nentity=self.nentity,
            nrelation=self.nrelation, width=max(width, self.nentity + 1),
        )


@functools.partial(
    jax.jit, static_argnames=("k_max", "mode", "nentity", "nrelation", "width")
)
def _device_mask(pos, offsets, counts, values, *, k_max, mode, nentity,
                 nrelation, width):
    B = pos.shape[0]
    if mode == scorers.HEAD_BATCH:
        keys = pos[:, 1] * nentity + pos[:, 2]
        true_ids = pos[:, 0]
    else:
        keys = pos[:, 0] * nrelation + pos[:, 1]
        true_ids = pos[:, 2]
    starts = jnp.take(offsets, keys)
    cnts = jnp.take(counts, keys)
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(values, (s,), (k_max,))
    )(starts)  # [B, Kmax] contiguous reads
    valid = jax.lax.broadcasted_iota(jnp.int32, (B, k_max), 1) < cnts[:, None]
    # invalid window slots scatter into the sink column (>= nentity, never
    # read: every rank path also applies an ids < nentity guard)
    ids = jnp.where(valid, windows, width - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, k_max), 0)
    mask = jnp.zeros((B, width), bool)
    mask = mask.at[rows, ids].set(True)
    mask = mask.at[jnp.arange(B), true_ids].set(False)  # self never filtered
    return mask


# ---------------------------------------------------------------------------
# Whole-evaluation scan drivers: ONE compiled dispatch ranks EVERY batch of a
# mode (mask build + rank fused into a lax.scan over the stacked batches).
# On a remote-dispatch runtime each per-batch jit call costs ~1-15 ms of
# host-side enqueue latency; at YAGO scale (64 batches x 2 programs) that
# overhead exceeded the kernel time itself (measured 488 evals/s call rate
# vs ~2.3k inner-loop). The scan removes the per-batch dispatches entirely.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec", "mode", "k_max"))
def dense_ranks_window(params, pos, offsets, counts, values, *,
                       spec: ModelSpec, mode: str, k_max: int):
    """Filtered ranks for bilinear models WITHOUT materializing a [B, W]
    filter mask: rank = 1 + #{ALL candidates beating the true}
    − #{FILTERED candidates beating}. The filtered candidates of a row
    are exactly its CSR window (≤ k_max unique ids — TrueIndex dedupes),
    so the correction is one [B, k_max] take from the score block
    instead of a bool scatter + [B, W] materialize + masked compare.
    Measured at YAGO scale the mask build was ~90% of the bilinear eval
    batch (matmul 0.63 ms vs mask ~5 ms per 128-row batch; BENCH_NOTES
    §Round-4) — this path leaves only the matmul + two compares."""
    ent = params["entity_embedding"]
    scores = matmul_scoring.dense_scores_all(
        spec, params, pos, mode, compute_dtype=ent.dtype)  # [B, Etab]
    E = spec.nentity
    Etab = scores.shape[1]
    B = pos.shape[0]
    if mode == scorers.HEAD_BATCH:
        keys = pos[:, 1] * E + pos[:, 2]
        true_ids = pos[:, 0]
    else:
        keys = pos[:, 0] * spec.nrelation + pos[:, 1]
        true_ids = pos[:, 2]
    true_score = jnp.take_along_axis(scores, true_ids[:, None], axis=1)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, Etab), 1)
    # the true entity never beats itself: scores[b, true] IS true_score
    # (same element), so strict > excludes it exactly
    beats_all = jnp.sum((scores > true_score) & (ids < E), axis=1,
                        dtype=jnp.int32)
    starts = jnp.take(offsets, keys)
    cnts = jnp.take(counts, keys)
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(values, (s,), (k_max,))
    )(starts)  # [B, k_max] contiguous reads
    valid = jax.lax.broadcasted_iota(jnp.int32, (B, k_max), 1) < cnts[:, None]
    win_scores = jnp.take_along_axis(scores, win, axis=1)
    beats_filtered = jnp.sum(
        (win_scores > true_score) & valid & (win != true_ids[:, None]),
        axis=1, dtype=jnp.int32)
    return beats_all - beats_filtered + 1


@functools.partial(
    jax.jit,
    static_argnames=("spec", "mode", "chunk", "k_max", "width"),
)
def _eval_scan_xla(params, offsets, counts, values, pos_stack, *,
                   spec: ModelSpec, mode: str, chunk: int, k_max: int,
                   width: int):
    dense = matmul_scoring.supports_dense(spec.model_name)

    def body(_, pos):
        if dense:
            return None, dense_ranks_window(
                params, pos, offsets, counts, values, spec=spec, mode=mode,
                k_max=k_max)
        mask = _device_mask(
            pos, offsets, counts, values, k_max=k_max, mode=mode,
            nentity=spec.nentity, nrelation=spec.nrelation, width=width,
        )
        return None, ranks_batch(params, pos, mask, spec=spec, mode=mode,
                                 chunk=chunk)
    return jax.lax.scan(body, None, pos_stack)[1]


@functools.partial(
    jax.jit,
    static_argnames=("spec", "mode", "k_max", "width", "TE", "half_pad",
                     "span", "two_halves", "Epad", "interpret"),
)
def _eval_scan_pallas(table_padded, rel, modulus, offsets, counts, values,
                      pos_stack, tsin=None, tcos=None, *, spec: ModelSpec,
                      mode: str, k_max: int, width: int, TE: int,
                      half_pad: int, span: int, two_halves: bool, Epad: int,
                      interpret: bool):
    from .ops import pallas_rank

    def body(_, pos):
        mask = _device_mask(
            pos, offsets, counts, values, k_max=k_max, mode=mode,
            nentity=spec.nentity, nrelation=spec.nrelation, width=width,
        )
        return None, pallas_rank._ranks_jit(
            table_padded, rel, modulus, pos, mask, tsin, tcos, spec=spec,
            mode=mode, TE=TE, half_pad=half_pad, span=span,
            two_halves=two_halves, Epad=Epad, interpret=interpret,
        )
    return jax.lax.scan(body, None, pos_stack)[1]


def eff_eval_batch(spec: ModelSpec, test_batch_size: int) -> int:
    """Effective device-eval batch (ranks are per-triple, so results are
    identical to the user-facing --test_batch_size). Floors measured on
    chip at YAGO scale: the bilinear MXU matmul is SKINNY at 16 rows and
    gains +45 % at 128 (14.1k -> 20.5k evals/s; 256 regresses); the
    distance-family Pallas kernel is VPU-compute-bound and flat in batch,
    so 16 keeps per-dispatch latency low. ONE helper for the single-device
    and sharded evaluators so their dispatch geometry stays in lockstep."""
    floor = 128 if matmul_scoring.supports_dense(spec.model_name) else 16
    return max(test_batch_size, floor)


def metrics_from_ranks(ranks: np.ndarray) -> List[Dict[str, float]]:
    """Per-triple log dicts, exactly the reference's names
    (codes/model.py ≈L370-380)."""
    out = []
    for rk in ranks:
        rk = float(rk)
        out.append(
            {
                "MRR": 1.0 / rk,
                "MR": rk,
                "HITS@1": 1.0 if rk <= 1 else 0.0,
                "HITS@3": 1.0 if rk <= 3 else 0.0,
                "HITS@10": 1.0 if rk <= 10 else 0.0,
            }
        )
    return out


def test_step(
    params: kge.Params,
    spec: ModelSpec,
    test_triples: np.ndarray,
    filters: FilterSets,
    test_batch_size: int = 4,
    eval_chunk_size: int = 4096,
    modes: Sequence[str] = (scorers.HEAD_BATCH, scorers.TAIL_BATCH),
    test_log_steps: int = 1000,
    logger=None,
    use_pallas: Optional[bool] = None,
    device_filter: Optional[bool] = None,
) -> Dict[str, float]:
    """Full filtered-ranking evaluation: both corruption directions, pooled
    mean over all (triple, direction) pairs (codes/model.py ≈L340-388).

    ``use_pallas``: None (default) auto-enables the fused table-streaming
    rank kernel (ops/pallas_rank.py) for distance-family models on TPU
    (measured 1.4-1.8x over the XLA chunked path); True/False force it.
    Bilinear models always use the MXU matmul path.

    ``device_filter``: None (default) auto-enables the device-resident
    filter + input path on TPU: test triples and the all-true filter CSR
    live in HBM, masks are built on-device, and per-batch ranks stay on the
    device until ONE pull at the end — the eval inner loop moves no
    per-batch data over the host↔device link at all."""
    from .ops import pallas_rank

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if device_filter is None:
        from .data.filterset import MAX_DENSE_KEYS

        device_filter = on_tpu and (
            spec.nentity * spec.nrelation <= MAX_DENSE_KEYS
        )
    elif device_filter and spec.nentity * spec.nrelation >= 2**31:
        # explicit request on a key space the dense CSR cannot index:
        # warn + host masks rather than a mid-run ValueError
        if logger is not None:
            logger.warning(
                "--eval_filter device: composite key space E*R = %d "
                "exceeds int32; using host filter masks",
                spec.nentity * spec.nrelation,
            )
        device_filter = False

    chunk = min(eval_chunk_size, _cdiv(spec.nentity, 1))
    total = len(test_triples) * len(modes)
    done = 0
    ranker = None
    if use_pallas and pallas_rank.supports(spec.model_name):
        ranker = get_pallas_ranker(params, spec)

    n_real = len(test_triples)
    if n_real == 0:
        return {}  # empty split: nothing to rank (avoids logs[0] crashes)
    logs: List[Dict[str, float]] = []

    if device_filter:
        # Per-batch loop with ZERO per-batch host involvement: the test
        # triples are split into device-resident batch arrays ONCE (a
        # handful of one-time tiny slice programs), then every batch is two
        # all-device-operand dispatches (mask build + rank) that pipeline
        # asynchronously; ranks leave the device in one concatenated pull.
        # Never pass a fresh python int into a per-batch op here — a scalar
        # start index is either baked as a constant (recompile per batch) or
        # shipped host->device (~26 ms latency each on a remote runtime).
        chunk_pad = _cdiv(spec.nentity, chunk) * chunk
        dev_filter = get_device_filter(filters)
        eff_batch = eff_eval_batch(spec, test_batch_size)
        if eff_batch != test_batch_size and logger is not None:
            logger.info(
                "device eval path: batching %d triples per dispatch "
                "(--test_batch_size %d kept for metrics; ranks are "
                "per-triple so results are identical)",
                eff_batch, test_batch_size,
            )
        n_pad = _cdiv(n_real, eff_batch) * eff_batch
        trip = np.asarray(test_triples, np.int32)
        if n_pad != n_real:
            trip = np.concatenate(
                [trip, np.repeat(trip[-1:], n_pad - n_real, axis=0)]
            )
        trip_stack = jnp.asarray(trip).reshape(-1, eff_batch, 3)
        nb = trip_stack.shape[0]
        width = max(chunk_pad, spec.nentity + 1)
        # Fixed-size scan chunks: ONE compiled program (shape [SC, B, 3])
        # serves every eval-set size — valid, test, evaluate_train, every
        # periodic validation — instead of one multi-minute XLA compile per
        # distinct batch count; pad batches repeat the last batch and their
        # ranks are dropped below. test_log_steps (when smaller) still
        # bounds the dispatch so the reference's progress cadence holds.
        log_every = max(1, test_log_steps)  # 0 must not zero the chunk/cadence
        SC = min(nb, _SCAN_CHUNK, log_every)
        n_scan = _cdiv(nb, SC) * SC
        if n_scan != nb:
            trip_stack = jnp.concatenate(
                [trip_stack, jnp.repeat(trip_stack[-1:], n_scan - nb, axis=0)]
            )

        device_ranks: List[jnp.ndarray] = []
        for mode in modes:
            offsets, counts, values, k_max = dev_filter._modes[mode]
            last_logged = 0
            for s in range(0, n_scan, SC):
                # slicing is itself a device op — skip it when one chunk
                # covers the whole stack
                sub = trip_stack if n_scan == SC else trip_stack[s: s + SC]
                if ranker is not None:
                    r = _eval_scan_pallas(
                        ranker.table, ranker.rel, ranker.modulus,
                        offsets, counts, values, sub,
                        ranker.tsin, ranker.tcos, spec=spec, mode=mode,
                        k_max=k_max, width=width, TE=ranker.TE,
                        half_pad=ranker.half_pad, span=ranker.span,
                        two_halves=ranker.two_halves, Epad=ranker.Epad,
                        interpret=ranker.interpret,
                    )
                else:
                    r = _eval_scan_xla(
                        params, offsets, counts, values, sub, spec=spec,
                        mode=mode, chunk=chunk, k_max=k_max, width=width,
                    )
                device_ranks.append(r.reshape(-1))
                done_b = min(s + SC, nb)
                if logger is not None and (
                    done_b // log_every > last_logged // log_every
                    or done_b == nb
                ):
                    last_logged = done_b
                    done = (min(done_b * eff_batch, n_real)
                            + n_real * modes.index(mode))
                    logger.info("Evaluating the model... (%d/%d)", done, total)
        per_mode = np.asarray(
            _concat_bounded(device_ranks)  # the ONE pull
        ).reshape(len(modes), n_scan * eff_batch)[:, :n_real]
        for ranks in per_mode:
            logs.extend(metrics_from_ranks(ranks))
        return {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}

    for mode in modes:
        for i in range(0, n_real, test_batch_size):
            pos = np.asarray(test_triples[i : i + test_batch_size], np.int32)
            B = pos.shape[0]
            if B < test_batch_size:  # pad to static shape, drop pad ranks
                pad = np.repeat(pos[-1:], test_batch_size - B, axis=0)
                pos_p = np.concatenate([pos, pad], axis=0)
            else:
                pos_p = pos
            mask = jnp.asarray(_pad_mask(filters.filter_mask_rows(pos_p, mode), chunk))
            pos_p = jnp.asarray(pos_p)
            if ranker is not None:
                ranks = ranker.ranks(pos_p, mask, mode)
            else:
                ranks = ranks_batch(
                    params, pos_p, mask, spec=spec, mode=mode, chunk=chunk,
                )
            logs.extend(metrics_from_ranks(np.asarray(ranks)[:B]))
            done += B
            if logger is not None and (
                (done // test_batch_size) % max(1, test_log_steps) == 0
            ):
                logger.info("Evaluating the model... (%d/%d)", done, total)

    return {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}


# ---------------------------------------------------------------------------
# Countries: AUC-PR over region candidates (codes/model.py ≈L335-355)
# ---------------------------------------------------------------------------

def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """sklearn.metrics.average_precision_score for binary labels (the
    reference's only sklearn dependency), reimplemented in numpy:
    AP = sum_n (R_n - R_{n-1}) * P_n over the descending-score sweep."""
    order = np.argsort(-y_score, kind="stable")
    y = np.asarray(y_true)[order]
    s = np.asarray(y_score)[order]
    tp = np.cumsum(y)
    n_pos = tp[-1]
    if n_pos == 0:
        return 0.0
    k = np.arange(1, len(y) + 1)
    precision = tp / k
    recall = tp / n_pos
    # group ties: AP only counts the last index of each distinct score
    distinct = np.r_[s[1:] != s[:-1], True]
    precision, recall = precision[distinct], recall[distinct]
    prev_recall = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - prev_recall) * precision))


# module-level so the compiled program is reused across every periodic
# countries validation (a fresh jit(lambda) per call would retrace+recompile)
@functools.partial(jax.jit, static_argnames=("spec",))
def _countries_score(params, samples, *, spec: ModelSpec):
    return kge.forward(params, spec, samples, scorers.SINGLE)[:, 0]


def countries_auc_pr(
    params: kge.Params,
    spec: ModelSpec,
    test_triples: np.ndarray,
    regions: Sequence[int],
    batch_size: int = 1024,
) -> float:
    """Score (head, relation, candidate_region) for every test triple ×
    region in 'single' mode; one pooled AP (codes/model.py ≈L335-355)."""
    samples = []
    y_true = []
    for h, r, t in np.asarray(test_triples):
        for reg in regions:
            samples.append((h, r, reg))
            y_true.append(1 if reg == t else 0)
    samples = np.asarray(samples, np.int32)
    scores = []
    for i in range(0, len(samples), batch_size):
        sl = samples[i : i + batch_size]
        scores.append(np.asarray(_countries_score(params, jnp.asarray(sl), spec=spec)))
    y_score = np.concatenate(scores)
    return average_precision(np.asarray(y_true), y_score)
