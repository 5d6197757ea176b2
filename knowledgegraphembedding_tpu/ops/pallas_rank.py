"""Pallas fused filtered-ranking kernel for the distance-family scorers.

The evaluation hot loop (reference: codes/model.py §test_step ≈L332-390)
scores every entity as a corruption candidate. For the distance-family
models the score against candidate c reduces to one functional form

    RotatE:  score = gamma - sum_i |L_i - C_i|            (complex, L = h∘r)
    TransE:  score = gamma - sum_i |L_i - C_i|            (real,   L = h+r)
    pRotatE: score = gamma - modulus * sum_i |sin(L_i - C_i/s)|

where L depends only on the (positive, relation) pair and C is the raw
candidate row. This kernel fuses the whole per-candidate pipeline — score,
filter mask, compare-vs-true, rank count — into one pass that streams the
entity table tile-by-tile through VMEM:

  - table tiles [TE, dpad] are pipelined HBM->VMEM by the Pallas grid
    (sequential index_map = full-bandwidth streaming, no gather);
  - L rows [B, dpad] stay resident in VMEM for the whole grid;
  - all pairwise intermediates are 2-D [TE, dpad] vector ops (candidate
    tile on sublanes, dims on lanes — the natural VPU layout), one
    unrolled pass per batch row; nothing [B, E]-shaped touches HBM
    (the XLA chunked path materializes per-chunk score blocks);
  - per-row beat counts accumulate as SMEM scalars across grid steps;
    rank = 1 + count.

Measured on TPU v5e at YAGO3-10 shape (E=123k, d=500 -de, B=16):
5.4 ms/batch vs 9.6 ms for the XLA chunked path (1.8x).

Lane alignment: the embedding dim is zero-padded per (re|im) half to a
multiple of 128; pad columns contribute exactly 0 to every distance
(RotatE relies on sqrt(0) == 0 exactly — the r4 where(sq>0) guard was
removed in r5 because eval computes no gradient, keeping the per-element
mix at 6 ALU + 1 sqrt; pRotatE's factored form maps pads to
|sin0*cos0' - cos0*sin0'| = 0), so scores are unchanged.

DistMult/ComplEx rank via the MXU matmul path (ops/matmul_scoring.py)
instead — bilinear forms don't need this kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelSpec
from ..models import scorers

PI = math.pi
LANE = 128

DISTANCE_FAMILY = ("RotatE", "TransE", "pRotatE")


def supports(model_name: str) -> bool:
    return model_name in DISTANCE_FAMILY


def _pad_cols(x, span: int, span_pad: int, two_halves: bool):
    """Zero-pad each (re|im) half of the trailing dim from span to span_pad."""
    if span == span_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, span_pad - span)]
    if two_halves:
        re, im = x[..., :span], x[..., span:]
        return jnp.concatenate([jnp.pad(re, pad), jnp.pad(im, pad)], axis=-1)
    return jnp.pad(x, pad)


def _unpad_cols(x, span: int, span_pad: int, two_halves: bool):
    """Inverse of _pad_cols: recover the original (re|im) layout from
    lane-padded rows (lets the wrapper gather its few L/true rows from the
    PADDED table, so the unpadded table never needs to stay resident)."""
    if span == span_pad:
        return x
    if two_halves:
        return jnp.concatenate(
            [x[..., :span], x[..., span_pad: span_pad + span]], axis=-1
        )
    return x[..., :span]


def true_scores(left, true_rows, spec: ModelSpec, modulus):
    """Score of the true candidate given the precomputed L rows — the ONE
    implementation shared by the Pallas wrapper and the sharded evaluator
    (identical math to the kernel's per-candidate form)."""
    name = spec.model_name
    gamma = spec.gamma
    if name == "RotatE":
        half = left.shape[-1] // 2
        dre = left[:, :half] - true_rows[:, :half]
        dim = left[:, half:] - true_rows[:, half:]
        sq = dre * dre + dim * dim
        # no zero-guard: eval computes no gradient, sqrt(0) == 0 exactly
        # (pad columns), and the reference's own eval norm is unguarded —
        # the guarded form lives in models/scorers.py for the train path
        # where d(sqrt)/dx at 0 matters. Dropping cmp+max+select removes
        # 3 of 9 VPU ops/element from the rank kernel (r5).
        mag = jnp.sqrt(sq)
        return gamma - jnp.sum(mag, axis=-1, dtype=jnp.float32)
    if name == "TransE":
        return gamma - jnp.sum(jnp.abs(left - true_rows), axis=-1,
                               dtype=jnp.float32)
    inv_scale = PI / spec.embedding_range
    return gamma - modulus * jnp.sum(
        jnp.abs(jnp.sin(left - true_rows * inv_scale)), axis=-1,
        dtype=jnp.float32,
    )


def left_from_rows(fixed, r, spec: ModelSpec, mode: str):
    """L rows from pre-gathered fixed-entity rows [B, de] and relation rows
    [B, dr] (tail-batch: fixed = heads; head-batch: fixed = tails)."""
    name = spec.model_name
    sign = 1.0 if mode == scorers.TAIL_BATCH else -1.0
    if name == "TransE":
        # tail: L = h + r;  head: |h + r - t| = |t - r - h| -> L = t - r
        return fixed + sign * r
    if name == "pRotatE":
        # phases: tail: L = ph + pr; head: |sin(ph+pr-pt)| = |sin(pt-pr-ph)|
        scale = spec.embedding_range / PI
        return (fixed / scale) + sign * (r / scale)
    if name == "RotatE":
        half = fixed.shape[-1] // 2
        re_f, im_f = fixed[..., :half], fixed[..., half:]
        phase = r / (spec.embedding_range / PI)
        re_r = jnp.cos(phase)
        im_r = jnp.sin(phase) * sign  # head-batch uses conj(r)
        re_l = re_f * re_r - im_f * im_r
        im_l = re_f * im_r + im_f * re_r
        return jnp.concatenate([re_l, im_l], axis=-1)
    raise ValueError(f"{name} not in the distance family")


def left_rows(params, spec: ModelSpec, pos, mode: str):
    """Precompute the candidate-independent side L [B, de] in XLA (gathers
    B+B rows — negligible), so the kernel's inner loop is pure elementwise.

    tail-batch: candidates replace the tail; head-batch: the head. Both
    reduce to |L - C| (RotatE uses |conj(r)∘t - h| = |t∘conj(r) - h| for
    head-batch — same magnitude as the reference's grouped form)."""
    ent = params["entity_embedding"]
    rel = params["relation_embedding"]
    r = jnp.take(rel, pos[:, 1], axis=0)
    if mode == scorers.TAIL_BATCH:
        fixed = jnp.take(ent, pos[:, 0], axis=0)  # heads
    else:
        fixed = jnp.take(ent, pos[:, 2], axis=0)  # tails
    return left_from_rows(fixed, r, spec, mode)


def _rank_kernel(
    true_ref,  # SMEM [1, B] f32 — true-triple scores
    tid_ref,  # SMEM [1, B] i32 — true entity ids (excluded from the count)
    left_ref,  # VMEM [B, dpad] f32 (resident)
    tab_ref,  # VMEM [TE, dpad] f32 — streamed table tile
    mask_ref,  # VMEM [TE, B] i32 — streamed filter-mask tile (transposed)
    out_ref,  # SMEM [1, B] i32 — revisited per-row accumulator
    *,
    family: str,
    gamma: float,
    E: int,
    TE: int,
    half_pad: int,
    B: int,
):
    step = pl.program_id(0)
    ids = step * TE + jax.lax.broadcasted_iota(jnp.int32, (TE, 1), 0)

    if family == "RotatE":
        cre = tab_ref[:, :half_pad]
        cim = tab_ref[:, half_pad:]
    else:
        c = tab_ref[:]

    for b in range(B):  # static unroll: one clean 2-D pass per batch row
        @pl.when(step == 0)
        def _():
            out_ref[0, b] = 0

        if family == "RotatE":
            lre = left_ref[pl.ds(b, 1), :half_pad]
            lim = left_ref[pl.ds(b, 1), half_pad:]
            dre = lre - cre
            dim = lim - cim
            sq = dre * dre + dim * dim
            # unguarded: sqrt(0) == 0 exactly for pad columns and no
            # gradient flows here (see true_scores) — 6 ALU + 1 sqrt per
            # element instead of 9 + 1
            mag = jnp.sqrt(sq)
            acc = jnp.sum(mag, axis=1, keepdims=True, dtype=jnp.float32)
            score = gamma - acc
        else:  # TransE
            l = left_ref[pl.ds(b, 1), :]
            score = gamma - jnp.sum(
                jnp.abs(l - c), axis=1, keepdims=True, dtype=jnp.float32
            )

        # the true entity can never beat itself: exclude by id so
        # accumulation-order float noise between its in-kernel score and
        # true_score cannot flip the strict comparison (the reference's
        # argsort compares the true entity to itself and never counts it)
        beats = (
            (score > true_ref[0, b])
            & (ids < E)
            & (mask_ref[:, pl.ds(b, 1)] == 0)
            & (ids != tid_ref[0, b])
        )
        out_ref[0, b] += jnp.sum(beats.astype(jnp.int32))


def _rank_kernel_protate(
    true_ref,  # SMEM [1, B] f32 — true-triple scores
    tid_ref,  # SMEM [1, B] i32 — true entity ids (excluded from the count)
    mod_ref,  # SMEM [1, 1] f32 — the trainable modulus
    lsin_ref,  # VMEM [B, dpad] f32 — sin of the left phases (resident)
    lcos_ref,  # VMEM [B, dpad] f32 — cos of the left phases (resident)
    tsin_ref,  # VMEM [TE, dpad] f32 — streamed sin(candidate phase) tile
    tcos_ref,  # VMEM [TE, dpad] f32 — streamed cos(candidate phase) tile
    mask_ref,  # VMEM [TE, B] i32 — streamed filter-mask tile (transposed)
    out_ref,  # SMEM [1, B] i32 — revisited per-row accumulator
    *,
    gamma: float,
    E: int,
    TE: int,
    B: int,
):
    """pRotatE rank pass with FACTORIZED trig: |sin(l - p)| =
    |sin l * cos p - cos l * sin p|, with sin/cos of every candidate phase
    precomputed ONCE per evaluation (PallasRanker) and streamed as two
    tiles. The direct form evaluates one sin per (row, candidate, dim)
    element — at ~60 VPU-cycle-equivalents per sin (measured,
    tools/vpu_roofline.py) that is a 64 ms/batch16 roofline at YAGO shape,
    ~16x the RotatE kernel. Factored, the per-element mix is 5 one-cycle
    VPU ops (2 mul, sub, abs, reduce-add) and the sin cost collapses to a
    2*E*d one-time table build (~1/40 of one full-split eval's direct-sin
    count). Identity is exact in real arithmetic; f32 scores differ from
    the direct form by ~1 ulp, inside the eval's existing cross-backend
    tolerance (torch evaluates sin differently than XLA anyway)."""
    step = pl.program_id(0)
    ids = step * TE + jax.lax.broadcasted_iota(jnp.int32, (TE, 1), 0)
    tsin = tsin_ref[:]
    tcos = tcos_ref[:]

    for b in range(B):
        @pl.when(step == 0)
        def _():
            out_ref[0, b] = 0

        lsin = lsin_ref[pl.ds(b, 1), :]
        lcos = lcos_ref[pl.ds(b, 1), :]
        acc = jnp.sum(
            jnp.abs(lsin * tcos - lcos * tsin), axis=1, keepdims=True,
            dtype=jnp.float32,
        )
        score = gamma - acc * mod_ref[0, 0]
        beats = (
            (score > true_ref[0, b])
            & (ids < E)
            & (mask_ref[:, pl.ds(b, 1)] == 0)
            & (ids != tid_ref[0, b])
        )
        out_ref[0, b] += jnp.sum(beats.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("gamma", "E", "TE", "interpret")
)
def rank_counts_protate(
    lsin: jnp.ndarray,  # f32[B, dpad]
    lcos: jnp.ndarray,  # f32[B, dpad]
    true_score: jnp.ndarray,  # f32[B]
    true_ids: jnp.ndarray,  # i32[B]
    modulus: jnp.ndarray,  # f32[] scalar
    tsin: jnp.ndarray,  # f32[Epad, dpad]
    tcos: jnp.ndarray,  # f32[Epad, dpad]
    mask_t: jnp.ndarray,  # bool/int32[Epad, B]
    *,
    gamma: float,
    E: int,
    TE: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, dpad = lsin.shape
    Epad = tsin.shape[0]
    assert Epad % TE == 0, (Epad, TE)
    grid = (Epad // TE,)
    kern = functools.partial(
        _rank_kernel_protate, gamma=gamma, E=E, TE=TE, B=B)
    counts = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, dpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, dpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, dpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, dpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        interpret=interpret,
    )(
        true_score[None, :],
        true_ids[None, :],
        jnp.reshape(modulus.astype(jnp.float32), (1, 1)),
        lsin,
        lcos,
        tsin,
        tcos,
        mask_t.astype(jnp.int32),
    )
    return counts[0]


@functools.partial(
    jax.jit,
    static_argnames=("family", "gamma", "E", "TE", "half_pad",
                     "interpret"),
)
def rank_counts(
    left: jnp.ndarray,  # f32[B, dpad]
    true_score: jnp.ndarray,  # f32[B]
    true_ids: jnp.ndarray,  # i32[B]
    table: jnp.ndarray,  # f32[Epad, dpad]
    mask_t: jnp.ndarray,  # bool/int32[Epad, B] (transposed filter mask)
    *,
    family: str,
    gamma: float,
    E: int,
    TE: int,
    half_pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    # pRotatE ranks through rank_counts_protate (factorized trig, r5);
    # a silent fall-through here would compute TransE L1 scores for it
    assert family in ("RotatE", "TransE"), family
    B, dpad = left.shape
    Epad = table.shape[0]
    assert Epad % TE == 0, (Epad, TE)
    grid = (Epad // TE,)

    kern = functools.partial(
        _rank_kernel,
        family=family, gamma=gamma,
        E=E, TE=TE, half_pad=half_pad, B=B,
    )
    counts = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, dpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, dpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, B), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
        interpret=interpret,
    )(
        true_score[None, :],
        true_ids[None, :],
        left,
        table,
        mask_t.astype(jnp.int32),
    )
    return counts[0]


@functools.partial(
    jax.jit, static_argnames=("span", "half_pad", "two_halves", "Epad")
)
def _prep_table(table, *, span: int, half_pad: int, two_halves: bool,
                Epad: int):
    t = _pad_cols(table, span, half_pad, two_halves)
    if Epad != t.shape[0]:
        t = jnp.pad(t, ((0, Epad - t.shape[0]), (0, 0)))
    return t


@functools.partial(jax.jit, static_argnames=("inv_scale",))
def _prep_sincos(table_padded, *, inv_scale: float):
    """One-time sin/cos of every candidate phase for the factorized
    pRotatE kernel. 2*Epad*dpad sin/cos evals per evaluation — ~1/40 of
    the per-(row,candidate,dim) sins the direct form pays across a full
    split. Pad columns hold 0 -> (sin 0, cos 1), which the factored
    identity maps to a 0 contribution against the zero-padded left rows."""
    ph = table_padded * inv_scale
    return jnp.sin(ph), jnp.cos(ph)


class PallasRanker:
    """Prepares the lane-padded table once, then ranks eval batches through
    the fused kernel. Construct per evaluation (the table changes between
    training evals). For RotatE/TransE only the PADDED table stays live;
    pRotatE additionally pins the factorized-trig sin/cos tables — 3x the
    padded-table HBM (e.g. ~756 MB at YAGO d=500, vs ~252 MB single) —
    which eval.py's ranker-cache budget accounts for. The wrapper gathers
    its few L/true rows from it and un-pads them, so eval never holds two
    copies of the entity table in HBM."""

    def __init__(self, params, spec: ModelSpec, TE: int = 512,
                 interpret: bool = False):
        if not supports(spec.model_name):
            raise ValueError(spec.model_name)
        self.spec = spec
        self.interpret = interpret
        table = params["entity_embedding"]
        de = table.shape[1]
        self.two_halves = spec.model_name == "RotatE"
        span = de // 2 if self.two_halves else de
        self.span = span
        self.half_pad = -(-span // LANE) * LANE
        self.TE = TE
        Epad = -(-table.shape[0] // TE) * TE
        # one jitted program (cached across the per-evaluation reconstructions
        # of this ranker) instead of several eager pad ops — each eager op
        # costs a host<->device round trip on a remote-dispatch runtime
        self.table = _prep_table(
            table, span=span, half_pad=self.half_pad,
            two_halves=self.two_halves, Epad=Epad,
        )
        self.rel = params["relation_embedding"]
        self.Epad = Epad
        self.modulus = jnp.asarray(params.get("modulus", jnp.float32(1.0)))
        if spec.model_name == "pRotatE":
            self.tsin, self.tcos = _prep_sincos(
                self.table, inv_scale=PI / spec.embedding_range)
        else:
            self.tsin = self.tcos = None

    def ranks(self, pos: jnp.ndarray, filter_mask: jnp.ndarray, mode: str):
        # the whole pre/post-processing chain is one jitted program — on a
        # remote-dispatch runtime every eager op costs a round trip
        return _ranks_jit(
            self.table, self.rel, self.modulus, pos, filter_mask,
            self.tsin, self.tcos,
            spec=self.spec, mode=mode, TE=self.TE, half_pad=self.half_pad,
            span=self.span, two_halves=self.two_halves, Epad=self.Epad,
            interpret=self.interpret,
        )


@functools.partial(
    jax.jit,
    static_argnames=("spec", "mode", "TE", "half_pad", "span", "two_halves",
                     "Epad", "interpret"),
)
def _ranks_jit(table_padded, rel_table, modulus, pos, filter_mask,
               tsin=None, tcos=None, *,
               spec: ModelSpec, mode: str, TE: int, half_pad: int, span: int,
               two_halves: bool, Epad: int, interpret: bool):
    fixed_ids = pos[:, 0] if mode == scorers.TAIL_BATCH else pos[:, 2]
    true_ids = pos[:, 0] if mode == scorers.HEAD_BATCH else pos[:, 2]
    fixed = _unpad_cols(jnp.take(table_padded, fixed_ids, axis=0),
                        span, half_pad, two_halves)
    r = jnp.take(rel_table, pos[:, 1], axis=0)
    left = left_from_rows(fixed, r, spec, mode)
    left_p = _pad_cols(left, span, half_pad, two_halves)
    if filter_mask.shape[1] < Epad:
        filter_mask = jnp.pad(
            filter_mask, ((0, 0), (0, Epad - filter_mask.shape[1]))
        )
    else:
        filter_mask = filter_mask[:, :Epad]
    if spec.model_name == "pRotatE":
        # factorized trig (see _rank_kernel_protate): the true score uses
        # the SAME factored form so candidate-vs-true comparisons are
        # computed with one consistent rounding
        lsin = jnp.sin(left_p)
        lcos = jnp.cos(left_p)
        tsin_rows = jnp.take(tsin, true_ids, axis=0)
        tcos_rows = jnp.take(tcos, true_ids, axis=0)
        true_score = spec.gamma - modulus * jnp.sum(
            jnp.abs(lsin * tcos_rows - lcos * tsin_rows), axis=-1,
            dtype=jnp.float32)
        counts = rank_counts_protate(
            lsin, lcos, true_score, true_ids.astype(jnp.int32), modulus,
            tsin, tcos, filter_mask.T,
            gamma=spec.gamma, E=spec.nentity, TE=TE, interpret=interpret,
        )
        return counts + 1
    true_rows = _unpad_cols(jnp.take(table_padded, true_ids, axis=0),
                            span, half_pad, two_halves)
    true_score = true_scores(left, true_rows, spec, modulus)
    counts = rank_counts(
        left_p, true_score, true_ids.astype(jnp.int32),
        table_padded, filter_mask.T,
        family=spec.model_name, gamma=spec.gamma, E=spec.nentity,
        TE=TE, half_pad=half_pad,
        interpret=interpret,
    )
    return counts + 1


def ranks_batch_pallas(
    params, spec: ModelSpec, pos, filter_mask, mode: str,
    TE: int = 512, interpret: bool = False,
):
    """One-shot convenience wrapper (tests); production eval constructs a
    PallasRanker once per table."""
    return PallasRanker(params, spec, TE=TE, interpret=interpret).ranks(
        pos, filter_mask, mode
    )
