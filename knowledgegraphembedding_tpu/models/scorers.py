"""The five KGE scoring functions as pure JAX functions.

TPU-first redesign of the reference's scorer methods
(reference: codes/model.py §TransE ≈L172, §DistMult ≈L182, §ComplEx ≈L192,
§RotatE ≈L212, §pRotatE ≈L247).  Instead of an nn.Module with a dispatch
dict, each scorer is a pure function ``(h, r, t, *static) -> score`` over
broadcastable arrays:

  - ``single``:     h, r, t are ``[B, 1, d]``        -> score ``[B, 1]``
  - ``head-batch``: h is ``[B, n, de]``, r/t ``[B, 1, ·]`` -> score ``[B, n]``
  - ``tail-batch``: t is ``[B, n, de]``, h/r ``[B, 1, ·]`` -> score ``[B, n]``

XLA fuses the broadcasted elementwise chains into single HBM-bandwidth-bound
loops, so no hand-grouping is needed for *memory*; we nevertheless keep the
reference's associativity per mode (e.g. ``h + (r - t)`` for head-batch vs
``(h + r) - t`` for tail-batch) so per-step float outputs match the oracle
bit-for-bit at fp32.

Everything here is shape-polymorphic and jit/shard_map/pallas friendly: no
Python control flow on traced values, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

PI = math.pi


@jax.custom_jvp
def abs_ref(x):
    """|x| with the REFERENCE subgradient at the kink: d|x|/dx(0) = 0.

    torch's abs/norm(p=1) backward is ``sign(x)`` (sign(0) = 0); JAX's
    ``lax.abs`` picks +1 at exactly 0. The choice is measure-zero on
    paper, but embedding init values are f32-granular, so exact
    cancellations in ``h + r - t`` really occur (~1 per 33M score
    elements at the FB15k-237 TransE shape, measured) and each flips one
    gradient coefficient by the full +/-weight — the full-shape f64
    parity harness caught a 5.6e-7 param drift vs torch's own 3e-15
    op-order noise from a single such element. Primal is identical;
    only the tangent rule changes, so forward/eval paths are unaffected
    (reference: codes/model.py §TransE ≈L172-180, §pRotatE ≈L247-265)."""
    return jnp.abs(x)


@abs_ref.defjvp
def _abs_ref_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return jnp.abs(x), jnp.sign(x) * dx

HEAD_BATCH = "head-batch"
TAIL_BATCH = "tail-batch"
SINGLE = "single"
MODES = (SINGLE, HEAD_BATCH, TAIL_BATCH)


def _split2(x):
    """Split the trailing dim into (re, im) halves — the reference's
    ``torch.chunk(x, 2, dim=2)`` (codes/model.py ≈L195, ≈L216)."""
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


def _acc(x):
    """Accumulator dtype for the embedding-dim reduction: at least f32 (so
    bf16 compute sums in f32, the TPU norm), but never a DOWNcast — f64
    trajectory-parity runs (jax_enable_x64) must stay f64-exact."""
    return jnp.promote_types(x.dtype, jnp.float32)


def transe(h, r, t, gamma: float, mode: str):
    """score = gamma - || h + r - t ||_1  (codes/model.py §TransE ≈L172-180)."""
    if mode == HEAD_BATCH:
        score = h + (r - t)
    else:
        score = (h + r) - t
    return gamma - jnp.sum(abs_ref(score), axis=-1, dtype=_acc(score))


def distmult(h, r, t, mode: str):
    """score = sum(h * r * t)  (codes/model.py §DistMult ≈L182-190)."""
    if mode == HEAD_BATCH:
        score = h * (r * t)
    else:
        score = (h * r) * t
    return jnp.sum(score, axis=-1, dtype=_acc(score))


def complex_(h, r, t, mode: str):
    """score = Re(<h, r, conj(t)>)  (codes/model.py §ComplEx ≈L192-210)."""
    re_h, im_h = _split2(h)
    re_r, im_r = _split2(r)
    re_t, im_t = _split2(t)
    if mode == HEAD_BATCH:
        re_score = re_r * re_t + im_r * im_t
        im_score = re_r * im_t - im_r * re_t
        score = re_h * re_score + im_h * im_score
    else:
        re_score = re_h * re_r - im_h * im_r
        im_score = re_h * im_r + im_h * re_r
        score = re_score * re_t + im_score * im_t
    return jnp.sum(score, axis=-1, dtype=_acc(score))


def rotate(h, r, t, gamma: float, embedding_range: float, mode: str):
    """score = gamma - sum_i |h_i ∘ r_i - t_i|  with |r_i| = 1.

    The relation embedding stores raw phases scaled by
    ``embedding_range / pi`` so that init-range values land in [-pi, pi]
    (codes/model.py §RotatE ≈L212-245, esp. the ``phase_relation =
    relation / (embedding_range / pi)`` line).
    """
    re_h, im_h = _split2(h)
    re_t, im_t = _split2(t)
    phase_r = r / (embedding_range / PI)
    re_r = jnp.cos(phase_r)
    im_r = jnp.sin(phase_r)
    if mode == HEAD_BATCH:
        # conj(r) ∘ t - h : rotate the tail backwards onto the head
        re_score = re_r * re_t + im_r * im_t - re_h
        im_score = re_r * im_t - im_r * re_t - im_h
    else:
        # h ∘ r - t
        re_score = re_h * re_r - im_h * im_r - re_t
        im_score = re_h * im_r + im_h * re_r - im_t
    # Zero-guarded magnitude: sqrt' at 0 is NaN in raw autodiff, but the
    # reference's torch .norm(dim=0) uses the subgradient-0 convention at 0
    # (and bf16 rounding makes exact zeros likely). max() keeps the value
    # identical to sqrt(sq) for any sq >= 1e-30 and sends the grad to 0 at 0.
    sq = re_score * re_score + im_score * im_score
    mag = jnp.sqrt(jnp.maximum(sq, jnp.asarray(1e-30, sq.dtype)))
    return gamma - jnp.sum(mag, axis=-1, dtype=_acc(mag))


def protate(h, r, t, gamma: float, embedding_range: float, modulus, mode: str):
    """score = gamma - modulus * sum |sin(ph + pr - pt)| with trainable
    scalar ``modulus`` (codes/model.py §pRotatE ≈L247-265)."""
    scale = embedding_range / PI
    ph = h / scale
    pr = r / scale
    pt = t / scale
    if mode == HEAD_BATCH:
        score = ph + (pr - pt)
    else:
        score = (ph + pr) - pt
    score = abs_ref(jnp.sin(score))
    return gamma - jnp.sum(score, axis=-1, dtype=_acc(score)) * modulus


def score_fn(
    model_name: str,
    h,
    r,
    t,
    *,
    gamma: float,
    embedding_range: float,
    modulus: Optional[jnp.ndarray] = None,
    mode: str = SINGLE,
):
    """Dispatch table — the analogue of the reference's ``model_func`` dict
    (codes/model.py §KGEModel.forward ≈L150-165)."""
    if mode not in MODES:
        raise ValueError(f"mode {mode} not supported")
    if model_name == "TransE":
        return transe(h, r, t, gamma, mode)
    if model_name == "DistMult":
        return distmult(h, r, t, mode)
    if model_name == "ComplEx":
        return complex_(h, r, t, mode)
    if model_name == "RotatE":
        return rotate(h, r, t, gamma, embedding_range, mode)
    if model_name == "pRotatE":
        if modulus is None:
            raise ValueError("pRotatE requires a modulus parameter")
        return protate(h, r, t, gamma, embedding_range, modulus, mode)
    raise ValueError(f"model {model_name} not supported")
