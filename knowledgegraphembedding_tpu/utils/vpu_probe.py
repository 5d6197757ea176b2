"""Measured per-op VPU peak rates + the eval kernel's op-count roofline.

The distance-family eval kernel (ops/pallas_rank.py) is VPU-compute-bound
(it runs ~5x above the table-stream bound), so its honest floor is a
COMPUTED one: exact op counts per streamed element x independently
measured per-op peak rates. This module supplies both halves; bench.py's
eval rows report `fraction_of_vpu_roofline` against it, replacing the r4
row's circular "~1.0 vs the kernel's own measured rate" (VERDICT r4 weak
#3).

Method — chain-length differencing: time one jitted fori_loop whose body
applies a K-link elementwise chain, at K and 2K links. Both programs
stream identical bytes per iteration, so (t_2K - t_K) isolates pure op
issue time with HBM stream, loop, and dispatch costs subtracted exactly.
Two pitfalls this design dodges (both measured, r4/r5):
  - a bandwidth-contaminated rate probe (3 ops/elem on a 16 MB carry is
    ~75% HBM time) undershoots peak ~4x;
  - too-small K puts the marginal time at ~10 us, under the tunnel's
    dispatch jitter — the first r5 cut "measured" 41 Tops/s f32, which is
    physically impossible (8x128 VPU x ~1 GHz x 4 ports ~ 4 Tops/s).
Links are data-dependent through the carry with alternating constants so
XLA can neither fold nor hoist them.
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

#: exact per-(streamed f32 element) op mix of ops/pallas_rank.py per
#: model family, read off the kernel source op-by-op.
#: RotatE (per padded HALF-dim complex element, §_rank_kernel):
#:   dre=sub, dim=sub, dre*dre=mul, dim*dim=mul, +=add (5 alu);
#:   sqrt special; reduce add = 1 alu.  (The r4 kernel also paid a
#:   cmp+max+select zero-guard = 3 more alu; removed in r5 — eval takes
#:   no gradient and sqrt(0)==0 exactly.)
#: TransE: sub, abs, reduce add = 3 alu.
#: pRotatE (§_rank_kernel_protate, FACTORIZED trig): lsin*tcos=mul,
#:   lcos*tsin=mul, sub, abs, reduce add = 5 alu, NO per-element sin —
#:   the 2*E*dpad one-time sincos table build (~60 cycle-equivalents per
#:   sin, measured) is amortized across the whole evaluation and is not
#:   part of the per-batch mix.
KERNEL_MIX = {
    "RotatE": {"alu": 6, "special": ("sqrt", 1)},
    "TransE": {"alu": 3, "special": None},
    "pRotatE": {"alu": 5, "special": None},
}


def _timed_chain(link, K: int, shape=(4096, 1024), reps: int = 30):
    """Seconds/iteration of a K-link chain body in ONE fori_loop dispatch,
    with bench.py's two-point rep fence (T(2r) - T(r)) cancelling the
    dispatch + 4-byte-probe RTT."""
    z0 = jax.jit(
        lambda k: jnp.abs(jax.random.normal(k, shape, jnp.float32)) + 0.1
    )(jax.random.PRNGKey(0))

    def body(i, z):
        for j in range(K):
            z = link(z, j)
        return z

    probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[:1]))

    def timed(r):
        run = jax.jit(lambda x: jax.lax.fori_loop(0, r, body, x))
        out = run(z0)
        float(probe(out))
        t0 = time.perf_counter()
        out = run(z0)
        float(probe(out))
        return time.perf_counter() - t0

    t1, t2 = timed(reps), timed(2 * reps)
    return max(t2 - t1, 0.25 * t1) / reps, z0.size


def op_rate(link, ops_per_link: int, K: int = 128, **kw):
    """(ops/s, debug) for one chain link via chain-length differencing."""
    tK, n = _timed_chain(link, K, **kw)
    t2K, _ = _timed_chain(link, 2 * K, **kw)
    dt = t2K - tK
    return (K * ops_per_link * n) / dt, {
        "t_K_us": round(tK * 1e6, 1),
        "t_2K_us": round(t2K * 1e6, 1),
    }


def measure_rates(fast: bool = False) -> Dict[str, Tuple[float, dict]]:
    """Peak f32 per-op rates. ``fast`` skips the diagnostic-only probes
    (mul_add fma check, guard mix, rsqrt) and keeps the three the
    roofline needs (alu, sqrt, sin)."""
    # K sits in the measured LINEAR region for each link cost: chains of
    # ~512+ cheap fused ops hit a codegen cliff (register spill — t
    # jumped 10x between K=256 and K=512 links on v5e) that corrupts the
    # marginal estimate, while K too small puts the marginal under the
    # dispatch jitter. 128/2K=256 for 1-cycle links; special-function
    # links are expensive enough that smaller K is already robust.
    rates: Dict[str, Tuple[float, dict]] = {}
    rates["alu"] = op_rate(
        lambda z, j: jnp.abs(z - (0.25 + 0.01 * (j % 3))) + 0.1, 3, K=128)
    if not fast:
        rates["mul_add"] = op_rate(
            lambda z, j: z * 0.99 + (0.01 + 0.001 * (j % 3)), 2, K=128)
        rates["guard_mix"] = op_rate(
            lambda z, j: jnp.where(z > 0.01 * (j % 3),
                                   jnp.maximum(z, 1e-30) * 0.999, 0.123),
            4, K=64)
        rates["rsqrt_chain"] = op_rate(
            lambda z, j: jax.lax.rsqrt(z + 0.3 + 0.01 * (j % 3)), 2, K=128)
    rates["sqrt_chain"] = op_rate(
        lambda z, j: jnp.sqrt(z + 0.3 + 0.01 * (j % 3)), 2, K=128)
    rates["sin_chain"] = op_rate(
        lambda z, j: jnp.sin(z + 0.7 + 0.01 * (j % 3)), 2, K=32)
    return rates


def roofline_seconds_per_batch(
    model: str, B: int, Epad: int, elems_per_row: int,
    rates: Dict[str, Tuple[float, dict]],
) -> float:
    """Computed VPU floor (s) for one rank-kernel eval batch: B rows x
    Epad candidates x elems_per_row streamed elements (RotatE: the padded
    HALF width — one complex element per lane). Additive ALU + special
    model: special-function ops issue through the same VPU pipeline (the
    sqrt/sin chains measure strictly below the ALU chain, so there is no
    hidden parallel unit to credit)."""
    mix = KERNEL_MIX[model]
    n_elem = B * Epad * elems_per_row
    alu_rate = rates["alu"][0]
    t = mix["alu"] * n_elem / alu_rate
    if mix["special"]:
        name, cnt = mix["special"]
        chain_rate = rates[f"{name}_chain"][0]  # counted 2 ops/link
        t_special = (2.0 / chain_rate) - (1.0 / alu_rate)
        t += cnt * n_elem * max(t_special, 0.0)
    return t
