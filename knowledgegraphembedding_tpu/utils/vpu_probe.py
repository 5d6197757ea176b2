"""Measured per-op VPU peak rates + the eval kernel's op-count roofline.

The distance-family eval kernel (ops/pallas_rank.py) is VPU-compute-bound
(it runs ~5x above the table-stream bound), so its honest floor is a
COMPUTED one: exact op counts per streamed element x independently
measured per-op peak rates. This module supplies both halves; bench.py's
eval rows report `fraction_of_vpu_roofline` against it, replacing the r4
row's circular "~1.0 vs the kernel's own measured rate" (VERDICT r4 weak
#3).

Method — chain-length SWEEP: time one jitted fori_loop whose body applies
a K-link elementwise chain, at three chain lengths x three repeats. Every
program streams identical bytes per iteration, so adjacent-pair slopes
isolate pure op issue time with HBM stream, loop, and dispatch costs
subtracted exactly; the per-link estimate is the median within each
K-pair across repeats, then the min across pairs (see op_rate).
Pitfalls this design dodges (all measured, r4/r5):
  - a bandwidth-contaminated rate probe (3 ops/elem on a 16 MB carry is
    ~75% HBM time) undershoots peak ~4x;
  - too-small K puts the marginal time at ~10 us, under the tunnel's
    dispatch jitter — the first r5 cut "measured" 41 Tops/s f32, which is
    physically impossible (8x128 VPU x 4 ALUs x ~1.5 GHz ~ 6 Tops/s —
    clock inferred from the published v5e bf16 matmul peak);
  - a TWO-point difference straddling Mosaic's register-spill cliff for
    long fused chains (lands unpredictably around ~384-768 fused 1-cycle
    ops): the same alu probe returned 631 Gop/s (spilled t_2K) and
    6,840 Gop/s (sub-linear t_2K) on consecutive runs. Slopes inside the
    linear region agree; spilled pairs only inflate and are outvoted.
Links are data-dependent through the carry with alternating constants so
XLA can neither fold nor hoist them.
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

#: per-(streamed f32 element) op mix of ops/pallas_rank.py per model
#: family, read off the kernel source with FUSED-INSTRUCTION accounting
#: (what Mosaic actually issues: a mul+add pair lowers to one fma; abs
#: is one sign-bit op):
#: RotatE (per padded HALF-dim complex element, §_rank_kernel):
#:   dre=sub, dim=sub, dre*dre=mul, dim*dim+=fma, reduce add = 5 issue
#:   slots + 1 sqrt.  (The r4 kernel also paid a cmp+max+select
#:   zero-guard; removed in r5 — eval takes no gradient and sqrt(0)==0
#:   exactly.)
#: TransE: sub, abs, reduce add = 3.
#: pRotatE (§_rank_kernel_protate, FACTORIZED trig): lsin*tcos=mul,
#:   -lcos*tsin+=fms, abs, reduce add = 4 — NO per-element sin; the
#:   2*E*dpad one-time sincos table build is amortized across the whole
#:   evaluation and is not part of the per-batch mix.
#: A measure-the-exact-mix-as-one-chain-link variant was tried and
#: abandoned: each mix is one more compiled program whose scheduling
#: luck varies run-to-run on the tunnel (adjacent-K slopes disagreed
#: 2-7x across three passes), while the single-op chains below reproduce
#: within ~25%. The op-count model's structural uncertainty (port
#: asymmetries, reduce-tree overlap) is ~+-20%; fractions near or
#: slightly above 1.0 mean "at the VPU's practical limit", not spare
#: headroom.
KERNEL_MIX = {
    "RotatE": {"alu": 5, "special": ("sqrt", 1)},
    "TransE": {"alu": 3, "special": None},
    "pRotatE": {"alu": 4, "special": None},
}


def fori_time(body, init, reps: int = 30, trials: int = 1):
    """Seconds/iteration of ``body`` inside ONE jitted fori_loop dispatch,
    with the two-point rep fence (T(2r) - T(r)) cancelling the dispatch +
    4-byte-probe RTT (same cancellation as bench._time_loop; local copy so
    the package never imports the bench harness). ``trials`` re-executes
    each timed window on the SAME compiled program and keeps the MIN:
    tunnel stalls only ever ADD time (one slope pair measured 449 vs
    1661 ns/link from a single ±2 ms swing over a 14 ms window)."""
    probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x[0])[:1]))

    def timed(r):
        run = jax.jit(lambda x: jax.lax.fori_loop(0, r, body, x))
        out = run(init)
        float(probe(out))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = run(init)
            float(probe(out))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(reps), timed(2 * reps)
    return max(t2 - t1, 0.25 * t1) / reps


def _with_w(link):
    """Adapt a 2-arg (z, j) link to the 3-arg (z, w, j) convention."""
    import inspect

    if len(inspect.signature(link).parameters) == 3:
        return link
    return lambda z, w, j: link(z, j)


def _timed_chain(link, K: int, shape=(4096, 1024), reps: int = 30,
                 pallas: bool = False, trials: int = 3):
    """Seconds/iteration of a K-link chain body in ONE fori_loop dispatch.

    ``pallas=True`` runs the chain INSIDE a Pallas kernel on a small
    VMEM-resident block instead of an XLA elementwise fusion over a big
    HBM array. The chain then has exactly ONE live vector register (x)
    plus constants — no spill is possible at any K, and Mosaic emits the
    K ops literally. XLA-level chains proved unusable for this on the
    tunnel: the fusion's tiling/spill decisions vary run to run and the
    measured "alu rate" swung 631 Gop/s -> 6.8 Top/s -> 68 Top/s across
    three eval_rows passes (architectural peak is ~6 Top/s; 41 and 68
    were still impossible)."""
    link = _with_w(link)
    if pallas:
        shape = (2048, 128)  # 1 MB VMEM block; big enough to fill lanes
        import jax.experimental.pallas as pl

        def kern(x_ref, w_ref, o_ref):
            x = x_ref[:]
            w = w_ref[:]  # loaded ONCE; per-link cost excluded by slope
            for j in range(K):
                x = link(x, w, j)
            o_ref[:] = x

        call = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
        z0, w0 = jax.jit(
            lambda k: tuple(
                jnp.abs(jax.random.normal(kk, shape, jnp.float32)) + 0.1
                for kk in jax.random.split(k))
        )(jax.random.PRNGKey(0))

        def body(i, st):
            z, w = st
            return (call(z, w), w)

        return fori_time(body, (z0, w0), reps=reps, trials=trials), z0.size

    z0, w0 = jax.jit(
        lambda k: tuple(
            jnp.abs(jax.random.normal(kk, shape, jnp.float32)) + 0.1
            for kk in jax.random.split(k))
    )(jax.random.PRNGKey(0))

    def body(i, st):
        z, w = st
        for j in range(K):
            z = link(z, w, j)
        return (z, w)

    return fori_time(body, (z0, w0), reps=reps), z0.size


def op_rate(link, ops_per_link: int, Ks=(64, 128, 256), repeats: int = 3,
            **kw):
    """(ops/s, debug) for one chain link: ``repeats`` independent K-SWEEPs
    over the Pallas (or XLA, on CPU) chain kernel, per-link time = the
    MEDIAN of all pooled adjacent-pair slopes. A single sweep's pair
    selection proved unstable on the tunnel (the same alu probe anchored
    four eval passes at 2.79 / 2.80 / 3.28 / 4.11 Top/s — a 1.47x spread
    from one noisy window flipping which pair looks 'linear'); the pooled
    median is robust to one inflated (stall) and one deflated
    (sub-linear) pair per repeat. Debug carries every slope so spread
    stays visible in recorded output."""
    by_pair = [[] for _ in range(len(Ks) - 1)]
    t_us = []
    n = None
    t0_raw = None
    for _ in range(repeats):
        ts = [_timed_chain(link, K, **kw) for K in Ks]
        n = ts[0][1]
        t0_raw = ts[0][0]
        t_us.append({K: round(t * 1e6, 1) for K, (t, _) in zip(Ks, ts)})
        for i in range(len(Ks) - 1):
            by_pair[i].append(
                (ts[i + 1][0] - ts[i][0]) / (Ks[i + 1] - Ks[i]))
    # median WITHIN each K-pair (kills single-window noise), min ACROSS
    # pairs (slopes differ systematically by chain length — longer
    # unrolled chains schedule slightly worse per op, and the kernel's
    # real per-element chain is SHORT, like the small-K pair). Pooling
    # all six slopes into one median mixed the two clusters and landed
    # on whichever had more members.
    pair_medians = []
    for sl in by_pair:
        pos = sorted(s for s in sl if s > 0)
        if pos:
            pair_medians.append(pos[len(pos) // 2])
    if not pair_medians:  # every pair non-increasing: secant fallback
        per_link = t0_raw / Ks[0]  # raw seconds, NOT the rounded debug
    else:
        per_link = min(pair_medians)
    spread = (round(max(pair_medians) / min(pair_medians), 2)
              if len(pair_medians) > 1 else None)
    return (ops_per_link * n) / per_link, {
        "t_us": t_us,
        "pair_median_slopes_ns": [
            round(s * 1e9, 2) for s in pair_medians],
        "pair_spread": spread,
    }


def hbm_bandwidth(mbytes: int = 512, reps: int = 20, trials: int = 2):
    """(bytes/s, debug) peak sequential HBM read bandwidth: full reduction
    over an ``mbytes`` f32 array inside one fori_loop dispatch, best of
    ``trials`` (the tunnel adds occasional multi-ms stalls; the MAX rate
    is the hardware's, the spread is the tunnel's). Used as the
    denominator of the table-stream eval floor — a per-table one-shot
    stream measurement varied 167-543 GB/s across models in the same
    eval_rows pass (tunnel mood), which made one 'floor' sit 29% UNDER
    the measured kernel."""
    n = (mbytes << 20) // 4
    tab = jax.jit(
        lambda k: jax.random.normal(k, (n // 1024, 1024), jnp.float32)
    )(jax.random.PRNGKey(7))

    def body(i, st):
        acc, t = st
        return (acc + jnp.sum(t * (1 + acc * 1e-30)), t)

    best, times = 0.0, []
    for _ in range(trials):
        t = fori_time(body, (jnp.float32(0), tab), reps=reps)
        times.append(round(t * 1e3, 2))
        best = max(best, (mbytes << 20) / t)
    return best, {"stream_ms_per_pass": times, "mbytes": mbytes}


def measure_rates(fast: bool = False) -> Dict[str, Tuple[float, dict]]:
    """Peak f32 per-op rates, measured inside a Pallas chain kernel on
    accelerators (one live vreg — spill-free by construction; see
    _timed_chain) and via the XLA chain on CPU (Pallas interpret mode is
    too slow to probe with). ``fast`` skips the diagnostic-only probes
    (mul_add fma check, guard mix, rsqrt, sin — sin is diagnostic-only
    since the factorized pRotatE kernel) and keeps the two the roofline
    needs (alu, sqrt). The small VMEM block makes a single
    chain iteration ~tens of us, so reps are raised until each timed
    window clears the tunnel's ms-scale jitter."""
    pallas = jax.default_backend() != "cpu"
    cheap = dict(pallas=pallas, reps=300 if pallas else 30)
    special = dict(pallas=pallas, reps=100 if pallas else 30)
    rates: Dict[str, Tuple[float, dict]] = {}
    rates["alu"] = op_rate(
        lambda z, j: jnp.abs(z - (0.25 + 0.01 * (j % 3))) + 0.1, 3,
        Ks=(64, 128, 256), **cheap)
    if not fast:
        rates["mul_add"] = op_rate(
            lambda z, j: z * 0.99 + (0.01 + 0.001 * (j % 3)), 2,
            Ks=(64, 128, 256), **cheap)
        rates["guard_mix"] = op_rate(
            lambda z, j: jnp.where(z > 0.01 * (j % 3),
                                   jnp.maximum(z, 1e-30) * 0.999, 0.123),
            4, Ks=(32, 64, 128), **cheap)
        rates["rsqrt_chain"] = op_rate(
            lambda z, j: jax.lax.rsqrt(z + 0.3 + 0.01 * (j % 3)), 2,
            Ks=(32, 64, 128), **special)
        # diagnostic only since the r5 factorized pRotatE kernel: no
        # KERNEL_MIX entry uses sin, so fast floor computations skip it
        rates["sin_chain"] = op_rate(
            lambda z, j: jnp.sin(z + 0.7 + 0.01 * (j % 3)), 2,
            Ks=(8, 16, 32), **special)
    rates["sqrt_chain"] = op_rate(
        lambda z, j: jnp.sqrt(z + 0.3 + 0.01 * (j % 3)), 2,
        Ks=(32, 64, 128), **special)
    return rates


def roofline_seconds_per_batch(
    model: str, B: int, Epad: int, elems_per_row: int,
    rates: Dict[str, Tuple[float, dict]],
) -> float:
    """Computed VPU roofline (s) for one rank-kernel eval batch: B rows x
    Epad candidates x elems_per_row streamed elements (RotatE: the padded
    HALF width — one complex element per lane). Fused-instruction op
    counts (KERNEL_MIX) over the measured per-op issue rates; sqrt pays
    its chain rate minus the one alu op the chain link also carries."""
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
