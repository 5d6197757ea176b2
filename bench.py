"""Headline benchmark: RotatE train-step throughput on one TPU chip.

Config matches BASELINE.json's metric: 256 negatives, hidden_dim 1000
(double entity embedding -> 2000-wide table), batch 1024, self-adversarial
loss, dense Adam — i.e. the reference's RotatE FB15k-237 best_config shape
on a synthetic graph at FB15k-237 scale (14541 entities, 237 relations).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6) and has no TPU
support, so ``vs_baseline`` is the speedup over the reference-equivalent
PyTorch train step (same math: gather -> RotatE score -> self-adversarial
loss -> backward -> dense Adam) measured on this machine's available
non-TPU hardware: 7 triples/s on the host CPU (136.8 s/step, 1 core,
torch 2.x — measurement script in BENCH_NOTES.md). The fraction-of-HBM-
roofline view (~0.10, gather-floor bound — see BENCH_NOTES.md) is kept in
the notes.
"""

import faulthandler
import json
import os
import signal
import sys
import time

import numpy as np

# live stack dump on demand (`kill -USR1 <pid>`): the matrix runs tens of
# minutes on a tunneled chip and a stall needs to be attributable without
# a debugger in the image
faulthandler.register(signal.SIGUSR1)

import jax
import jax.numpy as jnp

# persistent compile cache (same dir as the CLI — one shared helper): the
# driver runs this script in a fresh process every round
from knowledgegraphembedding_tpu.utils import compile_cache

compile_cache.enable()


def _time_loop(body, init, reps=30):
    """Seconds/iteration of ``body`` run ``reps`` times INSIDE one jitted
    fori_loop program, fenced through a 4-byte probe (the tunnel dispatches
    fully async; block_until_ready returns early).

    Timing ops call-by-call inflates sub-ms kernels by the tunnel's
    per-dispatch host overhead (~1-3 ms each): the first r3 matrix pass
    measured dense-path "floors" LARGER than the real fused step that way
    (fractions 1.3-1.6). One dispatch per 30 device-side iterations makes
    the overhead per-iteration negligible. Each body iteration is
    data-dependent on the previous carry so XLA cannot hoist or CSE the
    repeated op out of the loop."""
    probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x[0])[:1]))

    def timed(r):
        run = jax.jit(lambda x: jax.lax.fori_loop(0, r, body, x))
        out = run(init)      # compile + warm
        float(probe(out))
        t0 = time.perf_counter()
        out = run(init)
        float(probe(out))
        return time.perf_counter() - t0

    # two-point fence cancellation: each timed section pays one dispatch +
    # one 4-byte probe pull (~10-20 ms RTT on the tunnel), which dominates
    # sub-ms bodies (a 0.2 ms shared-negatives floor measured as 3 ms and
    # its fraction swung 0.98 -> 0.29 between runs). T(2r) - T(r) has the
    # fence subtracted exactly.
    t1 = timed(reps)
    t2 = timed(2 * reps)
    return max(t2 - t1, 0.25 * t1) / reps  # clamp guards a noisy T(r) > T(2r)


def _floor_seconds(trainer, spec, tspec, B, n, negative_sharing):
    """Live-measured primitive floor (seconds/step) for THIS row's actual
    access pattern (VERDICT r2 next-round #4 — every published number gets
    a floor fraction, not just the headline shape):

    gather path       — the two irreducible random-access passes at the
                        step's compute dtype (bf16 rows move half the HBM
                        bytes): the B*(n+2)-row forward gather and the
                        same-size backward scatter-add.
    shared negatives  — same passes at the reduced 2B+n row count.
    dense MXU path    — no per-negative rows at all; the floor is the
                        three step-shape matmuls ([B,d]x[d,E] forward,
                        [B,E]x[E,d] and [d,B]x[B,E] backward, at the
                        step's compute precision) + the whole-table dense
                        Adam sweep + the 2B positive-row gather/scatter
                        + the sampled-score extraction pair (r4: the
                        [B,n] 4-byte-granularity take from [B,E] forward
                        and its scatter transpose backward — measured
                        2.6-2.7 ms each at the headline shape, the
                        single largest dense-step component and an
                        irreducible part of PER-POSITIVE dense
                        semantics).
    """
    from knowledgegraphembedding_tpu.train import use_dense_scoring

    table = trainer.params["entity_embedding"]
    E_log = spec.nentity
    de = table.shape[1]
    cdt = jnp.bfloat16 if tspec.precision == "bf16" else jnp.float32
    # ALL probe data is generated ON the device. A host-side
    # rng.normal((rows, de)) is gigabytes of f64 RNG plus a multi-GB
    # transfer through the TPU tunnel — measured as minutes of THP page
    # zeroing PER ROW (kernel stack: folio_zero_user), ~100x the cost of
    # the op being measured.
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1), 3)
    tab_c = table if table.dtype == cdt else jax.jit(
        lambda t: t.astype(cdt))(table)

    def gather_scatter(rows):
        ids0 = jax.jit(lambda k: jax.random.randint(
            k, (rows,), 0, E_log, jnp.int32))(k0)
        cot = jax.jit(lambda k: jax.random.normal(k, (rows, de), cdt))(k1)

        def g_body(i, st):
            out, ids, tab = st
            return (jnp.take(tab, ids, axis=0), (ids + 1) % E_log, tab)

        t_g = _time_loop(
            g_body, (jnp.zeros((rows, de), cdt), ids0, tab_c))

        def s_body(i, st):
            acc, ids, c = st
            return (acc.at[ids].add(c), (ids + 7) % E_log, c)

        t_s = _time_loop(s_body, (jnp.zeros((E_log, de), cdt), ids0, cot))
        return t_g + t_s

    if not use_dense_scoring(spec, tspec):
        rows = 2 * B + n if negative_sharing == "batch" else B * (n + 2)
        return gather_scatter(rows)

    phi0 = jax.jit(lambda k: jax.random.normal(k, (B, de), cdt))(k2)
    # the three step-shape matmuls chained through the carry (eps feed-in
    # keeps each iteration data-dependent; 1e-20 * O(1e4) vanishes against
    # O(1) operands, so values stay stable across reps)
    eps = jnp.asarray(1e-20, cdt)

    # the dense step forces Precision.HIGHEST for f32 parity
    # (ops/matmul_scoring.py); the floor must use the same MXU mode or it
    # under-counts by the multi-pass factor
    mm_prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
               else jax.lax.Precision.DEFAULT)

    def mm_body(i, st):
        phi, tab = st
        scores = jnp.matmul(phi, tab.T, precision=mm_prec)   # fwd [B, E]
        dphi = jnp.matmul(scores, tab, precision=mm_prec)    # bwd [B, de]
        dtab = jnp.matmul(scores.T, phi, precision=mm_prec)  # bwd [E, de]
        return (phi + eps * dphi, tab + eps * dtab)

    t_3mm = _time_loop(mm_body, (phi0, tab_c))

    def adam_body(i, st):
        p, m, v, g = st
        p = p - 1e-3 * (0.9 * m + 0.1 * g) / (
            jnp.sqrt(0.999 * v + 1e-3 * g * g) + 1e-8)
        return (p, m, v, g)

    t_adam = _time_loop(adam_body, (
        table, jnp.zeros_like(table), jnp.zeros_like(table),
        jax.jit(lambda k: jax.random.normal(k, table.shape, table.dtype))(k1)))

    # sampled-score extraction: [B, n] take from the [B, E] score block
    # (forward) + the matching scatter (backward transpose)
    S0 = jax.jit(lambda k: jax.random.normal(k, (B, E_log), jnp.float32))(k0)
    neg_ids = jax.jit(lambda k: jax.random.randint(
        k, (B, n), 0, E_log, jnp.int32))(k1)
    g_bn = jax.jit(lambda k: jax.random.normal(k, (B, n), jnp.float32))(k2)
    rows_bn = jax.lax.broadcasted_iota(jnp.int32, (B, n), 0)

    def take_body(i, st):
        s, acc = st
        v = jnp.take_along_axis(s, neg_ids, axis=1)
        return (s + 1e-30 * acc, acc + v[0, 0] + jnp.sum(v) * 1e-20)

    t_take = _time_loop(take_body, (S0, jnp.float32(0)))

    def dscat_body(i, st):
        acc, g = st
        ds = jnp.zeros((B, E_log), jnp.float32).at[rows_bn, neg_ids].add(g)
        return (acc + ds[0, 0], g * (1 + acc * 1e-30))

    t_dscat = _time_loop(dscat_body, (jnp.float32(0), g_bn))
    return t_3mm + t_adam + gather_scatter(2 * B) + t_take + t_dscat


_DS_CACHE = {}


def _dataset(nentity, nrelation, ntriples):
    """(ds, filters) for one synthetic graph. The matrix measures many
    configurations on the SAME graph; the 272k-1.08M-triple build +
    FilterSets CSR cost minutes of single-core host time per call and are
    read-only downstream, so cache them per shape."""
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg

    key = (nentity, nrelation, ntriples)
    if key not in _DS_CACHE:
        ds = make_random_kg(nentity=nentity, nrelation=nrelation,
                            ntriples=ntriples, n_valid=1000, n_test=1000,
                            seed=0)
        filters = FilterSets.build(ds.train, ds.all_true_triples,
                                   ds.nentity, ds.nrelation)
        _DS_CACHE[key] = (ds, filters)
    return _DS_CACHE[key]


def _measure_train(model="RotatE", scoring="auto", precision="f32",
                   negative_sharing="none", B=1024, n=256, d=1000,
                   n_steps=50, sampler_backend="auto",
                   nentity=14541, nrelation=237, ntriples=272115,
                   with_floor=True):
    """Train-step (triples/s, fraction_of_primitive_floor) for one
    configuration. Defaults are the FULL FB15k-237 scale (VERDICT r1 weak
    #1: an earlier //2 understated the sampler-side load at the stated
    scale)."""
    from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
    from knowledgegraphembedding_tpu.models import kge
    from knowledgegraphembedding_tpu.sampler import build_train_iterator
    from knowledgegraphembedding_tpu.train import Trainer

    ds, filters = _dataset(nentity, nrelation, ntriples)
    spec = ModelSpec(
        model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=d, gamma=9.0,
        double_entity_embedding=model in ("RotatE", "ComplEx"),
        double_relation_embedding=model == "ComplEx",
    )
    tspec = TrainSpec(
        negative_sample_size=n, batch_size=B,
        negative_adversarial_sampling=True, adversarial_temperature=1.0,
        scoring=scoring, precision=precision,
    )
    params = kge.init_params(spec, jax.random.PRNGKey(0))
    trainer = Trainer(spec, tspec, params, lr=5e-5, warm_up_steps=10**9)
    it = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, B, n, filters, prefetch_depth=6,
        negative_sharing=negative_sharing, backend=sampler_backend,
        device_put=True,
    )

    def step():
        pos, neg, w, mode = next(it)
        return trainer.one_step(
            (jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode)
        )

    probe = jax.jit(lambda x: jnp.sum(x[:1, :1]))

    def drain():
        return float(probe(trainer.params["entity_embedding"]))

    for _ in range(6):
        step()
    drain()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    drain()
    dt = time.perf_counter() - t0
    it.close()
    frac = None
    if with_floor:
        floor_s = _floor_seconds(trainer, spec, tspec, B, n, negative_sharing)
        frac = round(floor_s / (dt / n_steps), 3)
    return n_steps * B / dt, frac


def _measure_fused(model="RotatE", scoring="auto", precision="f32",
                   negative_sharing="none", B=1024, n=256, d=1000,
                   k=16, n_steps=64,
                   nentity=14541, nrelation=237, ntriples=272115):
    """Fused k-step-block throughput (--steps_per_dispatch k)."""
    from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
    from knowledgegraphembedding_tpu.fused_train import FusedDeviceTrainer
    from knowledgegraphembedding_tpu.models import kge

    ds, _ = _dataset(nentity, nrelation, ntriples)
    spec = ModelSpec(
        model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=d, gamma=9.0,
        double_entity_embedding=model in ("RotatE", "ComplEx"),
        double_relation_embedding=model == "ComplEx",
    )
    tspec = TrainSpec(
        negative_sample_size=n, batch_size=B,
        negative_adversarial_sampling=True, scoring=scoring,
        precision=precision,
    )
    tr = FusedDeviceTrainer(
        spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
        lr=5e-5, warm_up_steps=10**9, train=ds.train,
        negative_sharing=negative_sharing,
    )
    probe = jax.jit(lambda x: jnp.sum(x[:1, :1]))
    tr.run_block(k)
    float(probe(tr.params["entity_embedding"]))
    t0 = time.perf_counter()
    for _ in range(n_steps // k):
        tr.run_block(k)
    float(probe(tr.params["entity_embedding"]))
    dt = time.perf_counter() - t0
    return (n_steps // k) * k * B / dt


def decompose(name, model, scoring, precision, negative_sharing, B, n, d,
              nentity, nrelation, ntriples, reps=20):
    """ms-level step decomposition for one row (VERDICT r3 #2): sample /
    forward / backward / table-sweep / Adam / full step, each as a
    device-resident fori_loop probe (single dispatch, two-point fence
    cancellation). ``bwd_only`` subtracts the fwd and the 1e-30 grad-sweep
    the fwd+bwd probe needs to keep iterations data-dependent."""
    from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
    from knowledgegraphembedding_tpu.fused_train import (
        FusedDeviceTrainer, _sample_one)
    from knowledgegraphembedding_tpu.models import kge
    from knowledgegraphembedding_tpu.sampler.negative import TAIL_BATCH
    from knowledgegraphembedding_tpu.train import loss_and_logs
    from knowledgegraphembedding_tpu import optim

    ds, _ = _dataset(nentity, nrelation, ntriples)
    spec = ModelSpec(model_name=model, nentity=ds.nentity,
                     nrelation=ds.nrelation, hidden_dim=d, gamma=9.0,
                     double_entity_embedding=model in ("RotatE", "ComplEx"),
                     double_relation_embedding=model == "ComplEx")
    tspec = TrainSpec(negative_sample_size=n, batch_size=B,
                      negative_adversarial_sampling=True, scoring=scoring,
                      precision=precision)
    tr = FusedDeviceTrainer(
        spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)), lr=5e-5,
        warm_up_steps=10**9, train=ds.train,
        negative_sharing=negative_sharing)
    state = dict(tr._state)
    state["k_max"] = dict(tr._k_max)
    shared = negative_sharing == "batch"
    E, R = spec.nentity, spec.nrelation
    params, opt_state = tr.params, tr.opt_state
    rng = np.random.default_rng(0)
    idx_row = jnp.asarray(rng.integers(0, len(ds.train), B).astype(np.int32))
    key0 = jax.random.PRNGKey(7)
    pos0, neg0, w0 = jax.jit(lambda k: _sample_one(
        state, k, idx_row, TAIL_BATCH, spec=spec, n=n, shared=shared))(key0)
    out = {"name": name}

    def sample_body(i, st):
        acc, _ = st
        key = jax.random.fold_in(key0, i)
        pos, neg, w = _sample_one(state, key, idx_row, TAIL_BATCH,
                                  spec=spec, n=n, shared=shared)
        return (acc + w[0] + pos[0, 0] + neg[0, 0], i)

    out["sample_ms"] = _time_loop(
        sample_body, (jnp.float32(0), jnp.int32(0)), reps) * 1e3

    shift = jnp.asarray([1, 1, 1], jnp.int32)
    lim = jnp.asarray([E, R, E], jnp.int32)

    def fwd_body(i, st):
        acc, params, pos = st
        loss, _ = loss_and_logs(params, spec, tspec, pos, neg0, w0,
                                TAIL_BATCH)
        return (acc + loss, params, (pos + shift) % lim)

    out["fwd_ms"] = _time_loop(
        fwd_body, (jnp.float32(0), params, pos0), reps) * 1e3

    def fb_body(i, st):
        acc, params, pos = st
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_and_logs(p, spec, tspec, pos, neg0, w0,
                                    TAIL_BATCH), has_aux=True)(params)
        params = jax.tree.map(
            lambda p, g: p + 1e-30 * g.astype(p.dtype), params, grads)
        return (acc + loss, params, (pos + shift) % lim)

    out["fwd_bwd_plus_sweep_ms"] = _time_loop(
        fb_body, (jnp.float32(0), params, pos0), reps) * 1e3

    gfixed = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, params)

    def sweep_body(i, st):
        acc, params = st
        params = jax.tree.map(lambda p, g: p + 1e-30 * g, params, gfixed)
        return (acc + params["entity_embedding"][0, 0], params)

    out["table_sweep_ms"] = _time_loop(
        sweep_body, (jnp.float32(0), params), reps) * 1e3

    def adam_body(i, st):
        acc, params, opt = st
        params, opt = optim.apply_update(params, gfixed, opt,
                                         jnp.float32(5e-5))
        return (acc + params["entity_embedding"][0, 0], params, opt)

    out["adam_ms"] = _time_loop(
        adam_body, (jnp.float32(0), params, opt_state), reps) * 1e3

    def full_body(i, st):
        acc, params, opt = st
        key = jax.random.fold_in(key0, i)
        pos, neg, w = _sample_one(state, key, idx_row, TAIL_BATCH,
                                  spec=spec, n=n, shared=shared)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_and_logs(p, spec, tspec, pos, neg, w, TAIL_BATCH),
            has_aux=True)(params)
        params, opt = optim.apply_update(params, grads, opt,
                                         jnp.float32(5e-5))
        return (acc + loss, params, opt)

    out["full_step_ms"] = _time_loop(
        full_body, (jnp.float32(0), params, opt_state), reps) * 1e3
    out["bwd_only_ms"] = (out["fwd_bwd_plus_sweep_ms"] - out["fwd_ms"]
                          - out["table_sweep_ms"])
    for k in list(out):
        if k.endswith("_ms"):
            out[k] = round(out[k], 3)
    print(json.dumps(out))
    return out


DECOMPOSE_CASES = [
    ("DistMult dense f32 (device sampler)", "DistMult", "dense", "f32",
     "none", 1024, 256, 1000, 14541, 237, 272115),
    ("ComplEx dense f32 (device sampler)", "ComplEx", "dense", "f32",
     "none", 1024, 256, 1000, 14541, 237, 272115),
    ("RotatE shared negs f32", "RotatE", "gather", "f32", "batch",
     1024, 256, 1000, 14541, 237, 272115),
    ("RotatE YAGO true scale (gather f32)", "RotatE", "gather", "f32",
     "none", 1024, 400, 500, 123182, 37, 1079040),
]


def _eval_floor_evals_per_s(spec, table, B, rates=None, bw=None):
    """Floor (evals/s) for one distance-family eval batch =
    max(table-stream bound, computed VPU-op roofline) — NON-CIRCULAR
    (VERDICT r4 weak #3):

      - table stream: the bytes any evaluator must touch (every candidate
        row once per batch — the factorized pRotatE kernel streams TWO
        tables, sin and cos of the phases — plus the [Epad, B] filter-mask
        tiles) over the independently measured PEAK sequential HBM read
        bandwidth. NOT a one-shot stream timing of this table: that varied
        167-543 GB/s across models in one eval_rows pass (tunnel mood) and
        made one 'floor' sit 29% UNDER the measured kernel;
      - VPU roofline: exact per-element op count of the rank kernel
        (utils/vpu_probe.KERNEL_MIX, read off the kernel source) divided
        by independently measured per-op peak rates (K-sweep slope-fit
        chain probes — HBM/dispatch costs cancel exactly).

    The r4 first cut folded a hand-waved 7-ops/dim estimate against a
    bandwidth-contaminated rate probe and produced a 'floor' 3x above the
    real kernel (fraction 2.95); the probe module's docstring records how
    each failure mode is now excluded. Bilinear models floor on the
    HIGHEST-precision MXU matmul instead (measured by the caller)."""
    from knowledgegraphembedding_tpu.utils import vpu_probe

    if bw is None:
        bw = vpu_probe.hbm_bandwidth()
    if rates is None:
        rates = vpu_probe.measure_rates(fast=True)
    Epad, dpad = table.shape
    n_tables = 2 if spec.model_name == "pRotatE" else 1
    stream_bytes = n_tables * Epad * dpad * 4 + Epad * B * 4
    t_stream = stream_bytes / bw[0]
    elems = dpad // 2 if spec.double_entity_embedding else dpad
    t_vpu = vpu_probe.roofline_seconds_per_batch(
        spec.model_name, B, Epad, elems, rates)
    t_bound = max(t_stream, t_vpu)
    return B / t_bound, {
        "table_stream_ms": round(t_stream * 1e3, 2),
        "vpu_roofline_ms": round(t_vpu * 1e3, 2),
        "hbm_gbps": round(bw[0] / 1e9, 1),
        "rates_gops": {k: round(v[0] / 1e9, 1) for k, v in rates.items()},
    }


def _eval_resident_rate(params, spec, filters, test_triples, mode):
    """Steady COMPUTE rate (evals/s) of the whole-mode eval scan with every
    operand device-resident, timed by the fori_loop two-point fence — the
    same technique the train decompositions use. The e2e test_step number
    rides the tunnel (pos upload + rank pull + per-scan dispatch RTT) and
    was a 1.75x 'tunnel-load sensitive' band in the r4 matrix (VERDICT r4
    weak #5); this is the number of record for the compute itself, with
    the e2e gap attributed to dispatch/transfer."""
    from knowledgegraphembedding_tpu import eval as eval_mod
    from knowledgegraphembedding_tpu.ops import pallas_rank

    E = spec.nentity
    chunk = 4096
    chunk_pad = -(-E // chunk) * chunk
    width = max(chunk_pad, E + 1)
    eff_batch = eval_mod.eff_eval_batch(spec, 16)
    dev_filter = eval_mod.get_device_filter(filters)
    offsets, counts, values, k_max = dev_filter._modes[mode]
    SC = min(eval_mod._SCAN_CHUNK, len(test_triples) // eff_batch)
    trip = np.asarray(test_triples[: SC * eff_batch], np.int32)
    trip_stack = jnp.asarray(trip).reshape(SC, eff_batch, 3)
    n_evals = SC * eff_batch
    use_pallas = pallas_rank.supports(spec.model_name)
    ranker = (eval_mod.get_pallas_ranker(params, spec)
              if use_pallas else None)

    # every array operand rides the carry (closure constants are
    # serialized into the remote compile request — HTTP 413 at 505 MB).
    # Cross-iteration dependence rides the SMALL relation table as a
    # float perturbation (1 + acc*1e-30): bit-identical in f32 (acc*1e-30
    # underflows against 1) yet unfoldable, so the scan re-executes every
    # iteration. The first cut perturbed the int triple stack with
    # `acc & 0` — XLA folds and(x, 0) to 0, hoisted the loop-invariant
    # scan, and "measured" 142k evals/s, 31x above the floor.
    def body(i, st):
        if use_pallas:
            (acc, tab, rel, modulus, tsin, tcos, off, cnt, val, stack) = st
            rel = rel * (1 + acc.astype(rel.dtype) * 1e-30)
            r = eval_mod._eval_scan_pallas(
                tab, rel, modulus, off, cnt, val, stack, tsin, tcos,
                spec=spec, mode=mode, k_max=k_max, width=width,
                TE=ranker.TE, half_pad=ranker.half_pad, span=ranker.span,
                two_halves=ranker.two_halves, Epad=ranker.Epad,
                interpret=False)
            acc = acc + jnp.sum(r)
            return (acc, tab, rel, modulus, tsin, tcos, off, cnt, val,
                    stack)
        acc, p, off, cnt, val, stack = st
        rel = p["relation_embedding"]
        p = dict(p, relation_embedding=rel * (1 + acc.astype(rel.dtype)
                                              * 1e-30))
        r = eval_mod._eval_scan_xla(
            p, off, cnt, val, stack, spec=spec, mode=mode, chunk=chunk,
            k_max=k_max, width=width)
        acc = acc + jnp.sum(r)
        return (acc, p, off, cnt, val, stack)

    if use_pallas:
        init = (jnp.int32(0), ranker.table, ranker.rel, ranker.modulus,
                ranker.tsin, ranker.tcos, offsets, counts, values,
                trip_stack)
    else:
        init = (jnp.int32(0), params, offsets, counts, values, trip_stack)
    t = _time_loop(body, init, reps=10)
    return n_evals / t, {"resident_scan_ms": round(t * 1e3, 2),
                         "evals_per_scan": n_evals}


def matrix():
    """Full measured matrix (manual use; the driver runs the default
    single-line mode). One JSON line per configuration."""
    cases = [
        dict(name="RotatE gather f32 (reference semantics)", model="RotatE",
             scoring="gather"),
        dict(name="RotatE gather f32 + device sampler", model="RotatE",
             scoring="gather", sampler_backend="device"),
        dict(name="RotatE gather bf16 + device sampler", model="RotatE",
             scoring="gather", precision="bf16", sampler_backend="device"),
        dict(name="RotatE shared negatives f32 + device sampler",
             model="RotatE", scoring="gather", negative_sharing="batch",
             sampler_backend="device"),
        dict(name="DistMult dense MXU f32 (host sampler)", model="DistMult",
             scoring="dense"),
        dict(name="DistMult dense MXU f32 + device sampler", model="DistMult",
             scoring="dense", sampler_backend="device"),
        dict(name="ComplEx dense MXU f32 + device sampler", model="ComplEx",
             scoring="dense", sampler_backend="device"),
    ]
    for c in cases:
        name = c.pop("name")
        tps, frac = _measure_train(**c)
        print(json.dumps({"metric": f"train triples/s — {name}",
                          "value": round(tps, 1), "unit": "triples/s",
                          "fraction_of_primitive_floor": frac}))

    for name, kw in [
        ("RotatE gather f32, fused k=16 + device sampler "
         "(reference semantics)",
         dict(model="RotatE", scoring="gather")),
        ("RotatE shared negs bf16, fused k=16 (max-throughput stack)",
         dict(model="RotatE", scoring="gather", negative_sharing="batch",
              precision="bf16")),
        ("DistMult dense MXU f32, fused k=16",
         dict(model="DistMult", scoring="dense")),
    ]:
        tps = _measure_fused(**kw)
        print(json.dumps({"metric": f"train triples/s — {name}",
                          "value": round(tps, 1), "unit": "triples/s"}))

    # wn18rr best-config shape (the big-negatives config: B*n = 524k rows)
    tps, frac = _measure_train(model="RotatE", scoring="gather", B=512,
                               n=1024, d=500, n_steps=30, nentity=40943,
                               nrelation=11, ntriples=86835)
    print(json.dumps({"metric": "train triples/s — RotatE wn18rr "
                                "(E=40943, B=512, n=1024, d=500 -de)",
                      "value": round(tps, 1), "unit": "triples/s",
                      "fraction_of_primitive_floor": frac}))

    # TRUE YAGO3-10 scale (E=123182, 1.08M train triples; best_config:
    # n=400, d=500 -de, B=1024) — r1's row used an E=14541 stand-in
    tps, frac = _measure_train(model="RotatE", scoring="gather", B=1024,
                               n=400, d=500, n_steps=30, nentity=123182,
                               nrelation=37, ntriples=1079040)
    print(json.dumps({"metric": "train triples/s — RotatE YAGO3-10 "
                                "(E=123182, 1.08M triples, n=400, d=500 -de)",
                      "value": round(tps, 1), "unit": "triples/s",
                      "fraction_of_primitive_floor": frac}))

    eval_rows()


def eval_rows():
    """Evaluation throughput (YAGO3-10 scale), device-resident eval path.
    4096 test triples per mode: a 512-triple split is one scan dispatch
    per mode for the 128-row bilinear batches, so its steady rate is
    tunnel-RTT-bound (~23k evals/s) and masks the compute rate the
    window-rank path actually delivers (~70k; BENCH_NOTES §Round-4)."""
    import time

    from knowledgegraphembedding_tpu import eval as eval_mod
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
    from knowledgegraphembedding_tpu.models import kge

    ds = make_random_kg(nentity=123182, nrelation=37, ntriples=400000,
                        n_valid=500, n_test=4096, seed=0)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity,
                               ds.nrelation)
    vpu_rates = hbm = None
    for model in ("RotatE", "TransE", "pRotatE", "DistMult"):
        spec = ModelSpec(
            model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
            hidden_dim=500, gamma=24.0,
            double_entity_embedding=model in ("RotatE", "ComplEx"),
            double_relation_embedding=model == "ComplEx",
        )
        params = kge.init_params(spec, jax.random.PRNGKey(0))
        # warm-up at the MEASURED split size: the whole-mode scan program's
        # length is the batch count, so a shorter warm-up split compiles a
        # DIFFERENT program and the timed call pays the compile (measured
        # 9.4s vs 0.30s steady — a 30x phantom slowdown in the r3 matrix)
        eval_mod.test_step(params, spec, ds.test, filters,
                           test_batch_size=16, device_filter=True)
        t0 = time.perf_counter()
        eval_mod.test_step(params, spec, ds.test, filters, test_batch_size=16,
                           device_filter=True)
        dt = time.perf_counter() - t0
        n = len(ds.test) * 2
        measured = n / dt
        # eval floor column (VERDICT r3 #3): distance family floors on
        # max(table stream, VPU score compute); bilinear floors on the
        # HIGHEST-precision MXU matmul at the 128-row eval batch
        resident, res_parts = _eval_resident_rate(
            params, spec, filters, ds.test, "tail-batch")
        if model in ("RotatE", "TransE", "pRotatE"):
            from knowledgegraphembedding_tpu.utils import vpu_probe

            if vpu_rates is None:
                vpu_rates = vpu_probe.measure_rates(fast=True)
                hbm = vpu_probe.hbm_bandwidth()
            ranker = eval_mod.get_pallas_ranker(params, spec)
            floor, parts = _eval_floor_evals_per_s(
                spec, ranker.table, 16, rates=vpu_rates, bw=hbm)
        else:
            tab = params["entity_embedding"]
            phi = jax.jit(lambda k: jax.random.normal(
                k, (128, tab.shape[1]), jnp.float32))(jax.random.PRNGKey(2))

            def mm_body(i, st):  # tab in the carry: see stream_body note
                p, acc, t = st
                s = jnp.matmul(p, t.T,
                               precision=jax.lax.Precision.HIGHEST)
                return (p + 1e-30 * jnp.sum(s), acc + s[0, 0], t)

            t_mm = _time_loop(mm_body, (phi, jnp.float32(0), tab), reps=20)
            floor, parts = 128 / t_mm, {"matmul128_ms": round(t_mm * 1e3, 2)}
        print(json.dumps({
            "metric": f"eval (triple,direction)/s — {model} YAGO3-10 scale "
                      "(E=123182, d=500, device filter, 4096-triple split, "
                      "steady state)",
            "value": round(measured, 1), "unit": "evals/s",
            # the rate of record for the compute itself: single-dispatch,
            # all operands device-resident, two-point fenced (the e2e
            # value above additionally carries tunnel dispatch/transfer)
            "device_resident_evals_per_s": round(resident, 1),
            "dispatch_ms_per_scan": round(
                max(0.0,
                    res_parts["evals_per_scan"] / max(measured, 1e-9)
                    - res_parts["evals_per_scan"] / resident) * 1e3, 2),
            "resident_parts": res_parts,
            "floor_evals_per_s": round(floor, 1),
            "fraction_of_eval_floor": round(resident / floor, 3),
            "e2e_fraction_of_eval_floor": round(measured / floor, 3),
            "floor_parts": parts}))


def main():
    from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
    from knowledgegraphembedding_tpu.models import kge
    from knowledgegraphembedding_tpu.sampler import build_train_iterator
    from knowledgegraphembedding_tpu.train import Trainer

    B, n, d = 1024, 256, 1000
    ds = make_random_kg(nentity=14541, nrelation=237, ntriples=272115,
                        n_valid=1000, n_test=1000, seed=0)
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=d, gamma=9.0, double_entity_embedding=True,
    )
    tspec = TrainSpec(
        negative_sample_size=n, batch_size=B,
        negative_adversarial_sampling=True, adversarial_temperature=1.0,
    )
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    params = kge.init_params(spec, jax.random.PRNGKey(0))
    trainer = Trainer(spec, tspec, params, lr=5e-5, warm_up_steps=10**9)
    it = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, B, n, filters, prefetch_depth=6
    )

    def step():
        pos, neg, w, mode = next(it)
        return trainer.one_step(
            (jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode)
        )

    # NB: on the remote-TPU tunnel this machine uses, dispatch is fully
    # async and block_until_ready can return before compute drains; the only
    # reliable fence is materializing a value that depends on the updated
    # parameters. `probe` pulls 4 bytes of the entity table.
    probe = jax.jit(lambda x: jnp.sum(x[:1, :1]))

    def drain():
        return float(probe(trainer.params["entity_embedding"]))

    # warmup: compile both modes + the probe
    for _ in range(6):
        step()
    drain()

    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    drain()
    dt = time.perf_counter() - t0
    it.close()

    host_tps = n_steps * B / dt

    # Second reference-semantics leg: fused k-step blocks fed by the
    # on-device gap sampler (exactly uniform over the non-true set — the
    # same distribution the reference's rejection sampler produces, see
    # sampler/device_sampler.py). Math per step is bit-identical to the
    # single-step path (tests/test_fused_train.py). Two reasons it exists
    # here: (a) since the r3 gap sampler it is the FASTER
    # reference-semantics path (17.1k vs 16.8k measured), and (b) it is
    # robust to host-CPU contention, which halves the host-sampled number
    # when anything else runs on this box (measured: 16.7k idle -> 8.7k
    # under a concurrent pytest run).
    from knowledgegraphembedding_tpu.fused_train import FusedDeviceTrainer

    k = 16
    ftr = FusedDeviceTrainer(
        spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
        lr=5e-5, warm_up_steps=10**9, train=ds.train,
    )
    fprobe = jax.jit(lambda x: jnp.sum(x[:1, :1]))
    ftr.run_block(k)                       # compile + warm
    float(fprobe(ftr.params["entity_embedding"]))
    n_blocks = 8
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        ftr.run_block(k)
    float(fprobe(ftr.params["entity_embedding"]))
    fdt = time.perf_counter() - t0
    fused_tps = n_blocks * k * B / fdt

    triples_per_sec = max(host_tps, fused_tps)

    # Self-describing floor fraction (VERDICT r1 item 6): the step's two
    # irreducible random-access passes at reference semantics are the
    # B*(n+2)-row forward gather and the same-size backward scatter-add
    # (BENCH_NOTES.md primitive floors; the sorted-segment_sum alternative
    # measured slower). Measured live on this chip at the exact step shape
    # (shared _floor_seconds helper, device-generated probe data);
    # reported as measured-step-floor / measured-step-time.
    floor_s = _floor_seconds(trainer, spec, tspec, B, n, "none")
    step_s = B / triples_per_sec  # step time of the winning path
    # Reference-equivalent PyTorch step on this host's CPU (the reference
    # has no TPU path): 7 triples/s measured (BENCH_NOTES.md §headline).
    TORCH_CPU_REFERENCE_TPS = 7.0
    print(json.dumps({
        "metric": "train triples/sec/chip (RotatE d=1000 -de, n=256, B=1024, "
                  "adv, dense Adam, full 272k-triple train set; best of the "
                  "two reference-semantics paths — host-sampled single steps "
                  "vs device-sampled fused k=16 blocks, identical per-step "
                  "math); vs_baseline = speedup over the reference-equivalent "
                  "torch step on this host's CPU; fraction_of_primitive_floor "
                  "= (live-measured gather+scatter floor) / step time",
        "value": round(triples_per_sec, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_sec / TORCH_CPU_REFERENCE_TPS, 1),
        "fraction_of_primitive_floor": round(floor_s / step_s, 3),
        "host_sampled_tps": round(host_tps, 1),
        "device_sampled_fused_tps": round(fused_tps, 1),
    }))


if __name__ == "__main__":
    if "--matrix" in sys.argv or "matrix" in sys.argv[1:]:
        matrix()
    elif "--decompose" in sys.argv:
        for case in DECOMPOSE_CASES:
            decompose(*case)
    else:
        main()
