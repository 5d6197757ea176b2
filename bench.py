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

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache (same dir as the CLI — one shared helper): the
# driver runs this script in a fresh process every round
from knowledgegraphembedding_tpu.utils import compile_cache

compile_cache.enable()


def _time_op(fn, *args, probe_of=None, reps=10):
    """Steady-state seconds/call, fenced through the 4-byte probe (the
    tunnel dispatches fully async; block_until_ready returns early)."""
    probe = jax.jit(lambda x: jnp.sum(jnp.ravel(x)[:1]))
    out = fn(*args)
    float(probe(out if probe_of is None else probe_of(out)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(probe(out if probe_of is None else probe_of(out)))
    return (time.perf_counter() - t0) / reps


def _floor_seconds(trainer, spec, tspec, B, n, negative_sharing):
    """Live-measured primitive floor (seconds/step) for THIS row's actual
    access pattern (VERDICT r2 next-round #4 — every published number gets
    a floor fraction, not just the headline shape):

    gather path       — the two irreducible random-access passes: the
                        B*(n+2)-row forward gather and the same-size
                        backward scatter-add.
    shared negatives  — same passes at the reduced 2B+n row count.
    dense MXU path    — no per-negative rows at all; the floor is the
                        three step-shape matmuls ([B,d]x[d,E] forward,
                        [B,E]x[E,d] and [d,B]x[B,E] backward, at the
                        step's compute precision) + the whole-table dense
                        Adam sweep + the 2B positive-row gather/scatter.
    """
    from knowledgegraphembedding_tpu.train import use_dense_scoring

    table = trainer.params["entity_embedding"]
    E_log = spec.nentity
    de = table.shape[1]
    rng = np.random.default_rng(1)

    def gather_scatter(rows):
        ids = jnp.asarray(rng.integers(0, E_log, rows), jnp.int32)
        cot = jnp.asarray(rng.normal(size=(rows, de)).astype(np.float32))
        g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        s = jax.jit(lambda c, i: jnp.zeros((E_log, de), jnp.float32).at[i].add(c))
        return _time_op(g, table, ids) + _time_op(s, cot, ids)

    if not use_dense_scoring(spec, tspec):
        rows = 2 * B + n if negative_sharing == "batch" else B * (n + 2)
        return gather_scatter(rows)

    cdt = jnp.bfloat16 if tspec.precision == "bf16" else jnp.float32
    phi = jnp.asarray(rng.normal(size=(B, de)).astype(np.float32), cdt)
    dsc = jnp.asarray(rng.normal(size=(B, E_log)).astype(np.float32), cdt)
    tab_c = table.astype(cdt)
    mm = jax.jit(lambda a, b: a @ b)
    t_mm = (_time_op(mm, phi, tab_c.T)          # fwd scores  [B,E]
            + _time_op(mm, dsc, tab_c)          # bwd d_phi   [B,d]
            + _time_op(mm, dsc.T, phi))         # bwd d_table [E,d]
    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    adam = jax.jit(lambda p, m, v, g: (
        p - 1e-3 * (0.9 * m + 0.1 * g) / (jnp.sqrt(0.999 * v + 1e-3 * g * g)
                                          + 1e-8)))
    grad = jnp.asarray(rng.normal(size=table.shape).astype(np.float32))
    t_adam = _time_op(adam, table, m, v, grad)
    return t_mm + t_adam + gather_scatter(2 * B)


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
                   k=16, n_steps=64):
    """Fused k-step-block throughput (--steps_per_dispatch k)."""
    from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
    from knowledgegraphembedding_tpu.fused_train import FusedDeviceTrainer
    from knowledgegraphembedding_tpu.models import kge

    ds, _ = _dataset(14541, 237, 272115)
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

    # Evaluation throughput (YAGO3-10 scale), device-resident eval path
    import time

    from knowledgegraphembedding_tpu import eval as eval_mod
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
    from knowledgegraphembedding_tpu.models import kge

    ds = make_random_kg(nentity=123182, nrelation=37, ntriples=400000,
                        n_valid=500, n_test=512, seed=0)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity,
                               ds.nrelation)
    for model in ("RotatE", "DistMult"):
        spec = ModelSpec(
            model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
            hidden_dim=500, gamma=24.0,
            double_entity_embedding=model in ("RotatE", "ComplEx"),
            double_relation_embedding=model == "ComplEx",
        )
        params = kge.init_params(spec, jax.random.PRNGKey(0))
        # warm-up pass compiles both directions; second pass is steady-state
        eval_mod.test_step(params, spec, ds.test[:32], filters,
                           test_batch_size=16, device_filter=True)
        t0 = time.perf_counter()
        eval_mod.test_step(params, spec, ds.test, filters, test_batch_size=16,
                           device_filter=True)
        dt = time.perf_counter() - t0
        n = len(ds.test) * 2
        print(json.dumps({
            "metric": f"eval (triple,direction)/s — {model} YAGO3-10 scale "
                      "(E=123182, d=500, device filter, steady state)",
            "value": round(n / dt, 1), "unit": "evals/s"}))


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

    triples_per_sec = n_steps * B / dt

    # Self-describing floor fraction (VERDICT r1 item 6): the step's two
    # irreducible random-access passes at reference semantics are the
    # B*(n+2)-row forward gather and the same-size backward scatter-add
    # (BENCH_NOTES.md primitive floors; the sorted-segment_sum alternative
    # measured slower). Measure BOTH live on this chip at the exact step
    # shape and report measured-step-floor / measured-step-time.
    N_rows = B * (n + 2)
    de = trainer.params["entity_embedding"].shape[1]
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, spec.nentity, N_rows), jnp.int32)
    cot = jnp.asarray(
        np.random.default_rng(2).normal(size=(N_rows, de)).astype(np.float32))
    gather_fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    scatter_fn = jax.jit(
        lambda g, i: jnp.zeros((spec.nentity, de), jnp.float32).at[i].add(g))

    def time_op(fn, *args, reps=10):
        out = fn(*args)
        float(probe(out))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(probe(out))
        return (time.perf_counter() - t0) / reps

    floor_s = (time_op(gather_fn, trainer.params["entity_embedding"], ids)
               + time_op(scatter_fn, cot, ids))
    step_s = dt / n_steps
    # Reference-equivalent PyTorch step on this host's CPU (the reference
    # has no TPU path): 7 triples/s measured (BENCH_NOTES.md §headline).
    TORCH_CPU_REFERENCE_TPS = 7.0
    print(json.dumps({
        "metric": "train triples/sec/chip (RotatE d=1000 -de, n=256, B=1024, "
                  "adv, dense Adam, full 272k-triple train set); "
                  "vs_baseline = speedup over the reference-equivalent torch "
                  "step on this host's CPU; fraction_of_primitive_floor = "
                  "(live-measured gather+scatter floor) / step time",
        "value": round(triples_per_sec, 1),
        "unit": "triples/s",
        "vs_baseline": round(triples_per_sec / TORCH_CPU_REFERENCE_TPS, 1),
        "fraction_of_primitive_floor": round(floor_s / step_s, 3),
    }))


if __name__ == "__main__":
    if "--matrix" in sys.argv or "matrix" in sys.argv[1:]:
        matrix()
    else:
        main()
