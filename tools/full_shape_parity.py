"""Full-shape trajectory parity (VERDICT r2 next-round #1; generalized to
every numerics regime a best_config.sh line can reach, VERDICT r3 #1).

The recorded-stream torch-vs-framework harness of
tests/test_trajectory_parity.py, re-run at PUBLISHED best-config MODEL
SHAPES instead of toy dims. ``--preset`` selects the regime; each preset
pins what the toy-dim tests cannot — accumulation order over 1000-2000-wide
rows, the softmax over the real adversarial-weight width, whole-table L3
regularization gradients at width, and the eval path's padding at real E —
against the torch reference (codes/model.py §train_step ≈L267-330 semantics
via tests/oracle_torch.py + real torch.optim.Adam).

Presets (the three float regimes of best_config.sh):
  fb237-rotate    gather+elementwise RotatE (best_config FB15k-237 line)
  fb237-complex   dense-MXU HIGHEST path (auto at E<=100n) + whole-table
                  L3 reg + -de -dr (ComplEx FB15k-237 line)
  fb237-distmult  same dense regime at d=2000 single-width tables
  wn18rr-rotate   the n=1024 / alpha=0.5 wide-adversarial-softmax regime

Two legs (run each in its OWN process — the platform can't switch after
first device use):

  f32  — torch-CPU f32 vs the ACTUAL CLI on the default platform (the TPU
         tunnel when present). 40 steps, warm_up=20 so the one-shot LR
         decay + Adam reset fires mid-run; window losses + pooled filtered
         test metrics compared.
  f64  — torch double vs the jitted Trainer under jax_enable_x64 on CPU,
         B reduced to 128 (affordable at full table width): losses to
         ~1e-8, params to ~1e-9, filtered ranks of a test subset EQUAL.

Usage:
    python tools/full_shape_parity.py f32 [--preset fb237-complex]
    python tools/full_shape_parity.py f64 [--preset wn18rr-rotate]

Each leg prints one JSON line (collected into FULLSHAPE_r*.json) and
exits non-zero if any band is violated.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

#: Published best-config shapes (best_config.sh lines; SURVEY.md §6).
#: Fields: MODEL, E, R, NTRIPLES (graph), D, DE, DR (table widths),
#: GAMMA, ADV_TEMP, LR, REG (loss), B, N (batch).
PRESETS = {
    "fb237-rotate": dict(
        MODEL="RotatE", E=14541, R=237, NTRIPLES=272115, D=1000,
        DE=True, DR=False, GAMMA=9.0, ADV_TEMP=1.0, LR=5e-5, REG=0.0,
        B=1024, N=256),
    "fb237-complex": dict(
        MODEL="ComplEx", E=14541, R=237, NTRIPLES=272115, D=1000,
        DE=True, DR=True, GAMMA=200.0, ADV_TEMP=1.0, LR=1e-3, REG=1e-5,
        B=1024, N=256),
    "fb237-distmult": dict(
        MODEL="DistMult", E=14541, R=237, NTRIPLES=272115, D=2000,
        DE=False, DR=False, GAMMA=200.0, ADV_TEMP=1.0, LR=1e-3, REG=1e-5,
        B=1024, N=256),
    "wn18rr-rotate": dict(
        MODEL="RotatE", E=40943, R=11, NTRIPLES=86835, D=500,
        DE=True, DR=False, GAMMA=6.0, ADV_TEMP=0.5, LR=5e-5, REG=0.0,
        B=512, N=1024),
    # the remaining two best_config model families at their published
    # FB15k-237 shapes: TransE (single-width L1 distance) and pRotatE —
    # the only model whose TRAINABLE SCALAR (modulus, codes/model.py
    # §KGEModel.__init__ ≈L52-55) rides Adam alongside the tables, a
    # regime the toy-dim tests pin but never at width
    "fb237-transe": dict(
        MODEL="TransE", E=14541, R=237, NTRIPLES=272115, D=1000,
        DE=False, DR=False, GAMMA=9.0, ADV_TEMP=1.0, LR=5e-5, REG=0.0,
        B=1024, N=256),
    "fb237-protate": dict(
        MODEL="pRotatE", E=14541, R=237, NTRIPLES=272115, D=1000,
        DE=False, DR=False, GAMMA=9.0, ADV_TEMP=1.0, LR=5e-5, REG=0.0,
        B=1024, N=256),
}

# defaults = the original fb237-rotate shape; __main__ overwrites from
# --preset (module globals so every helper sees one consistent shape)
PRESET = "fb237-rotate"
MODEL = "RotatE"
E, R, NTRIPLES = 14541, 237, 272115
D, GAMMA, ADV_TEMP, LR, REG = 1000, 9.0, 1.0, 5e-5, 0.0
DE, DR = True, False
B, N = 1024, 256
STEPS, LOG = 40, 10            # warm_up = STEPS//2 = 20: decay fires mid-run
N_TEST = 1024                  # pooled 2048 (both directions) rank samples
SEED = 0

B64, STEPS64, LOG64 = 128, 30, 10   # f64 leg: full width, reduced batch
N_TEST64 = 96


def _apply_preset(name: str) -> None:
    globals()["PRESET"] = name
    globals().update(PRESETS[name])


def build_pipeline(batch_size: int, steps: int):
    """Graph + recorded sampler stream at full shape (identical args to what
    cli.main builds for --sampler_backend numpy --prefetch_depth 0)."""
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
    from knowledgegraphembedding_tpu.models import kge
    from knowledgegraphembedding_tpu.sampler import build_train_iterator
    import jax

    ds = make_random_kg(nentity=E, nrelation=R, ntriples=NTRIPLES,
                        n_valid=1024, n_test=N_TEST, seed=11)
    filters = FilterSets.build(
        ds.train, np.concatenate([ds.train, ds.valid, ds.test]),
        ds.nentity, ds.nrelation)
    spec = ModelSpec(
        model_name=MODEL, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=D, gamma=GAMMA, double_entity_embedding=DE,
        double_relation_embedding=DR)
    it = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, batch_size, N, filters,
        seed=SEED, prefetch_depth=0, backend="numpy")
    batches = [next(it) for _ in range(steps)]
    p0 = kge.init_params(spec, jax.random.PRNGKey(SEED))
    return ds, filters, spec, batches, p0


def _atomic_torch_save(obj, path):
    import torch

    tmp = path + ".tmp"
    torch.save(obj, tmp)
    os.replace(tmp, path)


def run_torch(p0, batches, spec, *, dtype, steps, warm_up, log,
              ckpt_path=None, save_every=2):
    """The reference loop: Adam(lr); after step >= warm_up -> lr/10 + FRESH
    Adam + warm_up*=3 (codes/run.py §main ≈L280-340).

    With ckpt_path, progress (params + Adam state_dict + lr/warm/windows) is
    torch.saved atomically every ``save_every`` steps and resumed on restart
    — the f32 leg costs hours of single-core torch, and losing it to a
    session/round boundary would forfeit the whole cache."""
    import torch
    import oracle_torch as oracle

    has_mod = "modulus" in p0          # pRotatE's trainable scalar
    start, mod = 0, None
    if ckpt_path and os.path.exists(ckpt_path):
        st = torch.load(ckpt_path, weights_only=False)
        ent = st["ent"].requires_grad_(True)
        rel = st["rel"].requires_grad_(True)
        leaves = [ent, rel]
        if has_mod:
            if "mod" not in st:
                raise RuntimeError(
                    f"stale checkpoint format: {ckpt_path} lacks the "
                    f"pRotatE modulus leaf ('mod'); it predates the "
                    f"trainable-modulus plumbing — delete it to restart "
                    f"from p0")
            mod = st["mod"].requires_grad_(True)
            leaves.append(mod)
        lr, warm = st["lr"], st["warm"]
        opt = torch.optim.Adam(leaves, lr=lr)
        opt.load_state_dict(st["opt"])
        windows, acc, start = st["windows"], st["acc"], st["step"]
        print(f"[f32] torch leg resumed at step {start}/{steps}",
              file=sys.stderr, flush=True)
    else:
        ent = torch.tensor(np.array(p0["entity_embedding"]), dtype=dtype,
                           requires_grad=True)
        rel = torch.tensor(np.array(p0["relation_embedding"]), dtype=dtype,
                           requires_grad=True)
        leaves = [ent, rel]
        if has_mod:
            mod = torch.tensor(np.array(p0["modulus"]), dtype=dtype,
                               requires_grad=True)
            leaves.append(mod)
        lr, warm = LR, warm_up
        opt = torch.optim.Adam(leaves, lr=lr)
        windows, acc = [], 0.0
    for step in range(start, steps):
        pos, neg, w, mode = batches[step]
        loss, ploss, nloss = oracle.loss_fn(
            ent, rel, torch.from_numpy(np.asarray(pos, np.int64)),
            torch.from_numpy(np.asarray(neg, np.int64)),
            torch.from_numpy(np.asarray(w)).to(dtype), mode, MODEL,
            GAMMA, spec.embedding_range, modulus=mod, adv=True,
            adv_temp=ADV_TEMP, uni_weight=False, regularization=REG)
        if REG and dtype == torch.float32:
            # torch-CPU f32 norm(3)**3 over 29M elements under-sums by
            # 4.4% (measured: 57,283 vs f64 59,920; limited-width f32
            # accumulators) while the framework's XLA tree reduction
            # matches f64 to 1e-7 — a LOGGING-VALUE artifact only: the
            # reg GRADIENT's S-dependent factor (S^(1/3))^2 * S^(-2/3)
            # cancels algebraically, so trajectories are unaffected
            # (ranks matched exactly while windows sat 0.0263 apart =
            # lambda * the measured sum error). Windows are therefore
            # compared with the reg VALUE recomputed at f64 — on the
            # PRE-step params (the loss's own reg input; computing it
            # post-step left a one-step-stale offset that decayed with
            # the LR, ~0.009 at lr=1e-3).
            with torch.no_grad():
                reg64 = REG * (float(ent.double().norm(p=3) ** 3)
                               + float(rel.double().norm(p=3) ** 3))
            acc += float(((ploss + nloss) / 2).detach()) + reg64
        else:
            acc += float(loss.detach())
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (step + 1) % log == 0:
            windows.append(acc / log)
            acc = 0.0
        if step >= warm:
            lr = lr / 10.0
            opt = torch.optim.Adam(leaves, lr=lr)
            warm *= 3
        if ckpt_path and ((step + 1) % save_every == 0 or step == steps - 1):
            _atomic_torch_save(
                {"ent": ent.detach().clone(), "rel": rel.detach().clone(),
                 **({"mod": mod.detach().clone()} if has_mod else {}),
                 "opt": opt.state_dict(), "lr": lr, "warm": warm,
                 "windows": windows, "acc": acc, "step": step + 1}, ckpt_path)
            print(f"[f32] torch step {step + 1}/{steps} checkpointed",
                  file=sys.stderr, flush=True)
    return ent.detach(), rel.detach(), windows, \
        (mod.detach() if has_mod else None)


def torch_filtered_ranks(ent, rel, test, filters, spec, batch=32,
                         ckpt_path=None, save_every=8, e_chunk=1024,
                         modulus=None):
    """Reference test_step ranks straight from the oracle's scores.

    With ckpt_path the (mode, batch) units completed so far are persisted
    so an interrupted full-shape eval resumes instead of restarting.

    The candidate axis is walked in ``e_chunk``-wide slices: a whole-E
    RotatE forward at d=1000 ``-de`` materializes ~2 GB temporaries per op,
    and glibc serves every >32 MB malloc with a fresh mmap — the measured
    unchunked profile was 5:1 system:user time (57 M minor faults, page
    zeroing dominating). Per-column scores are bit-identical under
    chunking (gather + elementwise + a within-row d-reduction), so ranks
    are unchanged; the true score is the chunk-of-1 column, the same math
    the full row would produce."""
    import torch
    import oracle_torch as oracle

    units = [(mode, i) for mode in ("head-batch", "tail-batch")
             for i in range(0, len(test), batch)]
    ranks, done = [], 0
    if ckpt_path and os.path.exists(ckpt_path):
        st = torch.load(ckpt_path, weights_only=False)
        ranks, done = st["ranks"], st["done"]
        print(f"[f32] torch eval resumed at unit {done}/{len(units)}",
              file=sys.stderr, flush=True)
    with torch.no_grad():
        for u in range(done, len(units)):
            mode, i = units[u]
            posn = np.asarray(test[i:i + batch], np.int64)
            pos = torch.from_numpy(posn)
            true = pos[:, 0] if mode == "head-batch" else pos[:, 2]
            true_score = oracle.forward(
                ent, rel, pos, true[:, None], mode, MODEL, GAMMA,
                spec.embedding_range, modulus=modulus)
            mask = torch.from_numpy(
                filters.filter_mask_rows(posn.astype(np.int32), mode)[:, :E])
            beats = torch.zeros(len(pos), dtype=torch.int64)
            for c0 in range(0, E, e_chunk):
                idx = torch.arange(c0, min(c0 + e_chunk, E))
                neg = idx.unsqueeze(0).expand(len(pos), len(idx))
                sc = oracle.forward(ent, rel, pos, neg, mode, MODEL,
                                    GAMMA, spec.embedding_range,
                                    modulus=modulus)
                beats += ((sc > true_score) & ~mask[:, c0:c0 + len(idx)]
                          & (idx[None, :] != true[:, None])).sum(1)
            ranks.extend((beats + 1).tolist())
            if ckpt_path and ((u + 1) % save_every == 0 or u == len(units) - 1):
                _atomic_torch_save({"ranks": ranks, "done": u + 1}, ckpt_path)
    return np.asarray(ranks, np.float64)


#: f32-leg comparison keys. MR included (it is a published reference
#: metric, SURVEY §6) with its own rank-granularity floor: at 2048 pooled
#: ranks a single borderline candidate flip moves MR by E/2048 ≈ 7 at
#: fb237 scale, so the absolute floor is per-key, not the MRR 0.005.
F32_METRIC_KEYS = ("MRR", "MR", "HITS@1", "HITS@3", "HITS@10")
F32_METRIC_FLOORS = {"MRR": 0.005, "MR": 10.0, "HITS@1": 0.005,
                     "HITS@3": 0.005, "HITS@10": 0.005}


def metrics_of(ranks):
    return {
        "MRR": float(np.mean(1.0 / ranks)),
        "MR": float(np.mean(ranks)),
        "HITS@1": float(np.mean(ranks <= 1)),
        "HITS@3": float(np.mean(ranks <= 3)),
        "HITS@10": float(np.mean(ranks <= 10)),
    }


def leg_f32() -> dict:
    """torch-CPU f32 vs the ACTUAL CLI (default platform = the chip when
    tunneled) at full shape, identical recorded stream.

    The torch side costs hours on a 1-core host, so its outputs (windows +
    pooled metrics) are cached on disk keyed by the shape constants; a
    tunnel flap during the CLI side then only re-pays the CLI minutes."""
    import torch
    import tempfile

    from knowledgegraphembedding_tpu import cli
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    t0 = time.time()
    ds, filters, spec, batches, p0 = build_pipeline(B, STEPS)
    t_build = time.time() - t0
    print(f"[f32] pipeline built in {t_build:.0f}s", file=sys.stderr, flush=True)

    cache = os.path.join(
        REPO, f"tools/.fullshape_f32_{MODEL}_E{E}_B{B}_n{N}_d{D}"
              f"_s{STEPS}_seed{SEED}{'_regv3' if REG else ''}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        t_windows = z["windows"].tolist()
        t_metrics = {k: float(z[k]) for k in
                     ("MRR", "MR", "HITS@1", "HITS@3", "HITS@10")}
        t_torch, t_torch_eval = float(z["t_train"]), float(z["t_eval"])
        print(f"[f32] torch leg loaded from cache {cache}", file=sys.stderr,
              flush=True)
    else:
        t0 = time.time()
        ent, rel, t_windows, mod = run_torch(
            p0, batches, spec, dtype=torch.float32, steps=STEPS,
            warm_up=STEPS // 2, log=LOG, ckpt_path=cache + ".train.ckpt")
        t_torch = time.time() - t0
        print(f"[f32] torch train done in {t_torch:.0f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
        t_metrics = metrics_of(
            torch_filtered_ranks(ent, rel, ds.test, filters, spec,
                                 ckpt_path=cache + ".eval.ckpt",
                                 modulus=mod))
        t_torch_eval = time.time() - t0
        print(f"[f32] torch eval done in {t_torch_eval:.0f}s", file=sys.stderr,
              flush=True)
        np.savez(cache, windows=np.asarray(t_windows), t_train=t_torch,
                 t_eval=t_torch_eval, **t_metrics)
        for suffix in (".train.ckpt", ".eval.ckpt"):
            if os.path.exists(cache + suffix):
                os.remove(cache + suffix)

    # --- torch-vs-torch f32 op-order noise yardstick (same protocol as
    # leg_f64): the identical trajectory with permuted embedding columns.
    # At f32 the dense+L3+lr=1e-3 regime REALLY diverges from reduction
    # noise alone (Adam's eps-regime rows amplify ~lr/eps), so fixed
    # window bands cannot be regime-independent — measure the floor.
    cache_perm = cache[:-4] + "_perm.npz"
    if os.path.exists(cache_perm):
        zp = np.load(cache_perm)
        noise_window = float(zp["noise_window"])
        # pre-r5 perm caches lack nm_MR; compare only the keys the cache
        # carries rather than forfeit the (hours-costly) cache
        noise_metrics = {k: float(zp[f"nm_{k}"]) for k in F32_METRIC_KEYS
                         if f"nm_{k}" in zp}
        print(f"[f32] perm noise leg loaded from cache {cache_perm}",
              file=sys.stderr, flush=True)
    else:
        pi = np.random.default_rng(123).permutation(D)
        p0_perm = {
            "entity_embedding": _perm_cols(p0["entity_embedding"], pi, DE),
            "relation_embedding": _perm_cols(p0["relation_embedding"], pi, DR),
            # the modulus scalar is permutation-invariant: pass it through
            **({"modulus": p0["modulus"]} if "modulus" in p0 else {}),
        }
        ent_p, rel_p, perm_windows, mod_p = run_torch(
            p0_perm, batches, spec, dtype=torch.float32, steps=STEPS,
            warm_up=STEPS // 2, log=LOG, ckpt_path=cache_perm + ".train.ckpt")
        ent_n = torch.from_numpy(
            _perm_cols(ent_p.numpy(), pi, DE, inverse=True))
        rel_n = torch.from_numpy(
            _perm_cols(rel_p.numpy(), pi, DR, inverse=True))
        perm_metrics = metrics_of(
            torch_filtered_ranks(ent_n, rel_n, ds.test, filters, spec,
                                 ckpt_path=cache_perm + ".eval.ckpt",
                                 modulus=mod_p))
        noise_window = max(abs(a - b)
                           for a, b in zip(perm_windows, t_windows))
        noise_metrics = {k: abs(perm_metrics[k] - t_metrics[k])
                         for k in F32_METRIC_KEYS}
        np.savez(cache_perm, noise_window=noise_window,
                 **{f"nm_{k}": v for k, v in noise_metrics.items()})
        for suffix in (".train.ckpt", ".eval.ckpt"):
            if os.path.exists(cache_perm + suffix):
                os.remove(cache_perm + suffix)

    if "--torch-only" in sys.argv:
        # populate the cache while the tunnel is down; rerun without the
        # flag once the chip answers — the torch hours are then amortized
        print(f"[f32] --torch-only: caches ready at {cache}", file=sys.stderr)
        return {"leg": "f32_torch_only", "cache": cache, "pass": True}

    tmp = tempfile.mkdtemp(prefix="fullshape_")
    data_dir, save_dir = os.path.join(tmp, "data"), os.path.join(tmp, "save")
    save_dataset(ds, data_dir)
    t0 = time.time()
    argv = [
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        MODEL, "-n", str(N), "-b", str(B), "-d", str(D),
        "-g", str(GAMMA), "-adv", "-a", str(ADV_TEMP), "-lr", str(LR),
        "--max_steps", str(STEPS), "--log_steps", str(LOG),
        "--test_batch_size", "16", "--sampler_backend", "numpy",
        "--prefetch_depth", "0", "--seed", str(SEED), "-save", save_dir,
    ]
    if DE:
        argv.append("-de")
    if DR:
        argv.append("-dr")
    if REG:
        argv += ["-r", repr(REG)]
    final = cli.main(argv)
    t_cli = time.time() - t0
    j_metrics = final["test"]
    log_text = open(os.path.join(save_dir, "train.log")).read()
    j_windows = [float(x) for x in re.findall(
        r"Training average loss at step \d+: ([0-9.]+)", log_text)]

    assert len(j_windows) == len(t_windows) == STEPS // LOG
    w_err = [abs(a - b) for a, b in zip(j_windows, t_windows)]
    m_err = {k: abs(j_metrics[k] - t_metrics[k])
             for k in F32_METRIC_KEYS if k in noise_metrics}
    import jax
    out = {
        "leg": "f32_full_shape",
        "preset": PRESET,
        "model": MODEL,
        "platform": jax.default_backend(),
        "shape": {"E": E, "R": R, "B": B, "n": N, "d": D, "de": DE,
                  "dr": DR, "gamma": GAMMA, "adv_temp": ADV_TEMP,
                  "lr": LR, "reg": REG, "steps": STEPS,
                  "warm_up": STEPS // 2},
        "torch_windows": t_windows, "framework_windows": j_windows,
        "max_window_abs_err": max(w_err),
        "torch_metrics": t_metrics,
        "framework_metrics": {k: j_metrics[k] for k in m_err},
        "metric_abs_err": m_err,
        "pooled_rank_samples": 2 * N_TEST,
        "torch_op_order_noise": {"window": noise_window,
                                 "metrics": noise_metrics},
        "wall_s": {"build": round(t_build, 1), "torch_train": round(t_torch, 1),
                   "torch_eval": round(t_torch_eval, 1), "cli": round(t_cli, 1)},
        # bands: 10x torch's OWN measured f32 op-order spread (the
        # permuted leg), floored at the absolutes the r3 RotatE leg met
        # (2e-3 windows; 2048 pooled ranks -> each flip moves MRR by
        # ~4.9e-4, so 0.005 allows ~10 borderline flips). The dense+L3+
        # lr=1e-3 regime genuinely diverges at f32 (Adam eps-regime
        # amplification), so fixed bands cannot be regime-independent.
        "pass": bool(max(w_err) <= max(10 * noise_window, 2e-3)
                     and all(v <= max(10 * noise_metrics[k],
                                      F32_METRIC_FLOORS[k])
                             for k, v in m_err.items())),
    }
    return out


def _perm_cols(arr, pi, two_halves, inverse=False):
    """Permute embedding columns by ``pi`` (length = base dim); doubled
    tables permute each (re, im) half with the SAME pi so complex pairs
    stay aligned. Every scorer's d-sum is invariant under this, so a
    permuted run is the SAME trajectory computed in a different reduction
    order — the op-order noise yardstick."""
    arr = np.asarray(arr)
    if inverse:
        inv = np.empty_like(pi)
        inv[pi] = np.arange(len(pi))
        pi = inv
    if two_halves:
        s = len(pi)
        return np.concatenate([arr[:, :s][:, pi], arr[:, s:][:, pi]], axis=1)
    return arr[:, pi]


def leg_f64() -> dict:
    """torch double vs the jitted Trainer (jax_enable_x64, CPU) at full
    table/row width, B reduced to 128.

    Pass bands are SELF-CALIBRATING: a second torch leg runs the identical
    trajectory with the embedding columns permuted (same math, different
    reduction order) and the framework must sit within a small multiple of
    torch's OWN op-order drift. This matters because the bands are
    regime-dependent: the RotatE gather path drifts ~1e-15, but the
    dense-matmul path with whole-table L3 reg at lr=1e-3 amplifies
    per-step reduction noise by ~lr/eps_adam = 1e5 on rows whose only
    gradient is the micro-scale regularizer (Adam's sqrt(v)+eps
    denominator is eps-dominated there), giving ~1e-7 param spread that
    NO bit-level band can separate from a real defect — only a measured
    noise floor can."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import torch

    from knowledgegraphembedding_tpu import eval as eval_mod
    from knowledgegraphembedding_tpu.config import TrainSpec
    from knowledgegraphembedding_tpu.train import Trainer
    import jax.numpy as jnp

    t0 = time.time()
    ds, filters, spec, batches, p0 = build_pipeline(B64, STEPS64)
    warm_up = STEPS64 // 2
    # crash-resume ckpt: the torch-f64 leg is ~1h of single-core compute.
    # p0 comes from the JAX PRNG, whose rounding CHANGES under
    # --xla_backend_optimization_level=0 (the strict-rounding mode the
    # KINK_DIVISION_MODELS legs run in) — so the cache key must carry the
    # flag, or a strict-mode framework run compares against a torch
    # trajectory trained from a different init (measured: 4.3e-4 phantom
    # "drift" from exactly this in r5).
    strict = ("--xla_backend_optimization_level=0"
              in os.environ.get("XLA_FLAGS", ""))
    ckpt = os.path.join(
        REPO, f"tools/.fullshape_f64_{MODEL}_E{E}_B{B64}_n{N}_d{D}"
              f"_s{STEPS64}_seed{SEED}{'_opt0' if strict else ''}")
    ent, rel, t_windows, mod = run_torch(
        p0, batches, spec, dtype=torch.float64, steps=STEPS64,
        warm_up=warm_up, log=LOG64, ckpt_path=ckpt + ".train.ckpt")
    sub = ds.test[:N_TEST64]
    t_ranks = torch_filtered_ranks(ent, rel, sub, filters, spec,
                                   ckpt_path=ckpt + ".eval.ckpt",
                                   modulus=mod)

    # --- torch-vs-torch op-order noise yardstick (column-permuted leg) ---
    pi = np.random.default_rng(123).permutation(D)
    p0_perm = {
        "entity_embedding": _perm_cols(p0["entity_embedding"], pi, DE),
        "relation_embedding": _perm_cols(p0["relation_embedding"], pi, DR),
        **({"modulus": p0["modulus"]} if "modulus" in p0 else {}),
    }
    ent_p, rel_p, perm_windows, mod_p = run_torch(
        p0_perm, batches, spec, dtype=torch.float64, steps=STEPS64,
        warm_up=warm_up, log=LOG64, ckpt_path=ckpt + "_perm.train.ckpt")
    ent_n = torch.from_numpy(
        _perm_cols(ent_p.numpy(), pi, DE, inverse=True))
    rel_n = torch.from_numpy(
        _perm_cols(rel_p.numpy(), pi, DR, inverse=True))
    noise_window = max(abs(a - b) for a, b in zip(perm_windows, t_windows))
    noise_param = max(
        float((ent_n - ent).abs().max()), float((rel_n - rel).abs().max()),
        *([abs(float(mod_p) - float(mod))] if mod is not None else []))
    noise_ranks = torch_filtered_ranks(ent_n, rel_n, sub, filters, spec,
                                       ckpt_path=ckpt + "_perm.eval.ckpt",
                                       modulus=mod_p)
    noise_mism = int(np.sum(noise_ranks != t_ranks))
    noise_dmrr = abs(float(np.mean(1.0 / noise_ranks))
                     - float(np.mean(1.0 / t_ranks)))
    t_torch = time.time() - t0

    t0 = time.time()
    p64 = {k: np.asarray(v, np.float64) for k, v in p0.items()}
    tspec = TrainSpec(
        negative_sample_size=N, batch_size=B64,
        negative_adversarial_sampling=True, adversarial_temperature=ADV_TEMP,
        uni_weight=False, regularization=REG)
    from knowledgegraphembedding_tpu.train import use_dense_scoring
    scoring_path = "dense" if use_dense_scoring(spec, tspec) else "gather"
    trainer = Trainer(spec, tspec, p64, lr=LR, warm_up_steps=warm_up)
    j_windows, acc = [], 0.0
    for step in range(STEPS64):
        pos, neg, w, mode = batches[step]
        logs = trainer.one_step((
            jnp.asarray(pos), jnp.asarray(neg),
            jnp.asarray(np.asarray(w, np.float64)), mode))
        acc += float(logs["loss"])
        if (step + 1) % LOG64 == 0:
            j_windows.append(acc / LOG64)
            acc = 0.0
    p_err = {k: float(np.max(np.abs(np.asarray(trainer.params[k], np.float64)
                                    - {"entity_embedding": ent,
                                       "relation_embedding": rel}[k].numpy())))
             for k in ("entity_embedding", "relation_embedding")}
    if mod is not None:
        p_err["modulus"] = abs(
            float(trainer.params["modulus"]) - float(mod))
    # framework ranks via the same host path test_step drives (eval.py
    # host branch), collected raw for an EXACT comparison
    chunk = 4096
    j_ranks = []
    for mode in ("head-batch", "tail-batch"):
        for i in range(0, len(sub), 16):
            pos = np.asarray(sub[i:i + 16], np.int32)
            mask = jnp.asarray(eval_mod._pad_mask(
                filters.filter_mask_rows(pos, mode), chunk))
            r = eval_mod.ranks_batch(
                trainer.params, jnp.asarray(pos), mask, spec=spec,
                mode=mode, chunk=chunk)
            j_ranks.extend(np.asarray(r).tolist())
    t_jax = time.time() - t0

    j_ranks = np.asarray(j_ranks, np.float64)
    w_err = [abs(a - b) for a, b in zip(j_windows, t_windows)]
    rank_mismatches = int(np.sum(j_ranks != t_ranks)) if len(j_ranks) == len(t_ranks) else -1
    dmrr = (abs(float(np.mean(1.0 / j_ranks)) - float(np.mean(1.0 / t_ranks)))
            if rank_mismatches >= 0 else float("inf"))
    import math as _math

    # bands: 10x the measured torch-vs-torch op-order spread, floored at
    # the gather-regime absolutes the r3 RotatE leg already met
    w_band = max(10 * noise_window, 1e-8)
    p_band = max(10 * noise_param, 1e-9)
    mm_band = max(2 * noise_mism, _math.ceil(0.01 * len(t_ranks)))
    dmrr_band = max(10 * noise_dmrr, 1.0 / max(len(t_ranks), 1))
    rank_pass = (rank_mismatches == 0
                 or (rank_mismatches <= mm_band and dmrr <= dmrr_band))
    out = {
        "leg": "f64_full_width",
        "preset": PRESET,
        "model": MODEL,
        "platform": jax.default_backend(),
        "scoring_path": scoring_path,
        "shape": {"E": E, "R": R, "B": B64, "n": N, "d": D, "de": DE,
                  "dr": DR, "gamma": GAMMA, "adv_temp": ADV_TEMP,
                  "lr": LR, "reg": REG, "steps": STEPS64,
                  "warm_up": warm_up},
        "torch_windows": t_windows, "framework_windows": j_windows,
        "max_window_abs_err": max(w_err),
        "max_param_abs_err": p_err,
        "rank_samples": len(t_ranks), "rank_mismatches": rank_mismatches,
        "delta_mrr": dmrr,
        "torch_op_order_noise": {
            "window": noise_window, "param": noise_param,
            "rank_mismatches": noise_mism, "delta_mrr": noise_dmrr},
        "bands": {"window": w_band, "param": p_band,
                  "rank_mismatches": mm_band, "delta_mrr": dmrr_band},
        "wall_s": {"torch": round(t_torch, 1), "framework": round(t_jax, 1)},
        "pass": bool(max(w_err) <= w_band
                     and all(v <= p_band for v in p_err.values())
                     and rank_pass),
    }
    return out


#: Models whose score has a kink reachable through a DIVISION pipeline.
#: pRotatE's |sin(ph+pr-pt)| kinks where the phase sum is exactly 0 — and
#: because init params lie on the f32 grid (kge.init_params draws f32,
#: legs upcast), exact h+r==t collisions are common enough to hit every
#: run (measured: batch 0 of the fb237-protate leg already contains one).
#: torch-CPU evaluates x/scale with one correctly-rounded IEEE division
#: per op; XLA:CPU's default backend pipeline strength-reduces the
#: constant division into reciprocal-multiply + FMA contraction, which
#: moves the phase by ~1 ulp — off the kink — so JAX takes the full
#: sign(sin)=±1 subgradient where torch takes sign(0)=0, and Adam
#: amplifies the one-element difference to ~1e-5 param drift within 10
#: steps (r5 root-cause; the TransE analogue was the r4 abs-kink, pure
#: adds, fixable in-model via scorers.abs_ref). --xla_backend_
#: optimization_level=0 restores strict per-op rounding (verified:
#: (q1 + b/s) - c/s == 0 matches numpy/torch bit-for-bit) at the cost of
#: slower CPU codegen — correctness-harness-only, never a production
#: setting. TransE (adds only) and RotatE (smooth L2 magnitude; a kink
#: needs re==im==0 simultaneously) don't need it.
KINK_DIVISION_MODELS = ("pRotatE",)

if __name__ == "__main__":
    if "--preset" in sys.argv:
        _pi = sys.argv.index("--preset")
        if _pi + 1 >= len(sys.argv):
            sys.exit(f"--preset needs a name: {sorted(PRESETS)}")
        _preset_arg = sys.argv[_pi + 1]
        # fail HERE, before the opt0 auto-enable keys off the preset's
        # model — a typo'd name silently skipping strict rounding would
        # report the phantom kink-division drift the flag exists to kill
        if _preset_arg not in PRESETS:
            sys.exit(f"unknown preset {_preset_arg!r}: {sorted(PRESETS)}")
    else:
        _preset_arg = PRESET
    if ("f64" in sys.argv[1:]
            and PRESETS.get(_preset_arg, {}).get("MODEL", MODEL)
            in KINK_DIVISION_MODELS
            and "--xla_backend_optimization_level"
            not in os.environ.get("XLA_FLAGS", "")):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_backend_optimization_level=0").strip()
        os.execv(sys.executable, [sys.executable] + sys.argv)
    if "MALLOC_MMAP_THRESHOLD_" not in os.environ:
        # full-shape torch temporaries run 0.25-2.1 GB; glibc mmaps every
        # allocation that big, and the measured profile was 5:1 sys:user
        # (page zeroing). A large threshold keeps them heap-reusable; it
        # must be set via env BEFORE glibc's first malloc parses it (and
        # mallopt() is int-capped at 2 GB-1, too small for the B=1024
        # train leg), so re-exec once with it set.
        # TRIM must exceed the largest freed block too: a 2.1 GB buffer
        # freed above a 1 GB trim threshold is returned to the OS and
        # re-faulted next step (measured: 1007 s sys vs 129 s user on the
        # B=1024 train leg with trim at 1 GB).
        os.environ["MALLOC_MMAP_THRESHOLD_"] = str(8 << 30)
        os.environ["MALLOC_TRIM_THRESHOLD_"] = str(8 << 30)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    for i, a in enumerate(sys.argv):
        if a == "--preset":
            _apply_preset(sys.argv[i + 1])
            sys.argv[i:i + 2] = []
            break
    for i, a in enumerate(sys.argv):
        if a == "--B":
            # reduced-batch variant of the f32 leg (still full d=1000 -de
            # row width, n=256 softmax, E=14,541 eval padding — only the
            # batch-dim accumulation differs from the published B=1024);
            # cache/ckpt files are keyed by B so variants coexist
            B = int(sys.argv[i + 1])
            sys.argv[i:i + 2] = []
            break
    legs = [a for a in sys.argv[1:] if not a.startswith("-")]
    known_flags = {"--cpu", "--torch-only"}
    unknown = [a for a in sys.argv[1:]
               if a.startswith("-") and a not in known_flags]
    if unknown or len(legs) > 1 or (legs and legs[0] not in ("f32", "f64")):
        # unknown flags (incl. --help) must NOT fall through to a
        # multi-hour default run
        sys.exit(f"usage: {sys.argv[0]} [f32|f64] [--cpu] [--torch-only]"
                 f" [--B n] [--preset {'|'.join(PRESETS)}]"
                 f"  (got {sys.argv[1:]})")
    leg = legs[0] if legs else "f32"
    if "--cpu" in sys.argv:
        # fallback when the TPU tunnel is unreachable: the f32 leg is still
        # full-shape parity evidence on CPU (the JSON records the platform)
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = leg_f32() if leg == "f32" else leg_f64()
    print(json.dumps(res))
    sys.exit(0 if res["pass"] else 1)
