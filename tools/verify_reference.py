"""Executable reference-verification protocol (VERDICT r2 next-round #2).

Everything in this repo's parity pyramid is anchored to two
memory-reconstructed oracles: ``tests/oracle_torch.py`` (the reference's
``codes/model.py`` math re-written in torch) and ``best_config.sh`` (the
published hyperparameter table per SURVEY.md §6 / BASELINE.md — with
self-acknowledged unknowns for ComplEx/DistMult gamma and ``-r``). On this
machine ``/root/reference`` is an EMPTY mount and egress is zero, so those
reconstructions cannot be checked here. This tool is the one-command
discharge of that residual risk: the moment a populated reference tree (or
network) appears, it

  A. drives the REAL ``codes/model.py`` — ``KGEModel.forward`` per
     mode/model and ``KGEModel.train_step`` over a recorded batch stream on
     the golden fixture graph — and asserts per-step losses + final params
     allclose against ``tests/oracle_torch.py`` + ``torch.optim.Adam``
     (the exact oracle every trajectory-parity test in this repo trusts);
  B. diffs every ``best_config.sh`` hyperparameter tuple against the real
     file, field by field;
  C. runs the REAL ``codes/run.py §test_step`` evaluation on the golden
     fixture and compares filtered metrics against our recorded expected
     values (tests/fixtures/golden_upstream is itself reconstructed — this
     closes the loop on it);
  D. optionally (``--data DIR``) chains ``tools/fetch_data.sh
     --validate-only`` into a short real-data smoke run of our CLI.

No human in the loop: the output is a single JSON report
(``REFERENCE_VERIFICATION.json``) with a pass/fail per check, and the exit
code is 0 only if every check that could run passed. When the reference is
absent the tool exits 2 ("cannot verify here") — the pytest wrapper
(tests/test_reference_verification.py) maps that to a skip.

Defensive by design: the real API surface is known only through SURVEY.md's
reconstruction, so every probe of the reference code is wrapped; a signature
mismatch is reported as a structured FAIL with the observed exception — the
single most valuable diagnostic on first contact — instead of crashing the
whole protocol.

Usage:
    python tools/verify_reference.py [--reference DIR] [--data DIR]
    tools/verify_reference.sh        # wrapper: tries a network fetch of the
                                     # upstream source when the mount is empty

Reference: the entire ``codes/`` tree (codes/model.py §KGEModel,
codes/run.py §main/§test_step, best_config.sh).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import math
import os
import re
import subprocess
import sys
import tempfile
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FIXTURE = os.path.join(REPO, "tests", "fixtures", "golden_upstream")

# Small-but-not-tiny check shape: wide enough rows that an elementwise or
# reduction-order slip shows, small enough to run in seconds on CPU.
DIM, GAMMA, LR, STEPS = 24, 6.0, 1e-3, 12
NEG = 8
BATCH = 16

MODELS = (
    # (name, double_entity, double_relation)
    ("TransE", False, False),
    ("DistMult", False, False),
    ("ComplEx", True, True),
    ("RotatE", True, False),
    ("pRotatE", False, False),
)


def find_reference(path: str) -> str | None:
    """A usable reference tree has codes/model.py; else None."""
    model_py = os.path.join(path, "codes", "model.py")
    return path if os.path.isfile(model_py) else None


def load_reference_module(ref: str, name: str):
    """Import codes/<name>.py from the reference tree under an isolated
    module name (the reference is not a package)."""
    path = os.path.join(ref, "codes", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"_ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    # codes/model.py does `from dataloader import TestDataset` — make the
    # codes/ dir importable for the duration.
    sys.path.insert(0, os.path.join(ref, "codes"))
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    return mod


def fixture_graph():
    """Golden-fixture graph via OUR readers (data/vocab.py — upstream TSV
    layout)."""
    from knowledgegraphembedding_tpu.data.vocab import load_dataset

    return load_dataset(FIXTURE)


def recorded_stream(ds, steps: int, batch: int, neg: int, seed: int = 0):
    """Recorded (pos, neg, weight, mode) batches from OUR sampler — the
    same stream both the real reference loop and the oracle loop consume."""
    from knowledgegraphembedding_tpu.data.filterset import FilterSets
    from knowledgegraphembedding_tpu.sampler import build_train_iterator

    filters = FilterSets.build(
        ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    it = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, batch, neg, filters,
        seed=seed, prefetch_depth=0, backend="numpy")
    return [next(it) for _ in range(steps)], filters


class _ReplayIterator:
    """Wraps recorded numpy batches as the (tensor, tensor, tensor, str)
    stream codes/run.py's BidirectionalOneShotIterator yields to
    train_step (reference: codes/dataloader.py §BidirectionalOneShotIterator
    ≈L165-190)."""

    def __init__(self, batches):
        import torch

        self._batches = [
            (torch.from_numpy(np.asarray(pos, np.int64)),
             torch.from_numpy(np.asarray(neg, np.int64)),
             torch.from_numpy(np.asarray(w, np.float32)),
             mode)
            for pos, neg, w, mode in batches
        ]
        self._i = 0

    def __next__(self):
        b = self._batches[self._i % len(self._batches)]
        self._i += 1
        return b


def _ref_args(ds, **over):
    """An argparse-shaped namespace covering every field codes/model.py and
    codes/run.py touch inside train_step/test_step (SURVEY §2.2)."""
    ns = argparse.Namespace(
        cuda=False,
        negative_adversarial_sampling=True,
        adversarial_temperature=1.0,
        uni_weight=False,
        regularization=0.0,
        nentity=ds.nentity,
        nrelation=ds.nrelation,
        test_batch_size=4,
        test_log_steps=1000,
        cpu_num=2,
        countries=False,
        batch_size=BATCH,
        negative_sample_size=NEG,
        hidden_dim=DIM,
        gamma=GAMMA,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def check_forward_parity(ref: str, report: dict):
    """A: KGEModel.forward vs tests/oracle_torch.forward — every model,
    every mode, same embeddings."""
    import torch

    import oracle_torch as oracle

    model_mod = load_reference_module(ref, "model")
    ds = fixture_graph()
    rng = np.random.default_rng(0)
    results = {}
    for name, de, dr in MODELS:
        try:
            kge = model_mod.KGEModel(
                model_name=name, nentity=ds.nentity, nrelation=ds.nrelation,
                hidden_dim=DIM, gamma=GAMMA,
                double_entity_embedding=de, double_relation_embedding=dr)
            erange = float(kge.embedding_range.item())
            ent = torch.from_numpy(rng.uniform(
                -erange, erange,
                kge.entity_embedding.shape).astype(np.float32))
            rel = torch.from_numpy(rng.uniform(
                -erange, erange,
                kge.relation_embedding.shape).astype(np.float32))
            with torch.no_grad():
                kge.entity_embedding.copy_(ent)
                kge.relation_embedding.copy_(rel)
            modulus = (float(kge.modulus.item())
                       if hasattr(kge, "modulus") else None)
            # the fixture's train split may hold fewer than BATCH triples;
            # neg must match pos's row count (caught by the stub-tree dry
            # run in tests/test_reference_verification.py)
            pos = torch.from_numpy(
                np.asarray(ds.train[:BATCH], np.int64))
            neg = torch.from_numpy(rng.integers(
                0, ds.nentity, (pos.shape[0], NEG)).astype(np.int64))
            errs = {}
            with torch.no_grad():
                for mode, sample in (
                        ("single", pos),
                        ("head-batch", (pos, neg)),
                        ("tail-batch", (pos, neg))):
                    got = kge(sample, mode=mode)
                    want = oracle.forward(
                        ent, rel, pos, None if mode == "single" else neg,
                        mode, name, GAMMA, erange, modulus)
                    errs[mode] = float(
                        (got - want.reshape(got.shape)).abs().max())
            # the reference stores embedding_range as an f32 nn.Parameter
            # (codes/model.py ≈L37-40), so .item() returns the f32-rounded
            # value — compare against the same f32 cast, not raw f64 (a
            # 1e-9 f64 band here failed EVERY model in the stub-tree dry
            # run; tests/test_reference_verification.py)
            expected_range = float(np.float32((GAMMA + 2.0) / DIM))
            results[name] = {
                "embedding_range": erange,
                "expected_range": expected_range,
                "max_abs_err": errs,
                "pass": all(v <= 1e-5 for v in errs.values())
                and abs(erange - expected_range) <= 1e-9,
            }
        except Exception:
            results[name] = {"pass": False, "error": traceback.format_exc()}
    report["forward_parity"] = {
        "pass": all(r.get("pass") for r in results.values()),
        "models": results,
    }


def check_train_step_parity(ref: str, report: dict):
    """A (cont.): the REAL KGEModel.train_step + torch.optim.Adam over a
    recorded stream vs the oracle loop — per-step losses and final params."""
    import torch

    import oracle_torch as oracle

    model_mod = load_reference_module(ref, "model")
    ds = fixture_graph()
    batches, _ = recorded_stream(ds, STEPS, BATCH, NEG)
    results = {}
    for name, de, dr in MODELS:
        try:
            reg = 1e-5 if name in ("DistMult", "ComplEx") else 0.0
            kge = model_mod.KGEModel(
                model_name=name, nentity=ds.nentity, nrelation=ds.nrelation,
                hidden_dim=DIM, gamma=GAMMA,
                double_entity_embedding=de, double_relation_embedding=dr)
            erange = float(kge.embedding_range.item())
            ent0 = kge.entity_embedding.detach().clone()
            rel0 = kge.relation_embedding.detach().clone()
            modulus = (float(kge.modulus.item())
                       if hasattr(kge, "modulus") else None)
            args = _ref_args(ds, regularization=reg)

            opt = torch.optim.Adam(
                filter(lambda p: p.requires_grad, kge.parameters()), lr=LR)
            it = _ReplayIterator(batches)
            ref_losses = [
                float(model_mod.KGEModel.train_step(kge, opt, it, args)["loss"])
                for _ in range(STEPS)
            ]

            ent = ent0.clone().requires_grad_(True)
            rel = rel0.clone().requires_grad_(True)
            extra = []
            if modulus is not None:
                mod_p = torch.tensor([[modulus]], requires_grad=True)
                extra = [mod_p]
            opt2 = torch.optim.Adam([ent, rel] + extra, lr=LR)
            orc_losses = []
            for pos, negs, w, mode in batches:
                loss, _, _ = oracle.loss_fn(
                    ent, rel, torch.from_numpy(np.asarray(pos, np.int64)),
                    torch.from_numpy(np.asarray(negs, np.int64)),
                    torch.from_numpy(np.asarray(w, np.float32)), mode, name,
                    GAMMA, erange,
                    modulus=None if modulus is None else mod_p.squeeze(),
                    adv=True, adv_temp=1.0, uni_weight=False,
                    regularization=reg)
                opt2.zero_grad()
                loss.backward()
                opt2.step()
                orc_losses.append(float(loss.detach()))

            loss_err = max(abs(a - b) for a, b in zip(ref_losses, orc_losses))
            p_err = max(
                float((kge.entity_embedding.detach() - ent.detach())
                      .abs().max()),
                float((kge.relation_embedding.detach() - rel.detach())
                      .abs().max()))
            results[name] = {
                "steps": STEPS,
                "ref_losses": ref_losses,
                "oracle_losses": orc_losses,
                "max_step_loss_abs_err": loss_err,
                "max_final_param_abs_err": p_err,
                # f32 CPU, identical op graph -> only op-order noise
                "pass": loss_err <= 1e-5 and p_err <= 1e-5,
            }
        except Exception:
            results[name] = {"pass": False, "error": traceback.format_exc()}
    report["train_step_parity"] = {
        "pass": all(r.get("pass") for r in results.values()),
        "models": results,
    }


def check_test_step_parity(ref: str, report: dict):
    """C: the REAL codes/model.py §test_step filtered metrics on the golden
    fixture vs OUR eval on identical embeddings — closes the loop on the
    fixture + our rank/filter semantics in one measurement."""
    import torch

    model_mod = load_reference_module(ref, "model")

    from knowledgegraphembedding_tpu import eval as our_eval
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.data.filterset import FilterSets

    ds = fixture_graph()
    rng = np.random.default_rng(7)
    try:
        kge = model_mod.KGEModel(
            model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
            hidden_dim=DIM, gamma=GAMMA, double_entity_embedding=True)
        erange = float(kge.embedding_range.item())
        ent = rng.uniform(-erange, erange,
                          tuple(kge.entity_embedding.shape)).astype(np.float32)
        rel = rng.uniform(-erange, erange,
                          tuple(kge.relation_embedding.shape)).astype(np.float32)
        with torch.no_grad():
            kge.entity_embedding.copy_(torch.from_numpy(ent))
            kge.relation_embedding.copy_(torch.from_numpy(rel))
        args = _ref_args(ds)
        all_true = [tuple(t) for t in ds.all_true_triples.tolist()]
        test = [tuple(t) for t in ds.test.tolist()]
        metrics = model_mod.KGEModel.test_step(kge, test, all_true, args)

        spec = ModelSpec(
            model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
            hidden_dim=DIM, gamma=GAMMA, double_entity_embedding=True)
        filters = FilterSets.build(
            ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
        ours = our_eval.test_step(
            {"entity_embedding": ent, "relation_embedding": rel}, spec,
            ds.test, filters, test_batch_size=4)
        errs = {k: abs(float(metrics[k]) - float(ours[k]))
                for k in ("MRR", "MR", "HITS@1", "HITS@3", "HITS@10")}
        report["test_step_parity"] = {
            "reference": {k: float(metrics[k]) for k in errs},
            "ours": {k: float(ours[k]) for k in errs},
            "abs_err": errs,
            "pass": all(v <= 1e-5 for v in errs.values()),
        }
    except Exception:
        report["test_step_parity"] = {
            "pass": False, "error": traceback.format_exc()}


# best_config.sh line layout (both files):
#   bash run.sh train MODEL DATASET GPU SAVE B N D G A LR STEPS TESTB [flags]
_LINE = re.compile(r"^\s*bash run\.sh\s+(\S+)\s+(\S+)\s+(\S+)\s+(.*)$")

FIELDS = ("gpu", "save", "batch", "neg", "dim", "gamma", "alpha", "lr",
          "steps", "test_batch")


def parse_best_config(path: str) -> dict:
    """{(model, dataset): {field: value, 'flags': sorted tuple}}"""
    out = {}
    for line in open(path):
        m = _LINE.match(line)
        if not m:
            continue
        mode, model, dataset, rest = m.groups()
        toks = rest.split()
        vals, flags = [], []
        for t in toks:
            if re.fullmatch(r"-?\d+(\.\d+)?([eE]-?\d+)?", t):
                vals.append(t)
            else:
                flags.append(t)
        entry = dict(zip(FIELDS, vals))
        entry["mode"] = mode
        # normalize flag VALUES (e.g. "-r 0.00001") back onto their flag
        flat = []
        i = 0
        while i < len(toks):
            t = toks[i]
            if t.startswith("-") and not re.fullmatch(r"-\d.*", t):
                if i + 1 < len(toks) and re.fullmatch(
                        r"-?\d+(\.\d+)?([eE]-?\d+)?", toks[i + 1]):
                    flat.append(f"{t}={float(toks[i+1]):g}")
                    i += 2
                    continue
                flat.append(t)
            i += 1
        entry["flags"] = tuple(sorted(flat))
        out[(model, dataset)] = entry
    return out


def check_best_config(ref: str, report: dict):
    """B: field-level diff of our best_config.sh against the real one."""
    ref_path = os.path.join(ref, "best_config.sh")
    ours_path = os.path.join(REPO, "best_config.sh")
    if not os.path.isfile(ref_path):
        report["best_config"] = {
            "pass": False, "error": f"{ref_path} not found"}
        return
    try:
        theirs, ours = parse_best_config(ref_path), parse_best_config(ours_path)
        diffs = {}
        for key in sorted(set(theirs) | set(ours), key=str):
            a, b = theirs.get(key), ours.get(key)
            if a is None or b is None:
                diffs[f"{key[0]}/{key[1]}"] = (
                    "missing in ours" if b is None else "missing in reference")
                continue
            fielddiff = {}
            for f in FIELDS + ("flags", "mode"):
                av, bv = a.get(f), b.get(f)
                try:
                    same = float(av) == float(bv)  # type: ignore[arg-type]
                except (TypeError, ValueError):
                    same = av == bv
                if not same:
                    fielddiff[f] = {"reference": av, "ours": bv}
            if fielddiff:
                diffs[f"{key[0]}/{key[1]}"] = fielddiff
        report["best_config"] = {
            "pass": not diffs,
            "lines_reference": len(theirs),
            "lines_ours": len(ours),
            "diffs": diffs,
        }
    except Exception:
        report["best_config"] = {"pass": False, "error": traceback.format_exc()}


def check_real_data_smoke(data_dir: str, report: dict):
    """D: fetch_data.sh --validate-only + a short CLI run on one real
    dataset (loss must fall)."""
    try:
        proc = subprocess.run(
            [os.path.join(REPO, "tools", "fetch_data.sh"),
             "--validate-only", data_dir],
            capture_output=True, text=True, timeout=600)
        validate_ok = proc.returncode == 0
        smoke = {"validate_only": {
            "pass": validate_ok,
            "tail": (proc.stdout + proc.stderr)[-2000:],
        }}
        ds_name = next(
            (n for n in ("FB15k-237", "wn18rr", "FB15k", "wn18", "YAGO3-10")
             if os.path.isdir(os.path.join(data_dir, n))), None)
        if validate_ok and ds_name:
            from knowledgegraphembedding_tpu import cli

            with tempfile.TemporaryDirectory() as save:
                cli.main([
                    "--do_train", "--data_path",
                    os.path.join(data_dir, ds_name), "--model", "RotatE",
                    "-de", "-n", "64", "-b", "256", "-d", "64", "-g", "9.0",
                    "-adv", "-lr", "0.0005", "--max_steps", "200",
                    "--log_steps", "100", "--seed", "0", "-save", save,
                ])
                log = open(os.path.join(save, "train.log")).read()
                losses = [float(x) for x in re.findall(
                    r"Training average loss at step \d+: ([0-9.]+)", log)]
            smoke["cli_run"] = {
                "dataset": ds_name,
                "window_losses": losses,
                "pass": len(losses) >= 2 and losses[-1] < losses[0],
            }
        report["real_data_smoke"] = {
            "pass": all(v.get("pass") for v in smoke.values()),
            **smoke,
        }
    except Exception:
        report["real_data_smoke"] = {
            "pass": False, "error": traceback.format_exc()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--reference", default="/root/reference",
                    help="reference checkout (needs codes/model.py)")
    ap.add_argument("--data", default=None,
                    help="populated data/ tree for the real-data smoke leg")
    ap.add_argument("--out", default=os.path.join(
        REPO, "REFERENCE_VERIFICATION.json"))
    args = ap.parse_args(argv)

    ref = find_reference(args.reference)
    report: dict = {"reference": args.reference, "found": ref is not None}
    if ref is None and args.data is None:
        print(json.dumps({
            **report,
            "status": "SKIPPED",
            "why": "no codes/model.py under --reference and no --data; "
                   "nothing verifiable in this environment",
        }))
        return 2

    if ref is not None:
        check_forward_parity(ref, report)
        check_train_step_parity(ref, report)
        check_test_step_parity(ref, report)
        check_best_config(ref, report)
    if args.data is not None:
        check_real_data_smoke(args.data, report)

    checks = {k: v for k, v in report.items()
              if isinstance(v, dict) and "pass" in v}
    report["status"] = ("PASS" if all(v["pass"] for v in checks.values())
                        else "FAIL")
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "status": report["status"],
        "checks": {k: v["pass"] for k, v in checks.items()},
        "report": args.out,
    }))
    return 0 if report["status"] == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
