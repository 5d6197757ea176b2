"""The executable reference-verification protocol (VERDICT r2 #2).

Two tiers:

* Always-on tests of the PROTOCOL ITSELF — the best_config parser, the
  replay-iterator stream shape, the skip semantics — so the tool cannot
  bit-rot while it waits for a populated reference mount.
* The actual verification (`test_reference_verification_runs`), skipped
  whenever `/root/reference/codes/model.py` is absent (this machine: the
  mount is empty and egress is zero). The moment a populated mount
  appears, plain `pytest tests/` runs the REAL codes/model.py against
  tests/oracle_torch.py with no human in the loop.

Reference: entire ``codes/`` tree; best_config.sh.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import verify_reference as vr  # noqa: E402

REFERENCE = os.environ.get("REFERENCE_DIR", "/root/reference")
HAVE_REFERENCE = os.path.isfile(os.path.join(REFERENCE, "codes", "model.py"))


def test_parser_roundtrips_our_best_config():
    """The field-level parser must read every line of OUR best_config.sh —
    the same code path that will diff the real file on first contact."""
    parsed = vr.parse_best_config(os.path.join(REPO, "best_config.sh"))
    assert len(parsed) == 24  # 8 RotatE + 4 each TransE/DistMult/ComplEx/pRotatE
    rotate_fb237 = parsed[("RotatE", "FB15k-237")]
    assert rotate_fb237["batch"] == "1024"
    assert rotate_fb237["neg"] == "256"
    assert rotate_fb237["dim"] == "1000"
    assert float(rotate_fb237["gamma"]) == 9.0
    assert float(rotate_fb237["lr"]) == 5e-5
    assert rotate_fb237["steps"] == "100000"
    assert rotate_fb237["flags"] == ("-de",)
    complex_wn18rr = parsed[("ComplEx", "wn18rr")]
    assert complex_wn18rr["flags"] == ("-de", "-dr", "-r=5e-06")
    s3 = parsed[("RotatE", "countries_S3")]
    assert "--countries" in s3["flags"]


def test_parser_detects_a_value_diff(tmp_path):
    """A single changed hyperparameter must surface as a field-level diff —
    the failure mode the protocol exists to catch."""
    ours = os.path.join(REPO, "best_config.sh")
    text = open(ours).read().replace(
        "1024 256 1000  9.0 1.0 0.00005 100000",
        "1024 256 1000 12.0 1.0 0.00005 100000")
    fake_ref = tmp_path / "best_config.sh"
    fake_ref.write_text(text)
    a, b = vr.parse_best_config(str(fake_ref)), vr.parse_best_config(ours)
    key = ("RotatE", "FB15k-237")
    assert float(a[key]["gamma"]) == 12.0
    assert float(b[key]["gamma"]) == 9.0
    # and the full check_best_config wrapper reports it
    report = {}
    vr.check_best_config(str(tmp_path.parent / "nonexistent"), report)
    assert report["best_config"]["pass"] is False  # missing file -> hard fail


def test_replay_iterator_matches_reference_stream_shape():
    """The stream handed to the REAL train_step must be exactly what
    BidirectionalOneShotIterator yields: int64 pos [B,3], int64 neg [B,n],
    float32 weight [B], mode str (codes/dataloader.py ≈L165-190)."""
    import torch

    ds = vr.fixture_graph()
    batches, _ = vr.recorded_stream(ds, steps=4, batch=8, neg=4)
    it = vr._ReplayIterator(batches)
    modes = []
    for _ in range(4):
        pos, neg, w, mode = next(it)
        assert pos.dtype == torch.int64 and pos.shape == (8, 3)
        assert neg.dtype == torch.int64 and neg.shape == (8, 4)
        assert w.dtype == torch.float32 and w.shape == (8,)
        modes.append(mode)
    assert set(modes) == {"head-batch", "tail-batch"}  # alternating stream


def test_skip_exit_code_when_nothing_verifiable(tmp_path):
    """Empty mount + no --data => exit 2 and a SKIPPED JSON line: the
    contract the wrapper and this pytest module both key off."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_reference.py"),
         "--reference", str(tmp_path),
         "--out", str(tmp_path / "report.json")],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 2, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "SKIPPED"


def test_fields_cover_reference_cli_positionals():
    """run.sh's 13 positional args (MODE MODEL DATASET GPU SAVE B N D G A
    LR STEPS TESTB) must all be captured: 3 parsed as the key/mode + the
    10 FIELDS (reference: run.sh)."""
    assert len(vr.FIELDS) == 10
    assert set(vr.FIELDS) == {
        "gpu", "save", "batch", "neg", "dim", "gamma", "alpha", "lr",
        "steps", "test_batch"}


# ---------------------------------------------------------------------------
# CI guard (VERDICT r3 #7): the oracle-DRIVING surface must stay importable
# and runnable against the CURRENT package as the code moves — so first
# contact with the real reference can only fail on THEIR side. A stub
# reference tree implementing the upstream API (KGEModel.forward /
# train_step / test_step, argsort eval with replaced-candidate filter bias)
# is generated in tmp_path from tests/oracle_torch.py and every check
# function is dry-run against it end to end.

_STUB_MODEL_PY = '''
"""Stub reference codes/model.py implementing the upstream API surface
(generated by tests/test_reference_verification.py; math delegated to
tests/oracle_torch.py so the checks must pass by construction)."""
import sys
sys.path.insert(0, {tests_dir!r})

import numpy as np
import torch
import torch.nn as nn

import oracle_torch as _oracle


class KGEModel(nn.Module):
    def __init__(self, model_name, nentity, nrelation, hidden_dim, gamma,
                 double_entity_embedding=False,
                 double_relation_embedding=False):
        super().__init__()
        self.model_name = model_name
        self.nentity = nentity
        self.nrelation = nrelation
        self.epsilon = 2.0
        self.gamma = nn.Parameter(torch.Tensor([gamma]), requires_grad=False)
        self.embedding_range = nn.Parameter(
            torch.Tensor([(gamma + self.epsilon) / hidden_dim]),
            requires_grad=False)
        ent_dim = hidden_dim * 2 if double_entity_embedding else hidden_dim
        rel_dim = hidden_dim * 2 if double_relation_embedding else hidden_dim
        self.entity_embedding = nn.Parameter(torch.zeros(nentity, ent_dim))
        nn.init.uniform_(self.entity_embedding,
                         a=-self.embedding_range.item(),
                         b=self.embedding_range.item())
        self.relation_embedding = nn.Parameter(torch.zeros(nrelation, rel_dim))
        nn.init.uniform_(self.relation_embedding,
                         a=-self.embedding_range.item(),
                         b=self.embedding_range.item())
        if model_name == "pRotatE":
            self.modulus = nn.Parameter(
                torch.Tensor([[0.5 * self.embedding_range.item()]]))

    def _modulus(self):
        return self.modulus.squeeze() if hasattr(self, "modulus") else None

    def forward(self, sample, mode="single"):
        pos, neg = (sample, None) if mode == "single" else sample
        return _oracle.forward(
            self.entity_embedding, self.relation_embedding, pos, neg, mode,
            self.model_name, float(self.gamma.item()),
            float(self.embedding_range.item()), self._modulus())

    @staticmethod
    def train_step(model, optimizer, train_iterator, args):
        model.train()
        optimizer.zero_grad()
        pos, neg, w, mode = next(train_iterator)
        loss, ploss, nloss = _oracle.loss_fn(
            model.entity_embedding, model.relation_embedding, pos, neg, w,
            mode, model.model_name, float(model.gamma.item()),
            float(model.embedding_range.item()), modulus=model._modulus(),
            adv=args.negative_adversarial_sampling,
            adv_temp=args.adversarial_temperature,
            uni_weight=args.uni_weight,
            regularization=args.regularization)
        loss.backward()
        optimizer.step()
        return {{"positive_sample_loss": float(ploss.detach()),
                 "negative_sample_loss": float(nloss.detach()),
                 "loss": float(loss.detach())}}

    @staticmethod
    def test_step(model, test_triples, all_true_triples, args):
        model.eval()
        true = set(map(tuple, all_true_triples))
        E = args.nentity
        gamma = float(model.gamma.item())
        erange = float(model.embedding_range.item())
        modulus = model._modulus()
        logs = []
        with torch.no_grad():
            for mode in ("head-batch", "tail-batch"):
                for h, r, t in test_triples:
                    pos = torch.tensor([[h, r, t]], dtype=torch.long)
                    true_ent = h if mode == "head-batch" else t
                    # upstream TestDataset trick: filtered candidates are
                    # REPLACED by the true entity and biased -1, so their
                    # score is exactly true_score-1 and can never outrank
                    cand = list(range(E))
                    bias = torch.zeros(E)
                    for e in range(E):
                        corrupt = (e, r, t) if mode == "head-batch" else (h, r, e)
                        if corrupt in true and e != true_ent:
                            cand[e] = true_ent
                            bias[e] = -1.0
                    neg = torch.tensor([cand], dtype=torch.long)
                    score = _oracle.forward(
                        model.entity_embedding, model.relation_embedding,
                        pos, neg, mode, model.model_name, gamma, erange,
                        modulus)[0] + bias
                    argsort = torch.argsort(score, descending=True)
                    ranking = (argsort == true_ent).nonzero()
                    assert ranking.size(0) == 1
                    rank = 1 + int(ranking.item())
                    logs.append({{"MRR": 1.0 / rank, "MR": float(rank),
                                  "HITS@1": float(rank <= 1),
                                  "HITS@3": float(rank <= 3),
                                  "HITS@10": float(rank <= 10)}})
        return {{k: sum(l[k] for l in logs) / len(logs) for k in logs[0]}}
'''


@pytest.fixture
def stub_reference(tmp_path):
    codes = tmp_path / "codes"
    codes.mkdir()
    (codes / "model.py").write_text(_STUB_MODEL_PY.format(
        tests_dir=os.path.join(REPO, "tests")))
    (tmp_path / "best_config.sh").write_text(
        open(os.path.join(REPO, "best_config.sh")).read())
    return str(tmp_path)


def test_checks_dry_run_against_stub_reference(stub_reference):
    """Every check function must RUN and PASS against a stub tree whose
    math is the oracle's own — any drift between the checks' probing
    surface and the current package (renamed symbols, changed
    eval.test_step return keys incl. MR, ModelSpec/FilterSets signature
    changes) fails HERE in CI instead of at first real contact."""
    report = {}
    vr.check_forward_parity(stub_reference, report)
    vr.check_train_step_parity(stub_reference, report)
    vr.check_test_step_parity(stub_reference, report)
    vr.check_best_config(stub_reference, report)
    for check, res in report.items():
        assert res.get("pass") is True, (check, res)
    # the metric-key contract the real first contact will rely on:
    # ours must carry every reference metric incl. MR
    ours = report["test_step_parity"]["ours"]
    assert set(ours) == {"MRR", "MR", "HITS@1", "HITS@3", "HITS@10"}


def test_main_passes_against_stub_reference(stub_reference, tmp_path):
    """main() end to end on the stub tree: exit 0, status PASS, report
    written — the exact invocation first contact will use."""
    out = tmp_path / "report.json"
    rc = vr.main(["--reference", stub_reference, "--out", str(out)])
    assert rc == 0
    report = json.load(open(out))
    assert report["status"] == "PASS"
    assert {"forward_parity", "train_step_parity", "test_step_parity",
            "best_config"} <= set(report)


@pytest.mark.skipif(
    not HAVE_REFERENCE,
    reason="reference mount empty (zero-egress env): run "
           "tools/verify_reference.sh on first contact with the real source")
def test_reference_verification_runs():
    """THE verification: real codes/model.py vs our oracles. Auto-runs the
    moment the mount is populated."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_reference.py"),
         "--reference", REFERENCE],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert proc.returncode == 0, (
        f"reference verification FAILED — a memory-reconstructed oracle "
        f"disagrees with the real code; see REFERENCE_VERIFICATION.json: "
        f"{out}\n{proc.stderr[-2000:]}")
