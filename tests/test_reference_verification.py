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
