"""Failure recovery (SURVEY.md §5.3): the reference's crash model is
'rerun with -init pointing at the last checkpoint dir'. Kill a real CLI
training process with SIGKILL mid-run, then resume from the surviving
checkpoint and finish — the resumed run must pick up the saved step and
produce final metrics + artifacts."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_sigkill_and_resume(tmp_path):
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=8, nrelation=2, seed=3)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    args = [
        sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
        "--do_train", "--data_path", data_dir, "--model", "TransE",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--platform", "cpu",
        "--log_steps", "20", "--save_checkpoint_steps", "40",
        "-save", save_dir,
    ]
    # phase 1: run "forever", SIGKILL once a checkpoint exists
    proc = subprocess.Popen(
        args + ["--max_steps", "100000"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    ckpt = os.path.join(save_dir, "checkpoint.npz")
    deadline = time.time() + 240
    try:
        while not os.path.exists(ckpt):
            assert proc.poll() is None, "trainer died before first checkpoint"
            assert time.time() < deadline, "no checkpoint within 240s"
            time.sleep(0.5)
        # no settle sleep needed: saves are atomic (temp + os.replace), so a
        # kill landing mid-save can never leave a truncated checkpoint
    finally:
        proc.kill()  # SIGKILL: no cleanup, the crash scenario
        proc.wait(timeout=30)

    z = np.load(ckpt)
    saved_step = int(z["step"])
    assert saved_step >= 40

    # phase 2: cold resume, finish a short run, verify continuation
    out = subprocess.run(
        args + ["--max_steps", str(saved_step + 20), "--do_test",
                "--test_batch_size", "4", "--eval_chunk_size", "16",
                "-init", save_dir],
        env=env, capture_output=True, text=True, timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stderr + out.stdout
    assert f"init_step = {saved_step}" in log  # resumed, not restarted
    assert "Test MRR" in log
    z2 = np.load(ckpt)
    assert int(z2["step"]) == saved_step + 20
    with open(os.path.join(save_dir, "config.json")) as f:
        assert json.load(f)["model"] == "TransE"


@pytest.mark.slow
def test_sigkill_and_resume_fused(tmp_path):
    """Same SIGKILL drill through the FUSED block loop
    (--steps_per_dispatch): checkpoints land at the same boundaries, the
    kill can strike mid-block, and the resumed fused run continues from the
    saved step."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=8, nrelation=2, seed=3)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    args = [
        sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
        "--do_train", "--data_path", data_dir, "--model", "RotatE", "-de",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--platform", "cpu",
        "--log_steps", "20", "--save_checkpoint_steps", "40",
        "--steps_per_dispatch", "8",
        "-save", save_dir,
    ]
    proc = subprocess.Popen(
        args + ["--max_steps", "100000"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    ckpt = os.path.join(save_dir, "checkpoint.npz")
    deadline = time.time() + 240
    try:
        while not os.path.exists(ckpt):
            assert proc.poll() is None, "trainer died before first checkpoint"
            assert time.time() < deadline, "no checkpoint within 240s"
            time.sleep(0.5)
    finally:
        proc.kill()
        proc.wait(timeout=30)

    saved_step = int(np.load(ckpt)["step"])
    assert saved_step % 40 == 0 and saved_step >= 40  # boundary-aligned

    out = subprocess.run(
        args + ["--max_steps", str(saved_step + 24), "--do_test",
                "--test_batch_size", "4", "--eval_chunk_size", "16",
                "-init", save_dir],
        env=env, capture_output=True, text=True, timeout=400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    log = out.stderr + out.stdout
    assert f"init_step = {saved_step}" in log
    assert "fused training: 8 steps per dispatch" in log
    assert "Test MRR" in log
    assert int(np.load(ckpt)["step"]) == saved_step + 24
