"""run.sh positional wrapper (reference run.sh ≈L1-40): the 13-arg train
order, the models/<MODEL>_<DATASET>_<ID> save-dir convention, the ignored
GPU_ID, extra-flag passthrough, and the valid/test resume modes — driven
end to end as real subprocesses."""

import os
import re
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_sh_train_then_test(tmp_path):
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    # run.sh resolves data/$DATASET and models/... relative to its cwd
    save_dataset(ds, str(tmp_path / "data" / "toy"))
    os.symlink(os.path.join(REPO_ROOT, "run.sh"), tmp_path / "run.sh")

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO_ROOT)
    # reference arg order: MODE MODEL DATASET GPU_ID SAVE_ID BATCH NEG DIM
    #                      GAMMA ALPHA LR MAX_STEPS TEST_BATCH [extra...]
    r = subprocess.run(
        ["bash", "run.sh", "train", "RotatE", "toy", "3", "0",
         "32", "8", "8", "4.0", "1.0", "0.01", "40", "4",
         "-de", "--log_steps", "20", "--platform", "cpu"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    save_dir = tmp_path / "models" / "RotatE_toy_0"  # save-dir convention
    assert (save_dir / "checkpoint.npz").exists()
    out = r.stdout + r.stderr

    def mrr(text):
        m = re.findall(r"Test MRR at step \d+: ([0-9.]+)", text)
        assert m, text[-2000:]
        return float(m[-1])

    trained = mrr(out)

    r2 = subprocess.run(
        ["bash", "run.sh", "test", "RotatE", "toy", "3", "0",
         "--platform", "cpu"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
    )
    # the reference's valid/test modes take only MODE MODEL DATASET GPU SAVE_ID
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert mrr(r2.stdout + r2.stderr) == pytest.approx(trained, abs=1e-6)
