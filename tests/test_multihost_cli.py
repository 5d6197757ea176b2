"""Full multi-host CLI run: two OS processes launch
``knowledgegraphembedding_tpu.cli --multihost`` against the SAME dataset
directory; the mesh spans 2x2 virtual CPU devices, the triple stream is
edge-partitioned, process 0 alone writes logs + checkpoints, and both
hosts report identical (psum'd) metrics."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("spmd_mode", ["shardmap", "gspmd", "routed"])
def test_two_process_cli_end_to_end(tmp_path, spmd_mode):
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO_ROOT,
    )

    def args(pid):
        return [
            sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
            "--do_train", "--do_test",
            "--data_path", data_dir, "--model", "RotatE", "-de",
            "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
            "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
            "--test_batch_size", "4", "--spmd_mode", spmd_mode,
            "--multihost",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
            "-save", save_dir,
        ]

    procs = [
        subprocess.Popen(args(pid), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"

    # the fleet formed: 2 processes x 2 local devices = 4-device mesh
    assert "SPMD mesh: 4 devices" in outs[0]
    assert "multihost: process 0/2, 2 local devices" in outs[0]
    assert "multihost: process 1/2, 2 local devices" in outs[1]

    # identical test metrics on both hosts (psum'd ranking)
    def mrr(out):
        m = re.search(r"Test MRR at step \d+: ([0-9.]+)", out)
        assert m, out[-2000:]
        return float(m.group(1))

    assert mrr(outs[0]) == pytest.approx(mrr(outs[1]), abs=0)

    # process 0 wrote the artifacts; the run is resumable single-process
    ckpt = os.path.join(save_dir, "checkpoint.npz")
    assert os.path.exists(ckpt)
    assert int(np.load(ckpt)["step"]) == 40

    resume = subprocess.run(
        [sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
         "--do_test", "-init", save_dir, "--platform", "cpu",
         "--test_batch_size", "4", "--eval_chunk_size", "16"],
        env=dict(os.environ, PYTHONPATH=REPO_ROOT),
        capture_output=True, text=True, timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert mrr(resume.stderr + resume.stdout) == pytest.approx(mrr(outs[0]), abs=1e-6)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_device_sampler_and_device_eval(tmp_path):
    """--sampler_backend device + --eval_filter device on a 2-process fleet
    (VERDICT r1 next-item #4): the mesh device sampler draws each device's
    batch shard on-device (hosts ship only index rows), the eval filter CSR
    is placed as global replicated arrays, both hosts report identical
    metrics, and the checkpoint resumes single-process."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO_ROOT,
    )

    def args(pid):
        return [
            sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
            "--do_train", "--do_test",
            "--data_path", data_dir, "--model", "RotatE", "-de",
            "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
            "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
            "--test_batch_size", "4",
            "--sampler_backend", "device", "--eval_filter", "device",
            "--multihost",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
            "-save", save_dir,
        ]

    procs = [
        subprocess.Popen(args(pid), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"

    assert "SPMD mesh: 4 devices" in outs[0]

    def mrr(out):
        m = re.search(r"Test MRR at step \d+: ([0-9.]+)", out)
        assert m, out[-2000:]
        return float(m.group(1))

    # training learned something and both hosts agree exactly
    assert mrr(outs[0]) == pytest.approx(mrr(outs[1]), abs=0)

    resume = subprocess.run(
        [sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
         "--do_test", "-init", save_dir, "--platform", "cpu",
         "--test_batch_size", "4", "--eval_chunk_size", "16"],
        env=dict(os.environ, PYTHONPATH=REPO_ROOT),
        capture_output=True, text=True, timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert mrr(resume.stderr + resume.stdout) == pytest.approx(mrr(outs[0]), abs=1e-6)


@pytest.mark.slow
def test_two_process_fused_blocks(tmp_path):
    """--steps_per_dispatch 8 on a 2-process fleet: mesh-fused blocks (each
    device samples + updates k steps in one dispatch), identical cross-host
    metrics, single-process-resumable checkpoint."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO_ROOT,
    )

    def args(pid):
        return [
            sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
            "--do_train", "--do_test",
            "--data_path", data_dir, "--model", "RotatE", "-de",
            "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
            "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
            "--test_batch_size", "4", "--spmd_mode", "shardmap",
            "--steps_per_dispatch", "8",
            "--multihost",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
            "-save", save_dir,
        ]

    procs = [
        subprocess.Popen(args(pid), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"
    assert "fused training: 8 steps per dispatch" in outs[0]

    def mrr(out):
        m = re.search(r"Test MRR at step \d+: ([0-9.]+)", out)
        assert m, out[-2000:]
        return float(m.group(1))

    assert mrr(outs[0]) == pytest.approx(mrr(outs[1]), abs=0)

    resume = subprocess.run(
        [sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
         "--do_test", "-init", save_dir, "--platform", "cpu",
         "--test_batch_size", "4", "--eval_chunk_size", "16"],
        env=dict(os.environ, PYTHONPATH=REPO_ROOT),
        capture_output=True, text=True, timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert mrr(resume.stderr + resume.stdout) == pytest.approx(mrr(outs[0]), abs=1e-6)


@pytest.mark.slow
def test_two_process_2d_mesh(tmp_path):
    """--model_shards on a fleet: 2 processes x 2 local devices form a
    (2 data x 2 model) mesh — embedding-dim sharding spans hosts; identical
    cross-host metrics; single-process-resumable checkpoint."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO_ROOT,
    )

    def args(pid):
        return [
            sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
            "--do_train", "--do_test",
            "--data_path", data_dir, "--model", "RotatE", "-de",
            "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
            "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
            "--test_batch_size", "4", "--model_shards", "2",
            "--multihost",
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
            "-save", save_dir,
        ]

    procs = [
        subprocess.Popen(args(pid), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"
    assert "SPMD mesh: (2 data x 2 model) devices" in outs[0]

    def mrr(out):
        m = re.search(r"Test MRR at step \d+: ([0-9.]+)", out)
        assert m, out[-2000:]
        return float(m.group(1))

    assert mrr(outs[0]) == pytest.approx(mrr(outs[1]), abs=0)

    resume = subprocess.run(
        [sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
         "--do_test", "-init", save_dir, "--platform", "cpu",
         "--test_batch_size", "4", "--eval_chunk_size", "16"],
        env=dict(os.environ, PYTHONPATH=REPO_ROOT),
        capture_output=True, text=True, timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert mrr(resume.stderr + resume.stdout) == pytest.approx(mrr(outs[0]), abs=1e-6)
