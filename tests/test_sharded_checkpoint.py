"""Sharded checkpoint IO (SURVEY §5.4; VERDICT r2 next-round #5).

Per-process shard files must reassemble BIT-EXACTLY to the gathered state
— on 1-D and 2-D meshes, through the public loader, resumable on any
process count. The 2-process fleet variant lives at the bottom (the CI
analogue of a pod where no host can afford to serialize the full table).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from knowledgegraphembedding_tpu import checkpoint as ckpt_mod
from knowledgegraphembedding_tpu.config import ModelSpec, RunConfig, TrainSpec
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_trainer(mesh, nentity=67):
    spec = ModelSpec(
        model_name="RotatE", nentity=nentity, nrelation=5, hidden_dim=8,
        gamma=4.0, double_entity_embedding=True,
    )
    tspec = TrainSpec(negative_sample_size=4, batch_size=16,
                      negative_adversarial_sampling=True)
    trainer = sharding.ShardedTrainer(
        spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
        lr=1e-2, warm_up_steps=10**9, mesh=mesh,
    )
    rng = np.random.default_rng(0)
    for _ in range(3):  # give the state non-trivial Adam moments
        pos = np.stack([rng.integers(0, nentity, 16),
                        rng.integers(0, 5, 16),
                        rng.integers(0, nentity, 16)], 1).astype(np.int32)
        neg = rng.integers(0, nentity, (16, 4)).astype(np.int32)
        w = rng.uniform(0.2, 1.0, 16).astype(np.float32)
        trainer.one_step((pos, neg, w, "tail-batch"))
    return trainer


def _config(tmp_path):
    return RunConfig(do_train=True, data_path="unused", model="RotatE",
                     save_path=str(tmp_path))


@pytest.mark.parametrize("model_shards", [1, 2])
def test_sharded_save_roundtrips_bit_exact(tmp_path, model_shards):
    """save_model_sharded -> load_checkpoint == the gathered
    checkpoint_state(), bit for bit (params, both moments, scalars) —
    entity rows ragged (67 % 8 != 0) so padding rows are exercised."""
    mesh = sharding.build_mesh(
        8 // model_shards, model_shards=model_shards)
    trainer = _mk_trainer(mesh)
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))

    # single process -> exactly one shard file + the meta npz
    files = sorted(os.listdir(tmp_path))
    assert "checkpoint.npz" in files
    shard_files = [f for f in files if re.match(r"checkpoint\.shard\d+-of-\d+\.npz", f)]
    assert shard_files == ["checkpoint.shard00000-of-00001.npz"]
    meta = np.load(tmp_path / "checkpoint.npz")
    assert int(meta["sharded_shards"]) == 1
    # the meta npz holds NO entity rows — the whole point
    assert not any(k.startswith("param.entity") for k in meta.files)

    params, state, step, lr, wu = ckpt_mod.load_checkpoint(str(tmp_path))
    p_ref, s_ref = trainer.checkpoint_state()
    assert step == trainer.step and lr == trainer.current_learning_rate
    assert wu == trainer.warm_up_steps
    for k in p_ref:
        np.testing.assert_array_equal(np.asarray(params[k]), p_ref[k], err_msg=k)
    for k in s_ref.m:
        np.testing.assert_array_equal(np.asarray(state.m[k]), s_ref.m[k], err_msg=k)
        np.testing.assert_array_equal(np.asarray(state.v[k]), s_ref.v[k], err_msg=k)
    assert int(state.count) == int(np.asarray(s_ref.count))


def test_sharded_checkpoint_restores_into_trainer(tmp_path):
    """A fresh ShardedTrainer restored from shard files must continue
    bit-identically to the saver continuing in-process."""
    mesh = sharding.build_mesh(8)
    trainer = _mk_trainer(mesh)
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))

    restored = sharding.ShardedTrainer(
        trainer.spec, trainer.tspec,
        kge.init_params(trainer.spec, jax.random.PRNGKey(99)),  # junk init
        lr=0.5, warm_up_steps=1, mesh=mesh,
    )
    restored.load_host_state(*ckpt_mod.load_checkpoint(str(tmp_path)))

    rng = np.random.default_rng(7)
    pos = np.stack([rng.integers(0, 67, 16), rng.integers(0, 5, 16),
                    rng.integers(0, 67, 16)], 1).astype(np.int32)
    neg = rng.integers(0, 67, (16, 4)).astype(np.int32)
    w = rng.uniform(0.2, 1.0, 16).astype(np.float32)
    l1 = trainer.one_step((pos, neg, w, "tail-batch"))
    l2 = restored.one_step((pos, neg, w, "tail-batch"))
    assert float(l1["loss"]) == float(l2["loss"])
    p1, _ = trainer.checkpoint_state()
    p2, _ = restored.checkpoint_state()
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k], err_msg=k)


def test_process_local_restore_across_layout_change(tmp_path):
    """restore_trainer_sharded: save on an 8-row mesh (Epad=72 for E=67),
    restore onto a 4-row mesh (Epad=68) — blocks re-map by global row
    ranges, padding rows stay zero, and the state is bit-exact vs the
    gathered reference. This is the process-local path the CLI uses for
    mesh trainers (no full-table host copy)."""
    trainer = _mk_trainer(sharding.build_mesh(8))
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))
    p_ref, s_ref = trainer.checkpoint_state()

    mesh4 = sharding.build_mesh(4)
    restored = sharding.ShardedTrainer(
        trainer.spec, trainer.tspec,
        kge.init_params(trainer.spec, jax.random.PRNGKey(99)),
        lr=0.5, warm_up_steps=1, mesh=mesh4,
    )
    ckpt_mod.restore_trainer_sharded(restored, str(tmp_path))
    assert restored.step == trainer.step
    assert restored.current_learning_rate == trainer.current_learning_rate
    assert restored.warm_up_steps == trainer.warm_up_steps
    p2, s2 = restored.checkpoint_state()
    for k in p_ref:
        np.testing.assert_array_equal(p2[k], p_ref[k], err_msg=k)
    for k in s_ref.m:
        np.testing.assert_array_equal(np.asarray(s2.m[k]), s_ref.m[k], err_msg=k)
        np.testing.assert_array_equal(np.asarray(s2.v[k]), s_ref.v[k], err_msg=k)
    # padding rows on the new layout are zero (the pad_params contract the
    # regularizer + zero-gradient invariants rely on)
    full = np.asarray(restored.params["entity_embedding"])
    assert full.shape[0] == 68
    np.testing.assert_array_equal(full[67:], 0.0)


def test_mixed_save_detected(tmp_path):
    """A shard file from a DIFFERENT step than the meta npz (mid-save
    preemption on a fleet) must hard-error on BOTH load paths, not
    silently resume a Frankenstein state."""
    trainer = _mk_trainer(sharding.build_mesh(8))
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))
    shard = tmp_path / "checkpoint.shard00000-of-00001.npz"
    z = dict(np.load(shard))
    z["step"] = np.int64(int(z["step"]) - 1)  # stale shard from prior save
    np.savez(shard, **z)
    with pytest.raises(RuntimeError, match="inconsistent"):
        ckpt_mod.load_checkpoint(str(tmp_path))
    with pytest.raises(RuntimeError, match="inconsistent"):
        ckpt_mod.restore_trainer_sharded(trainer, str(tmp_path))


def test_missing_blocks_detected(tmp_path):
    """Dropped blocks (truncated / layout-mismatched shard file) must
    hard-error instead of resuming with uninitialized or zero rows."""
    trainer = _mk_trainer(sharding.build_mesh(8))
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))
    shard = tmp_path / "checkpoint.shard00000-of-00001.npz"
    z = dict(np.load(shard))
    removed = [k for k in z if k.startswith("param.entity_embedding:block3")]
    for k in removed:
        del z[k]
    assert removed
    np.savez(shard, **z)
    with pytest.raises(RuntimeError, match="coverage"):
        ckpt_mod.load_checkpoint(str(tmp_path))
    with pytest.raises(RuntimeError, match="coverage"):
        ckpt_mod.restore_trainer_sharded(trainer, str(tmp_path))


def _npz_dir_state(path):
    """{filename: {key: array}} for every checkpoint npz in a save dir."""
    out = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".npz"):
            z = np.load(os.path.join(path, f))
            out[f] = {k: np.asarray(z[k]) for k in z.files}
    return out


def test_async_sharded_save_bit_identical(tmp_path):
    """--sharded_checkpoint --async_checkpoint (VERDICT r3 #4): the
    device-snapshot + background-writer save must produce artifacts
    bit-identical to the synchronous sharded save — INCLUDING when the
    train loop keeps stepping (donating the live buffers) while the
    writer drains the snapshot."""
    mesh = sharding.build_mesh(8)
    trainer = _mk_trainer(mesh)
    sync_dir = tmp_path / "sync"
    async_dir = tmp_path / "async"
    ckpt_mod.save_model_sharded(trainer, _config(sync_dir), str(sync_dir))

    ckpt_mod.save_model_sharded(trainer, _config(async_dir), str(async_dir),
                                asynchronous=True)
    # immediately advance training: one_step donates params/opt_state, so
    # any aliasing between the snapshot and the live state would corrupt
    # the in-flight write
    rng = np.random.default_rng(3)
    pos = np.stack([rng.integers(0, 67, 16), rng.integers(0, 5, 16),
                    rng.integers(0, 67, 16)], 1).astype(np.int32)
    neg = rng.integers(0, 67, (16, 4)).astype(np.int32)
    w = rng.uniform(0.2, 1.0, 16).astype(np.float32)
    trainer.one_step((pos, neg, w, "tail-batch"))
    ckpt_mod.wait_for_pending_save()

    ref, got = _npz_dir_state(sync_dir), _npz_dir_state(async_dir)
    assert sorted(ref) == sorted(got) == [
        "checkpoint.npz", "checkpoint.shard00000-of-00001.npz"]
    for fname in ref:
        assert sorted(ref[fname]) == sorted(got[fname]), fname
        for k in ref[fname]:
            np.testing.assert_array_equal(
                got[fname][k], ref[fname][k], err_msg=f"{fname}:{k}")


def test_async_sharded_mid_save_kill(tmp_path):
    """Mid-save-kill drill for the async sharded writer: a process killed
    BETWEEN the shard-file replace and the meta replace leaves a mixed
    save on disk; the load path must hard-error on the step stamp, never
    silently resume a Frankenstein state. (A kill before any replace
    leaves the previous consistent checkpoint — covered implicitly: the
    step-5 save below loads fine until the kill corrupts nothing.)"""
    script = r"""
import os, sys
import numpy as np
import jax
from knowledgegraphembedding_tpu import checkpoint as ckpt_mod
from knowledgegraphembedding_tpu.config import ModelSpec, RunConfig, TrainSpec
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding

save = sys.argv[1]
spec = ModelSpec(model_name="RotatE", nentity=67, nrelation=5, hidden_dim=8,
                 gamma=4.0, double_entity_embedding=True)
tspec = TrainSpec(negative_sample_size=4, batch_size=16)
trainer = sharding.ShardedTrainer(
    spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
    lr=1e-2, warm_up_steps=10**9, mesh=sharding.build_mesh(8))
config = RunConfig(do_train=True, data_path="unused", model="RotatE",
                   save_path=save)
trainer.step = 5
ckpt_mod.save_model_sharded(trainer, config, save)  # consistent step-5 save
trainer.step = 6
_orig = ckpt_mod._atomic_write
def _kill_after_shard(path, fn):
    _orig(path, fn)
    if "shard" in os.path.basename(path):
        os._exit(9)  # SIGKILL-equivalent: mid-multi-file-save crash
ckpt_mod._atomic_write = _kill_after_shard
ckpt_mod.save_model_sharded(trainer, config, save, asynchronous=True)
import time
time.sleep(120)  # the writer thread _exits the process first
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO_ROOT)
    proc = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 9, (proc.returncode, proc.stderr[-2000:])
    # shard file stamped step 6, meta still step 5 -> hard error
    with pytest.raises(RuntimeError, match="inconsistent"):
        ckpt_mod.load_checkpoint(str(tmp_path))


def test_export_tables_from_sharded(tmp_path):
    """tools/export_tables.py reassembles the .npy serving artifacts the
    sharded saves deliberately skip (reference codes/run.py §save_model)."""
    mesh = sharding.build_mesh(8)
    trainer = _mk_trainer(mesh)
    ckpt_mod.save_model_sharded(trainer, _config(tmp_path), str(tmp_path))
    assert not os.path.exists(tmp_path / "entity_embedding.npy")

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "export_tables.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO_ROOT})
    assert proc.returncode == 0, proc.stderr[-2000:]
    p_ref, _ = trainer.checkpoint_state()
    np.testing.assert_array_equal(
        np.load(tmp_path / "entity_embedding.npy"), p_ref["entity_embedding"])
    np.testing.assert_array_equal(
        np.load(tmp_path / "relation_embedding.npy"),
        p_ref["relation_embedding"])


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_checkpoint_fleet(tmp_path):
    """--sharded_checkpoint on a real 2-process fleet: BOTH processes write
    their own shard file (no gather), and the checkpoint resumes
    single-process with identical metrics — the 'any process count'
    restore contract."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.data.vocab import save_dataset

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2,
                           seed=5)
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
            "--save_checkpoint_steps", "20",
            "--test_batch_size", "4", "--sharded_checkpoint",
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
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {pid} failed:\n{out[-4000:]}"

    # each process wrote ITS shard; process 0 wrote the small meta npz
    assert os.path.exists(
        os.path.join(save_dir, "checkpoint.shard00000-of-00002.npz"))
    assert os.path.exists(
        os.path.join(save_dir, "checkpoint.shard00001-of-00002.npz"))
    meta = np.load(os.path.join(save_dir, "checkpoint.npz"))
    assert int(meta["sharded_shards"]) == 2
    assert int(meta["step"]) == 40
    assert not any(k.startswith("param.entity") for k in meta.files)

    def mrr(out):
        m = re.search(r"Test MRR at step \d+: ([0-9.]+)", out)
        assert m, out[-2000:]
        return float(m.group(1))

    assert mrr(outs[0]) == pytest.approx(mrr(outs[1]), abs=0)

    # single-process resume from the 2-shard fleet checkpoint
    resume = subprocess.run(
        [sys.executable, "-m", "knowledgegraphembedding_tpu.cli",
         "--do_test", "-init", save_dir, "--platform", "cpu",
         "--test_batch_size", "4", "--eval_chunk_size", "16"],
        env=dict(os.environ, PYTHONPATH=REPO_ROOT),
        capture_output=True, text=True, timeout=300,
    )
    assert resume.returncode == 0, resume.stderr[-2000:]
    assert mrr(resume.stderr + resume.stdout) == pytest.approx(
        mrr(outs[0]), abs=1e-6)
