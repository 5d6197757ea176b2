"""Fused multi-step training (fused_train.py, --steps_per_dispatch):
block(k) must equal k fused single steps exactly (same per-step RNG
derivation), blocks must respect boundary clipping + LR decay semantics,
the quality bar must hold end to end, and the CLI flow must run with
reference-identical event timing."""

import os
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import cli
from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.data.vocab import save_dataset
from knowledgegraphembedding_tpu.fused_train import FusedDeviceTrainer
from knowledgegraphembedding_tpu.models import kge


def _setup(negative_sharing="none", seed=0):
    ds = make_clustered_kg(n_clusters=5, entities_per_cluster=8, nrelation=2, seed=1)
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=16, gamma=6.0, double_entity_embedding=True,
    )
    tspec = TrainSpec(negative_sample_size=8, batch_size=32,
                      negative_adversarial_sampling=True)
    params = kge.init_params(spec, jax.random.PRNGKey(seed))
    return ds, spec, tspec, params


@pytest.mark.parametrize("negative_sharing", ["none", "batch"])
def test_block_equals_singles(negative_sharing):
    """run_block(8) == 8 x run_block(1): identical params, moments, and
    summed logs (the per-step key derivation is block-size independent)."""
    ds, spec, tspec, params = _setup(negative_sharing)
    a = FusedDeviceTrainer(spec, tspec, params, lr=1e-2, warm_up_steps=10**9,
                           train=ds.train, seed=3,
                           negative_sharing=negative_sharing)
    b = FusedDeviceTrainer(spec, tspec, params, lr=1e-2, warm_up_steps=10**9,
                           train=ds.train, seed=3,
                           negative_sharing=negative_sharing)
    logs_a = a.run_block(8)
    sums = None
    for _ in range(8):
        lg = b.run_block(1)
        sums = (lg if sums is None
                else {k: sums[k] + lg[k] for k in lg})
    assert a.step == b.step == 8
    for k in a.params:
        np.testing.assert_allclose(
            np.asarray(a.params[k]), np.asarray(b.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(a.opt_state.m["entity_embedding"]),
        np.asarray(b.opt_state.m["entity_embedding"]), rtol=1e-6, atol=1e-8)
    for k in logs_a:
        np.testing.assert_allclose(float(logs_a[k]), float(sums[k]),
                                   rtol=1e-5, err_msg=k)


def test_decay_fires_after_block_at_boundary():
    ds, spec, tspec, params = _setup()
    tr = FusedDeviceTrainer(spec, tspec, params, lr=1e-2, warm_up_steps=10,
                            train=ds.train, seed=0)
    assert tr.max_block(64) == 11  # step 10 may close the block, not be crossed
    tr.run_block(tr.max_block(64))
    assert tr.step == 11
    np.testing.assert_allclose(tr.current_learning_rate, 1e-3)
    assert tr.warm_up_steps == 30
    assert int(tr.opt_state.count) == 0  # fresh Adam after the reset


def test_fused_learns_clustered_graph():
    ds = make_clustered_kg(n_clusters=6, entities_per_cluster=10, nrelation=3, seed=0)
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=32, gamma=6.0, double_entity_embedding=True,
    )
    tspec = TrainSpec(negative_sample_size=32, batch_size=64,
                      negative_adversarial_sampling=True)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    tr = FusedDeviceTrainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                            lr=5e-3, warm_up_steps=10**9, train=ds.train, seed=0)
    for _ in range(300 // 20):
        tr.run_block(20)
    metrics = eval_mod.test_step(tr.params, spec, ds.test, filters,
                                 test_batch_size=8, eval_chunk_size=32)
    assert metrics["HITS@10"] > 0.35, metrics


def test_cli_fused_flow(tmp_path):
    """--steps_per_dispatch 8: event cadence identical to the per-step loop
    (log lines at the same steps), checkpoint resume reproduces metrics."""
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        "RotatE", "-de", "-n", "8", "-b", "32", "-d", "8", "-g", "4.0",
        "-adv", "-lr", "0.01", "--max_steps", "60", "--log_steps", "20",
        "--warm_up_steps", "30", "--test_batch_size", "4",
        "--steps_per_dispatch", "8", "-save", save_dir,
    ])
    assert 0 < metrics["test"]["MRR"] <= 1
    log_text = open(os.path.join(save_dir, "train.log")).read()
    # window logs land at exactly the reference steps despite 8-step blocks
    steps = re.findall(r"Training average loss at step (\d+):", log_text)
    assert steps == ["19", "39", "59"], steps
    assert "Change learning_rate" in log_text  # decay fired (warm_up 30)
    metrics2 = cli.main(["--do_test", "-init", save_dir, "--eval_chunk_size", "16"])
    assert abs(metrics2["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-6


def test_cli_fused_rejects_host_sampler(tmp_path):
    ds = make_clustered_kg(n_clusters=3, entities_per_cluster=6, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dataset(ds, data_dir)
    with pytest.raises(ValueError, match="fused"):
        cli.main([
            "--do_train", "--data_path", data_dir, "--model", "TransE",
            "-n", "4", "-b", "16", "-d", "8", "--max_steps", "10",
            "--steps_per_dispatch", "4", "--sampler_backend", "native",
            "-save", str(tmp_path / "save"),
        ])


def test_mesh_fused_matches_single_device_shapes_and_learns():
    """FusedMeshTrainer on the 8-device mesh: blocks advance, decay fires,
    model clears the planted-graph bar, checkpoint surface round-trips."""
    from knowledgegraphembedding_tpu.fused_train import FusedMeshTrainer
    from knowledgegraphembedding_tpu.parallel import eval_sharded, sharding

    ds = make_clustered_kg(n_clusters=6, entities_per_cluster=10, nrelation=3, seed=0)
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=32, gamma=6.0, double_entity_embedding=True,
    )
    tspec = TrainSpec(negative_sample_size=32, batch_size=64,
                      negative_adversarial_sampling=True)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    mesh = sharding.build_mesh(8)
    tr = FusedMeshTrainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                          lr=5e-3, warm_up_steps=10**9, train=ds.train,
                          mesh=mesh, seed=0)
    for _ in range(300 // 20):
        logs = tr.run_block(20)
    assert np.isfinite(logs["loss"])
    assert tr.step == 300
    metrics = eval_sharded.sharded_test_step(
        tr.params, spec, ds.test, filters, mesh, test_batch_size=8)
    assert metrics["HITS@10"] > 0.35, metrics
    # checkpoint surface (padding-stripped host copy) works
    p, state = tr.checkpoint_state()
    assert p["entity_embedding"].shape[0] == spec.nentity


def test_mesh_fused_shared_negatives_block():
    from knowledgegraphembedding_tpu.fused_train import FusedMeshTrainer
    from knowledgegraphembedding_tpu.parallel import sharding

    ds, spec, tspec, params = _setup("batch")
    mesh = sharding.build_mesh(8)
    tr = FusedMeshTrainer(spec, tspec, params, lr=1e-2, warm_up_steps=10,
                          train=ds.train, mesh=mesh, seed=0,
                          negative_sharing="batch")
    logs = tr.run_block(tr.max_block(64))
    assert tr.step == 11 and np.isfinite(logs["loss"])
    np.testing.assert_allclose(tr.current_learning_rate, 1e-3)


def test_cli_mesh_fused_flow(tmp_path):
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        "RotatE", "-de", "-n", "8", "-b", "32", "-d", "8", "-g", "4.0",
        "-adv", "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
        "--test_batch_size", "4", "--num_shards", "2", "--spmd_mode",
        "shardmap", "--steps_per_dispatch", "8", "-save", save_dir,
    ])
    assert 0 < metrics["test"]["MRR"] <= 1
    # resumable single-process (padding-stripped checkpoint)
    metrics2 = cli.main(["--do_test", "-init", save_dir, "--eval_chunk_size", "16"])
    assert abs(metrics2["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-5


def test_cli_mesh_fused_default_gspmd_mode(tmp_path):
    """Default --spmd_mode (gspmd) + --steps_per_dispatch on a mesh routes
    to the fused hand-scheduled program (parity-equal) instead of erroring;
    routed still rejects."""
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        "RotatE", "-de", "-n", "8", "-b", "32", "-d", "8", "-g", "4.0",
        "-adv", "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
        "--test_batch_size", "4", "--num_shards", "2",
        "--steps_per_dispatch", "8", "-save", save_dir,
    ])
    assert 0 < metrics["test"]["MRR"] <= 1
    with pytest.raises(ValueError, match="routed"):
        cli.main([
            "--do_train", "--data_path", data_dir, "--model", "RotatE",
            "-de", "-n", "8", "-b", "32", "-d", "8", "--max_steps", "10",
            "--num_shards", "2", "--spmd_mode", "routed",
            "--steps_per_dispatch", "8", "-save", str(tmp_path / "s2"),
        ])


def test_cli_fused_with_regularization_logs(tmp_path):
    """Fused blocks carry the 4th log key (regularization) through the
    summed block vector and into the window logs."""
    ds = make_clustered_kg(n_clusters=3, entities_per_cluster=6, nrelation=2, seed=5)
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)
    cli.main([
        "--do_train", "--data_path", data_dir, "--model", "ComplEx",
        "-de", "-dr", "-r", "0.00001", "-n", "4", "-b", "16", "-d", "8",
        "-g", "200.0", "-lr", "0.001", "--max_steps", "20",
        "--log_steps", "10", "--steps_per_dispatch", "4",
        "-save", save_dir,
    ])
    log_text = open(os.path.join(save_dir, "train.log")).read()
    assert "Training average regularization at step 9" in log_text
    assert "Training average regularization at step 19" in log_text


def test_run_block_rejects_unclipped_k():
    """The boundary-clipping contract is a ValueError, not a bare assert:
    it must hold under PYTHONOPTIMIZE too (r3 advisor)."""
    ds, spec, tspec, params = _setup()
    tr = FusedDeviceTrainer(spec, tspec, params, lr=1e-2, warm_up_steps=10,
                            train=ds.train, seed=0)
    with pytest.raises(ValueError, match="LR-decay boundary"):
        tr.run_block(12)  # max_block is 11
    assert tr.step == 0  # nothing advanced
