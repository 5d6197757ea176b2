"""CLI integration: full train->save->resume->test flow through the
reference-compatible flag surface, on a generated reference-format dataset
directory (SURVEY.md §2.2 run.py behaviors)."""

import os

import numpy as np
import pytest

from knowledgegraphembedding_tpu import cli
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg, make_countries_like
from knowledgegraphembedding_tpu.data.vocab import load_dataset, save_dataset


def test_parse_args_defaults_match_reference():
    cfg = cli.parse_args(["--do_train", "--data_path", "x", "-save", "s"])
    assert cfg.negative_sample_size == 128
    assert cfg.hidden_dim == 500
    assert cfg.gamma == 12.0
    assert cfg.adversarial_temperature == 1.0
    assert cfg.batch_size == 1024
    assert cfg.regularization == 0.0
    assert cfg.test_batch_size == 4
    assert cfg.learning_rate == 0.0001
    assert cfg.cpu_num == 10
    assert cfg.max_steps == 100000
    assert cfg.warm_up_steps is None
    assert cfg.save_checkpoint_steps == 10000
    assert cfg.valid_steps == 10000
    assert cfg.log_steps == 100
    assert cfg.test_log_steps == 1000
    assert not cfg.negative_adversarial_sampling
    assert not cfg.uni_weight


def test_validation_errors(tmp_path):
    with pytest.raises(ValueError, match="one of train/val/test"):
        cli.main(["--data_path", "x"])
    with pytest.raises(ValueError, match="init_checkpoint/data_path"):
        cli.main(["--do_test"])
    with pytest.raises(ValueError, match="save your trained model"):
        cli.main(["--do_train", "--data_path", "x"])


def test_full_train_valid_test_flow(tmp_path):
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=6, nrelation=2, seed=3)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)

    loaded = load_dataset(data_dir)
    assert loaded.nentity == ds.nentity
    np.testing.assert_array_equal(np.sort(loaded.train, 0), np.sort(ds.train, 0))

    metrics = cli.main([
        "--do_train", "--do_valid", "--do_test",
        "--data_path", data_dir, "--model", "RotatE", "-de",
        "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
        "-lr", "0.01", "--max_steps", "60", "--warm_up_steps", "40",
        "--test_batch_size", "4", "--eval_chunk_size", "16",
        "--log_steps", "20", "--valid_steps", "50",
        "--save_checkpoint_steps", "50",
        "-save", save_dir,
    ])
    assert "valid" in metrics and "test" in metrics
    assert 0 < metrics["test"]["MRR"] <= 1
    for fname in ("config.json", "checkpoint.npz", "entity_embedding.npy",
                  "relation_embedding.npy", "train.log"):
        assert os.path.exists(os.path.join(save_dir, fname)), fname

    # resume-and-test through -init (codes/run.py §override_config path)
    metrics2 = cli.main(["--do_test", "-init", save_dir, "--eval_chunk_size", "16"])
    assert abs(metrics2["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-6


def test_countries_flow(tmp_path):
    ds = make_countries_like(seed=0)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--countries",
        "--data_path", data_dir, "--model", "pRotatE",
        "-n", "16", "-b", "128", "-d", "16", "-g", "0.1", "-adv",
        "-lr", "0.01", "--max_steps", "400", "--log_steps", "100",
        "-save", save_dir,
    ])
    assert "auc_pr" in metrics["test"]
    # >> chance (~0.2); the faithful S1 generator (240 countries + hierarchy)
    # needs a few hundred steps at this tiny dim
    assert metrics["test"]["auc_pr"] > 0.5


def test_sharded_cli_flow(tmp_path):
    """--num_shards 2 drives the ShardedTrainer + sharded eval end to end
    (virtual CPU devices), including checkpoint round-trip."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test",
        "--data_path", data_dir, "--model", "RotatE", "-de",
        "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
        "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
        "--num_shards", "2", "--test_batch_size", "4",
        "-save", save_dir,
    ])
    assert 0 < metrics["test"]["MRR"] <= 1
    # resumed single-device eval must reproduce the sharded-trained model
    metrics2 = cli.main(["--do_test", "-init", save_dir, "--eval_chunk_size", "16"])
    assert abs(metrics2["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-5

    # the hand-scheduled shard_map step drives the same flow and (same seed,
    # same sampler stream) reproduces the GSPMD-trained model's metrics
    save_dir3 = str(tmp_path / "save_shardmap")
    metrics3 = cli.main([
        "--do_train", "--do_test",
        "--data_path", data_dir, "--model", "RotatE", "-de",
        "-n", "8", "-b", "32", "-d", "8", "-g", "4.0", "-adv",
        "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
        "--num_shards", "2", "--test_batch_size", "4",
        "--spmd_mode", "shardmap",
        "-save", save_dir3,
    ])
    assert abs(metrics3["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-4


def test_evaluate_train_flag(tmp_path):
    """--evaluate_train runs filtered ranking over the TRAIN split after
    training (codes/run.py §main's final branch)."""
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=8, nrelation=2, seed=9)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--evaluate_train",
        "--data_path", data_dir, "--model", "TransE",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--max_steps", "30", "--log_steps", "15",
        "--test_batch_size", "4", "--eval_chunk_size", "8",
        "-save", save_dir,
    ])
    assert "train" in metrics and 0 < metrics["train"]["MRR"] <= 1


def test_prefetch_depth_zero_full_flow(tmp_path):
    """--prefetch_depth 0 (unbuffered sampler) must complete training incl.
    the final save (the iterator's close() used to be missing)."""
    ds = make_clustered_kg(n_clusters=3, entities_per_cluster=8, nrelation=2, seed=1)
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "save")
    save_dataset(ds, data_dir)
    cli.main([
        "--do_train", "--data_path", data_dir, "--model", "TransE",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--max_steps", "10", "--log_steps", "5",
        "--prefetch_depth", "0", "-save", save_dir,
    ])
    assert os.path.exists(os.path.join(save_dir, "checkpoint.npz"))


def test_resume_explicit_data_path_wins(tmp_path):
    """codes/run.py §override_config only falls back to the saved data_path
    when the CLI gave none — an explicit --data_path at resume must win."""
    ds_a = make_clustered_kg(n_clusters=3, entities_per_cluster=8, nrelation=2, seed=1)
    dir_a = str(tmp_path / "a")
    dir_b = str(tmp_path / "b")
    save_dir = str(tmp_path / "save")
    save_dataset(ds_a, dir_a)
    # second dataset: same vocab sizes, different triples
    ds_b = make_clustered_kg(n_clusters=3, entities_per_cluster=8, nrelation=2, seed=2)
    save_dataset(ds_b, dir_b)
    cli.main([
        "--do_train", "--data_path", dir_a, "--model", "TransE",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--max_steps", "10", "--log_steps", "5",
        "-save", save_dir,
    ])
    import json
    from knowledgegraphembedding_tpu import checkpoint as ckpt_mod
    from knowledgegraphembedding_tpu.config import RunConfig

    cfg = RunConfig(do_test=True, init_checkpoint=save_dir, data_path=dir_b)
    cfg = ckpt_mod.override_config(cfg)
    assert cfg.data_path == dir_b  # explicit flag wins
    cfg2 = RunConfig(do_test=True, init_checkpoint=save_dir)
    cfg2 = ckpt_mod.override_config(cfg2)
    assert cfg2.data_path == dir_a  # fallback when absent


def test_synthetic_registry_data_path(tmp_path):
    """--data_path synthetic:<key> generates the dataset in-process."""
    metrics = cli.main([
        "--do_train", "--do_test", "--data_path", "synthetic:clustered",
        "--model", "TransE", "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--max_steps", "10", "--log_steps", "5",
        "--test_batch_size", "4", "--eval_chunk_size", "16",
        "-save", str(tmp_path / "save"),
    ])
    assert 0 < metrics["test"]["MRR"] <= 1


def test_resume_warns_on_dataset_fingerprint_mismatch(tmp_path, capfd):
    """A checkpoint resumed against DIFFERENT triples (same vocab sizes)
    must warn loudly — e.g. a synthetic generator whose output changed
    between save and resume (r2 review)."""
    ds_a = make_clustered_kg(n_clusters=3, entities_per_cluster=8, nrelation=2, seed=1)
    ds_b = make_clustered_kg(n_clusters=3, entities_per_cluster=8, nrelation=2, seed=2)
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    save_dir = str(tmp_path / "save")
    save_dataset(ds_a, dir_a)
    save_dataset(ds_b, dir_b)
    cli.main([
        "--do_train", "--data_path", dir_a, "--model", "TransE",
        "-n", "4", "-b", "16", "-d", "8", "-g", "4.0",
        "-lr", "0.01", "--max_steps", "10", "--log_steps", "5",
        "-save", save_dir,
    ])
    cli.main(["--do_test", "-init", save_dir, "--data_path", dir_a,
              "--eval_chunk_size", "8"])
    out = capfd.readouterr()
    assert "fingerprint mismatch" not in out.err + out.out  # same data: quiet
    cli.main(["--do_test", "-init", save_dir, "--data_path", dir_b,
              "--eval_chunk_size", "8"])
    out = capfd.readouterr()
    assert "fingerprint mismatch" in out.err + out.out


def test_countries_on_mesh(tmp_path):
    """--countries + --num_shards: AUC-PR evaluation gathers host params
    from the mesh trainer (the countries branch of _evaluate)."""
    ds = make_countries_like(seed=0)
    data_dir = str(tmp_path / "data")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--countries",
        "--data_path", data_dir, "--model", "pRotatE",
        "-n", "8", "-b", "64", "-d", "16", "-g", "0.1", "-adv",
        "-lr", "0.01", "--max_steps", "60", "--log_steps", "30",
        "--num_shards", "2", "-save", str(tmp_path / "save"),
    ])
    assert 0.0 <= metrics["test"]["auc_pr"] <= 1.0


def test_planned_host_stream_bytes():
    """The r5 transfer-volume guard's byte math: per-positive negatives
    stream [B, n] per step; shared negatives ship ONE [n] row (the first
    guard cut overestimated shared-negs runs by ~60x)."""
    from knowledgegraphembedding_tpu.cli import planned_host_stream_bytes

    per_pos = planned_host_stream_bytes(512, 1024, "none", 80_000)
    # 512 * (1024 + 5) * 4 bytes * 80k steps ~ 169 GB — the wn18rr
    # capstone shape that leaked ~130 GB by step 63k
    assert abs(per_pos - 80_000 * 4.0 * 512 * 1029) < 1
    assert per_pos > 100e9

    shared = planned_host_stream_bytes(512, 1024, "batch", 80_000)
    assert abs(shared - 80_000 * 4.0 * (4 * 512 + 1024)) < 1
    assert shared < 1.1e9  # ~60x smaller than the per-positive stream

    assert planned_host_stream_bytes(512, 1024, "none", -5) == 0.0
