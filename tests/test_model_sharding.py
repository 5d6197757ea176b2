"""2-D (data, model) mesh: the embedding-dim axis of both tables shards
over a second mesh axis (--model_shards; GSPMD partitions the gathers,
scorer reductions and Adam sweep). The math must match the single-device
step exactly — including the complex-family half-splits that slice across
column-shard boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import cli, optim
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.data.vocab import save_dataset
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding
from knowledgegraphembedding_tpu.train import train_step


@pytest.mark.parametrize("model,de,dr,dshape", [
    ("RotatE", True, False, (2, 4)),   # re/im split crosses column shards
    ("ComplEx", True, True, (4, 2)),
    ("DistMult", False, False, (1, 8)),  # pure model parallel
])
def test_2d_mesh_step_matches_single_chip(model, de, dr, dshape):
    nentity, B, n = 67, 32, 16  # ragged rows -> exercises row padding too
    spec = ModelSpec(
        model_name=model, nentity=nentity, nrelation=3, hidden_dim=16,
        gamma=6.0, double_entity_embedding=de, double_relation_embedding=dr,
    )
    rng = np.random.default_rng(0)
    pos = np.stack(
        [rng.integers(0, nentity, B), rng.integers(0, 3, B),
         rng.integers(0, nentity, B)], axis=1).astype(np.int32)
    neg = rng.integers(0, nentity, (B, n)).astype(np.int32)
    w = rng.uniform(0.2, 1.0, B).astype(np.float32)
    params0 = kge.init_params(spec, jax.random.PRNGKey(1))
    tspec = TrainSpec(negative_sample_size=n, batch_size=B,
                      negative_adversarial_sampling=True, scoring="gather")

    p1, s1, logs1 = train_step(
        jax.tree.map(jnp.copy, params0), optim.init_state(params0),
        jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w),
        jnp.float32(1e-2), spec=spec, tspec=tspec, mode="tail-batch")

    mesh = sharding.build_mesh(dshape[0], model_shards=dshape[1])
    assert sharding.is_model_sharded(mesh)
    sharding.validate_model_sharding(spec, mesh)
    p2 = sharding.shard_params(
        sharding.pad_params(jax.tree.map(jnp.copy, params0),
                            mesh.shape["data"]), spec, mesh)
    s2 = sharding.shard_opt_state(optim.init_state(p2), spec, mesh)
    fn = sharding.make_sharded_train_step(spec, tspec, mesh, "tail-batch")
    pos_d, neg_d, w_d = sharding.shard_batch(
        mesh, jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w))
    p2, s2, logs2 = fn(p2, s2, pos_d, neg_d, w_d, jnp.float32(1e-2))

    E = spec.nentity
    np.testing.assert_allclose(
        np.asarray(p2["entity_embedding"])[:E],
        np.asarray(p1["entity_embedding"]), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(p2["relation_embedding"]),
        np.asarray(p1["relation_embedding"]), rtol=2e-5, atol=2e-6)
    for k in logs1:
        np.testing.assert_allclose(float(logs2[k]), float(logs1[k]),
                                   rtol=2e-5, err_msg=k)


def test_model_shards_must_divide_width():
    spec = ModelSpec(model_name="RotatE", nentity=16, nrelation=2,
                     hidden_dim=9, gamma=6.0, double_entity_embedding=True)
    mesh = sharding.build_mesh(2, model_shards=4)  # entity_dim 18 % 4 != 0
    with pytest.raises(ValueError, match="must divide"):
        sharding.validate_model_sharding(spec, mesh)


def test_cli_2d_mesh_flow(tmp_path):
    """--model_shards through the CLI: train, eval (host-gather route),
    checkpoint, single-device resume."""
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=7, nrelation=2, seed=5)
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)
    metrics = cli.main([
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        "RotatE", "-de", "-n", "8", "-b", "32", "-d", "8", "-g", "4.0",
        "-adv", "-lr", "0.01", "--max_steps", "40", "--log_steps", "20",
        "--test_batch_size", "4", "--num_shards", "2", "--model_shards", "2",
        "-save", save_dir,
    ])
    assert 0 < metrics["test"]["MRR"] <= 1
    metrics2 = cli.main(["--do_test", "-init", save_dir, "--eval_chunk_size", "16"])
    assert abs(metrics2["test"]["MRR"] - metrics["test"]["MRR"]) < 1e-5


def test_cli_2d_rejects_device_sampler(tmp_path):
    """--sampler_backend device on a 2-D mesh previously fell into the
    SINGLE-device sampler and crashed the mesh jit at step 0 (r2 review);
    it must fail loudly at flag level instead."""
    ds = make_clustered_kg(n_clusters=3, entities_per_cluster=6, nrelation=2, seed=5)
    data_dir = str(tmp_path / "data")
    save_dataset(ds, data_dir)
    with pytest.raises(ValueError, match="model_shards"):
        cli.main([
            "--do_train", "--data_path", data_dir, "--model", "RotatE",
            "-de", "-n", "4", "-b", "16", "-d", "8", "--max_steps", "10",
            "--num_shards", "2", "--model_shards", "2",
            "--sampler_backend", "device", "-save", str(tmp_path / "s"),
        ])


def test_build_mesh_oversubscribed_model_shards_raises():
    with pytest.raises(ValueError, match="devices are available"):
        sharding.build_mesh(model_shards=16)  # 8-device host: 0-size data axis


def test_row_straddle_guard_pure():
    """The placement guard itself (rows spanning processes must raise)."""
    sharding.check_rows_single_process([[0, 0], [1, 1]])  # aligned: ok
    with pytest.raises(ValueError, match="spans processes"):
        sharding.check_rows_single_process([[0, 1], [1, 1]])
