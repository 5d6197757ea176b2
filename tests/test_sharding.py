"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item d): the sharded train step must (1) compile and run with
the intended placements, and (2) produce results allclose to the single-chip
path — the collectives GSPMD inserts are an implementation detail; the math
is not allowed to change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import optim
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding
from knowledgegraphembedding_tpu.sampler import TrainSampler
from knowledgegraphembedding_tpu.train import train_step


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return sharding.build_mesh(8)


def make_problem(model="RotatE", de=True, dr=False, nentity=67, B=32, n=16):
    """Deliberately ragged nentity (67 % 8 != 0) to exercise row padding."""
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=8, nrelation=3, seed=0)
    spec = ModelSpec(
        model_name=model, nentity=nentity, nrelation=3, hidden_dim=16,
        gamma=6.0, double_entity_embedding=de, double_relation_embedding=dr,
    )
    rng = np.random.default_rng(0)
    pos = np.stack(
        [rng.integers(0, nentity, B), rng.integers(0, 3, B), rng.integers(0, nentity, B)],
        axis=1,
    ).astype(np.int32)
    neg = rng.integers(0, nentity, (B, n)).astype(np.int32)
    w = rng.uniform(0.2, 1.0, B).astype(np.float32)
    params = kge.init_params(spec, jax.random.PRNGKey(1))
    return spec, params, pos, neg, w


@pytest.mark.parametrize("model,de,dr,reg", [
    ("RotatE", True, False, 0.0),
    ("ComplEx", True, True, 1e-5),
])
@pytest.mark.parametrize("mode", ["head-batch", "tail-batch"])
def test_sharded_step_matches_single_chip(mesh, model, de, dr, reg, mode):
    spec, params, pos, neg, w = make_problem(model, de, dr)
    tspec = TrainSpec(
        negative_sample_size=neg.shape[1], batch_size=pos.shape[0],
        negative_adversarial_sampling=True, regularization=reg,
    )
    lr = jnp.float32(1e-2)

    # single-chip reference trajectory (2 steps); train_step donates its
    # inputs, so hand it a copy and keep `params` alive for the sharded run
    p1 = jax.tree.map(jnp.copy, params)
    s1 = optim.init_state(p1)
    for _ in range(2):
        p1, s1, logs1 = train_step(
            p1, s1, jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), lr,
            spec=spec, tspec=tspec, mode=mode,
        )

    # sharded trajectory
    pp = sharding.pad_params(params, 8)
    pp = sharding.shard_params(pp, spec, mesh)
    ss = sharding.shard_opt_state(optim.init_state(pp), spec, mesh)
    step_fn = sharding.make_sharded_train_step(spec, tspec, mesh, mode)
    pos_d, neg_d, w_d = sharding.shard_batch(mesh, jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w))
    for _ in range(2):
        pp, ss, logs2 = step_fn(pp, ss, pos_d, neg_d, w_d, lr)

    E = spec.nentity
    got_ent = np.asarray(pp["entity_embedding"])[:E]
    np.testing.assert_allclose(
        got_ent, np.asarray(p1["entity_embedding"]), rtol=2e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(pp["relation_embedding"]), np.asarray(p1["relation_embedding"]),
        rtol=2e-4, atol=2e-6,
    )
    if reg == 0.0:
        # padded zero rows must stay exactly zero
        np.testing.assert_array_equal(np.asarray(pp["entity_embedding"])[E:], 0.0)
    for k in logs1:
        np.testing.assert_allclose(float(logs2[k]), float(logs1[k]), rtol=2e-4, atol=2e-6)


def test_intended_placements(mesh):
    spec, params, pos, neg, w = make_problem()
    pp = sharding.pad_params(params, 8)
    pp = sharding.shard_params(pp, spec, mesh)
    ent_shard = pp["entity_embedding"].sharding
    assert ent_shard.spec == jax.sharding.PartitionSpec("data", None)
    # each device holds Epad/8 rows
    Epad = pp["entity_embedding"].shape[0]
    shard_shapes = {s.data.shape for s in pp["entity_embedding"].addressable_shards}
    assert shard_shapes == {(Epad // 8, spec.entity_dim)}
    rel_shard_shapes = {
        s.data.shape for s in pp["relation_embedding"].addressable_shards
    }
    assert rel_shard_shapes == {pp["relation_embedding"].shape}  # replicated


def test_end_to_end_sharded_training_learns(mesh):
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=9, nrelation=2, seed=4)
    spec = ModelSpec(
        model_name="TransE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=16, gamma=4.0,
    )
    tspec = TrainSpec(negative_sample_size=8, batch_size=32)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    sampler = TrainSampler(ds.train, ds.nentity, ds.nrelation, 32, 8, "tail-batch", filters, seed=2)

    params = sharding.shard_params(
        sharding.pad_params(kge.init_params(spec, jax.random.PRNGKey(0)), 8), spec, mesh
    )
    state = sharding.shard_opt_state(optim.init_state(params), spec, mesh)
    step_fn = sharding.make_sharded_train_step(spec, tspec, mesh, "tail-batch")
    lr = jnp.float32(1e-2)
    losses = []
    for _ in range(60):
        pos, neg, w, _ = sampler.next_batch()
        pos_d, neg_d, w_d = sharding.shard_batch(mesh, jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w))
        params, state, logs = step_fn(params, state, pos_d, neg_d, w_d, lr)
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0] * 0.9
