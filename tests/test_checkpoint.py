"""Checkpoint/resume: bit-exact continuation (params, Adam moments, step,
lr, warm_up_steps), config.json round-trip + override semantics, and the
.npy table exports (SURVEY.md §5.4)."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import checkpoint as ckpt
from knowledgegraphembedding_tpu.config import ModelSpec, RunConfig, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.sampler import TrainSampler
from knowledgegraphembedding_tpu.train import Trainer


def setup(seed=0):
    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=6, nrelation=2, seed=seed)
    spec = ModelSpec(
        model_name="pRotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=8, gamma=6.0,
    )
    tspec = TrainSpec(negative_sample_size=4, batch_size=16)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    sampler = TrainSampler(ds.train, ds.nentity, ds.nrelation, 16, 4, "tail-batch", filters, seed=7)
    return ds, spec, tspec, sampler


def fixed_batches(sampler, n):
    return [sampler.next_batch() for _ in range(n)]


def test_resume_is_bit_exact(tmp_path):
    ds, spec, tspec, sampler = setup()
    params = kge.init_params(spec, jax.random.PRNGKey(0))
    batches = fixed_batches(sampler, 10)

    # uninterrupted run
    t_full = Trainer(spec, tspec, params, lr=1e-3, warm_up_steps=6)
    for b in batches:
        t_full.one_step((jnp.asarray(b[0]), jnp.asarray(b[1]), jnp.asarray(b[2]), b[3]))

    # interrupted at step 5 + resumed
    t_a = Trainer(spec, tspec, params, lr=1e-3, warm_up_steps=6)
    for b in batches[:5]:
        t_a.one_step((jnp.asarray(b[0]), jnp.asarray(b[1]), jnp.asarray(b[2]), b[3]))
    cfg = RunConfig(model="pRotatE", hidden_dim=8, gamma=6.0, save_path=str(tmp_path))
    ckpt.save_model(t_a, cfg, str(tmp_path))

    t_b = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(99)), lr=1.0, warm_up_steps=1)
    ckpt.restore_trainer(t_b, str(tmp_path))
    assert t_b.step == 5
    assert t_b.current_learning_rate == t_a.current_learning_rate
    assert t_b.warm_up_steps == t_a.warm_up_steps
    for b in batches[5:]:
        t_b.one_step((jnp.asarray(b[0]), jnp.asarray(b[1]), jnp.asarray(b[2]), b[3]))

    for k in t_full.params:
        np.testing.assert_array_equal(
            np.asarray(t_full.params[k]), np.asarray(t_b.params[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(t_full.opt_state.count), np.asarray(t_b.opt_state.count)
    )


def test_npy_exports_and_config(tmp_path):
    ds, spec, tspec, sampler = setup(seed=1)
    params = kge.init_params(spec, jax.random.PRNGKey(2))
    t = Trainer(spec, tspec, params, lr=1e-3, warm_up_steps=10)
    cfg = RunConfig(model="pRotatE", hidden_dim=8, gamma=6.0, save_path=str(tmp_path),
                    data_path="data/whatever", test_batch_size=7)
    ckpt.save_model(t, cfg, str(tmp_path))

    ent = np.load(os.path.join(tmp_path, "entity_embedding.npy"))
    rel = np.load(os.path.join(tmp_path, "relation_embedding.npy"))
    np.testing.assert_array_equal(ent, np.asarray(params["entity_embedding"]))
    np.testing.assert_array_equal(rel, np.asarray(params["relation_embedding"]))

    with open(os.path.join(tmp_path, "config.json")) as f:
        saved = json.load(f)
    assert saved["model"] == "pRotatE"
    assert saved["test_batch_size"] == 7

    # override_config: saved model hyperparams override the CLI namespace
    cfg2 = RunConfig(model="TransE", hidden_dim=999, init_checkpoint=str(tmp_path))
    cfg2 = ckpt.override_config(cfg2)
    assert cfg2.model == "pRotatE"
    assert cfg2.hidden_dim == 8
    assert cfg2.test_batch_size == 7
    assert cfg2.data_path == "data/whatever"


def test_async_save_bit_identical_and_donation_safe(tmp_path):
    """Async checkpoint (r2): the device-side snapshot + background write
    must produce BIT-identical artifacts to a synchronous save at the same
    step, and training continuing (donating the live buffers) while the
    write is in flight must not corrupt it."""
    from knowledgegraphembedding_tpu.cli import parse_args
    from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
    from knowledgegraphembedding_tpu.sampler import build_train_iterator

    ds = make_clustered_kg(n_clusters=4, entities_per_cluster=6, nrelation=2, seed=2)
    spec = ModelSpec(model_name="RotatE", nentity=ds.nentity,
                     nrelation=ds.nrelation, hidden_dim=8, gamma=6.0,
                     double_entity_embedding=True)
    tspec = TrainSpec(negative_sample_size=4, batch_size=16)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    trainer = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                      lr=1e-2, warm_up_steps=10**9)
    it = build_train_iterator(ds.train, ds.nentity, ds.nrelation, 16, 4,
                              filters, prefetch_depth=0)
    for _ in range(5):
        pos, neg, w, mode = next(it)
        trainer.one_step((jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode))

    config = parse_args(["--do_train", "--data_path", "x", "-save", "y",
                         "--model", "RotatE", "-de", "-d", "8"])
    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    ckpt.save_model(trainer, config, sync_dir)  # synchronous baseline
    ckpt.save_model(trainer, config, async_dir, asynchronous=True)
    # keep training IMMEDIATELY — donates the buffers the snapshot copied
    for _ in range(5):
        pos, neg, w, mode = next(it)
        trainer.one_step((jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w), mode))
    it.close()
    ckpt.wait_for_pending_save()

    za = np.load(os.path.join(sync_dir, "checkpoint.npz"))
    zb = np.load(os.path.join(async_dir, "checkpoint.npz"))
    assert set(za.files) == set(zb.files)
    for k in za.files:
        np.testing.assert_array_equal(za[k], zb[k], err_msg=k)
    # resume from the async checkpoint works
    t2 = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(1)),
                 lr=1e-2, warm_up_steps=10**9)
    ckpt.restore_trainer(t2, async_dir)
    assert t2.step == 5


def test_async_save_failure_surfaces(tmp_path):
    """A failed background write (disk full / bad path) must RAISE at the
    next wait/save, not vanish in the thread (r2 review)."""
    from knowledgegraphembedding_tpu.cli import parse_args

    _, spec, tspec, _ = setup()
    trainer = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                      lr=1e-2, warm_up_steps=10**9)
    config = parse_args(["--do_train", "--data_path", "x", "-save", "y"])
    bad = os.path.join(str(tmp_path / "blocker"))
    open(bad, "w").close()  # a FILE where a directory is needed
    ckpt.save_model(trainer, config, os.path.join(bad, "sub"),
                    asynchronous=True)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="background checkpoint write"):
        ckpt.wait_for_pending_save()
    ckpt.wait_for_pending_save()  # error consumed; next wait is clean


def test_check_pending_save_nonblocking(tmp_path):
    """check_pending_save: raises a prior async-write failure immediately
    (polled from the train loops' log windows) but never joins a healthy
    in-flight write (r3 advisor)."""
    import pytest as _pytest
    from knowledgegraphembedding_tpu.cli import parse_args

    _, spec, tspec, _ = setup()
    trainer = Trainer(spec, tspec, kge.init_params(spec, jax.random.PRNGKey(0)),
                      lr=1e-2, warm_up_steps=10**9)
    config = parse_args(["--do_train", "--data_path", "x", "-save", "y"])

    ckpt.check_pending_save()  # no pending state: no-op

    bad = os.path.join(str(tmp_path / "blocker2"))
    open(bad, "w").close()
    ckpt.save_model(trainer, config, os.path.join(bad, "sub"),
                    asynchronous=True)
    ckpt._pending_save.join()  # deterministic: let the failure land
    with _pytest.raises(RuntimeError, match="background checkpoint write"):
        ckpt.check_pending_save()
    ckpt.wait_for_pending_save()  # error consumed; clean afterwards
    ckpt.check_pending_save()
