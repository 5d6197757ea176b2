"""Full-pipeline reference-trajectory parity (VERDICT r1, top next item).

The strongest dataset-free substitute for the published-results table: a
miniature REFERENCE trainer — pure PyTorch, torch.optim.Adam (the actual
reference optimizer), the oracle's loss (tests/oracle_torch.py) — consumes
the IDENTICAL batch stream our sampler produces, runs hundreds of steps at
a realistic config (RotatE, adversarial sampling, subsampling weights,
one-shot warm-up LR decay + Adam reset MID-run), and must land on the same
loss curve and the same filtered metrics as this framework.

Two legs, because f32 op-order chaos is real over hundreds of steps:

  1. f32 vs the REAL CLI (``cli.main``): per-window mean loss must track to
     ~1e-3 through the decay boundary (a semantic drift in weighting /
     normalization / LR handling shifts windows by >> 1e-2), and pooled
     filtered metrics must agree to eval-set granularity.
  2. f64 (torch double vs the jitted Trainer under jax_enable_x64), same
     recorded stream: op-order noise drops to ~1e-12, so ANY remaining
     difference is semantic. Final filtered MRR must match within ±0.002
     (measured slack ~1e-6) and the pooled rank vectors must be
     essentially identical.

Reference: codes/model.py §train_step ≈L267-330 + codes/run.py §main
≈L280-340 (train loop, warm_up decay, Adam reset).
"""

import re

import numpy as np
import pytest
import torch

import jax

from knowledgegraphembedding_tpu import cli
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_clustered_kg
from knowledgegraphembedding_tpu.data.vocab import save_dataset
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.sampler import build_train_iterator

import oracle_torch as oracle

SEED, B, N, D, G, LR = 0, 64, 32, 32, 6.0, 0.01
STEPS, LOG = 600, 100  # warm_up = 300: the decay + Adam reset fires mid-run


@pytest.fixture(scope="module")
def pipeline():
    """Dataset + the recorded stream both trainers consume."""
    ds = make_clustered_kg(
        n_clusters=4, entities_per_cluster=16, nrelation=4, seed=7,
        n_valid=64, n_test=512,  # 1024 pooled eval samples -> ~1e-3 metric granularity
    )
    filters = FilterSets.build(
        ds.train, np.concatenate([ds.train, ds.valid, ds.test]),
        ds.nentity, ds.nrelation,
    )
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=D, gamma=G, double_entity_embedding=True,
    )
    # identical constructor args to what cli.main builds for
    # --sampler_backend numpy --prefetch_depth 0 --seed SEED
    it = build_train_iterator(
        ds.train, ds.nentity, ds.nrelation, B, N, filters,
        seed=SEED, prefetch_depth=0, backend="numpy",
    )
    batches = [next(it) for _ in range(STEPS)]
    p0 = kge.init_params(spec, jax.random.PRNGKey(SEED))
    return ds, filters, spec, batches, p0


def run_torch_reference(p0, batches, spec, *, dtype, steps, warm_up, lr=LR):
    """codes/run.py §main's loop around codes/model.py §train_step, verbatim
    semantics: Adam(lr), after step >= warm_up -> lr/10, FRESH Adam,
    warm_up *= 3."""
    ent = torch.tensor(np.array(p0["entity_embedding"]), dtype=dtype,
                       requires_grad=True)
    rel = torch.tensor(np.array(p0["relation_embedding"]), dtype=dtype,
                       requires_grad=True)
    opt = torch.optim.Adam([ent, rel], lr=lr)
    windows, acc = [], 0.0
    for step in range(steps):
        pos, neg, w, mode = batches[step]
        loss, _, _ = oracle.loss_fn(
            ent, rel, torch.from_numpy(np.asarray(pos, np.int64)),
            torch.from_numpy(np.asarray(neg, np.int64)),
            torch.from_numpy(np.asarray(w)).to(dtype), mode, "RotatE",
            G, spec.embedding_range, adv=True, adv_temp=1.0, uni_weight=False)
        opt.zero_grad()
        loss.backward()
        opt.step()
        acc += float(loss.detach())
        if (step + 1) % LOG == 0:
            windows.append(acc / LOG)
            acc = 0.0
        if step >= warm_up:
            lr = lr / 10.0
            opt = torch.optim.Adam([ent, rel], lr=lr)
            warm_up *= 3
    return ent.detach(), rel.detach(), windows


def torch_filtered_ranks(ent, rel, test, filters, spec):
    """Reference test_step semantics (codes/model.py ≈L332-390): filtered
    rank of the true entity over ALL candidates, both directions, computed
    straight from the oracle's batch-layout scores."""
    E = spec.nentity
    ranks = []
    with torch.no_grad():
        for mode in ("head-batch", "tail-batch"):
            for i in range(0, len(test), 32):
                posn = np.asarray(test[i:i + 32], np.int64)
                pos = torch.from_numpy(posn)
                neg = torch.arange(E).unsqueeze(0).expand(len(pos), E)
                scores = oracle.forward(ent, rel, pos, neg, mode, "RotatE",
                                        G, spec.embedding_range)
                true = pos[:, 0] if mode == "head-batch" else pos[:, 2]
                true_score = scores.gather(1, true[:, None])
                mask = filters.filter_mask_rows(posn.astype(np.int32), mode)[:, :E]
                beats = ((scores > true_score) & ~torch.from_numpy(mask)
                         & (torch.arange(E)[None, :] != true[:, None]))
                ranks.extend((beats.sum(1) + 1).tolist())
    return np.asarray(ranks, np.float64)


def metrics_of(ranks):
    return {
        "MRR": float(np.mean(1.0 / ranks)),
        "HITS@1": float(np.mean(ranks <= 1)),
        "HITS@3": float(np.mean(ranks <= 3)),
        "HITS@10": float(np.mean(ranks <= 10)),
    }


def test_f32_cli_trajectory_parity(pipeline, tmp_path):
    """Leg 1: torch mini-reference vs the actual CLI, identical stream."""
    ds, filters, spec, batches, p0 = pipeline
    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "save")
    save_dataset(ds, data_dir)

    ent, rel, t_windows = run_torch_reference(
        p0, batches, spec, dtype=torch.float32, steps=STEPS, warm_up=STEPS // 2)
    t_metrics = metrics_of(torch_filtered_ranks(ent, rel, ds.test, filters, spec))

    final = cli.main([
        "--do_train", "--do_test", "--data_path", data_dir, "--model",
        "RotatE", "-de", "-n", str(N), "-b", str(B), "-d", str(D),
        "-g", str(G), "-adv", "-a", "1.0", "-lr", str(LR),
        "--max_steps", str(STEPS), "--log_steps", str(LOG),
        "--test_batch_size", "8", "--sampler_backend", "numpy",
        "--prefetch_depth", "0", "--seed", str(SEED), "-save", save_dir,
    ])
    j_metrics = final["test"]
    log_text = open(save_dir + "/train.log").read()
    j_windows = [float(x) for x in re.findall(
        r"Training average loss at step \d+: ([0-9.]+)", log_text)]

    assert len(j_windows) == len(t_windows) == STEPS // LOG
    # measured drift: 7e-7 (window 1) growing to ~2e-4 (window 6) — pure
    # f32 op-order noise; a semantic drift moves windows by >> 1e-2
    np.testing.assert_allclose(j_windows, t_windows, rtol=0, atol=1.5e-3)
    # 1024 pooled samples: each borderline rank flip moves MRR by <= ~1e-3;
    # measured f32 end-state disagreement is a handful of flips
    for k in ("MRR", "HITS@1", "HITS@3", "HITS@10"):
        assert abs(j_metrics[k] - t_metrics[k]) <= 0.02, (
            k, j_metrics[k], t_metrics[k])


def test_f64_exact_trajectory_parity(pipeline):
    """Leg 2: with f64 on both sides the op-order noise floor is ~1e-12 —
    final filtered MRR must agree within ±0.002 (the published-table bar),
    and in practice to ~1e-6. Catches ANY semantic interaction drift."""
    ds, filters, spec, batches, p0 = pipeline
    steps, warm_up = 400, 200  # decay + Adam reset fires mid-run

    ent, rel, t_windows = run_torch_reference(
        p0, batches, spec, dtype=torch.float64, steps=steps, warm_up=warm_up)
    t_ranks = torch_filtered_ranks(ent, rel, ds.test, filters, spec)

    jax.config.update("jax_enable_x64", True)
    try:
        from knowledgegraphembedding_tpu import eval as eval_mod
        from knowledgegraphembedding_tpu.train import Trainer

        p64 = {k: np.asarray(v, np.float64) for k, v in p0.items()}
        tspec = TrainSpec(
            negative_sample_size=N, negative_adversarial_sampling=True,
            adversarial_temperature=1.0, uni_weight=False, regularization=0.0,
        )
        trainer = Trainer(spec, tspec, p64, lr=LR, warm_up_steps=warm_up)
        import jax.numpy as jnp

        j_windows, acc = [], 0.0
        for step in range(steps):
            pos, neg, w, mode = batches[step]
            logs = trainer.one_step((
                jnp.asarray(pos), jnp.asarray(neg),
                jnp.asarray(np.asarray(w, np.float64)), mode,
            ))
            acc += float(logs["loss"])
            if (step + 1) % LOG == 0:
                j_windows.append(acc / LOG)
                acc = 0.0

        np.testing.assert_allclose(j_windows, t_windows, rtol=0, atol=1e-8)

        j_metrics = eval_mod.test_step(
            trainer.params, spec, ds.test, filters,
            test_batch_size=32, eval_chunk_size=64,
            use_pallas=False, device_filter=False,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    t_metrics = metrics_of(t_ranks)
    for k in ("MRR", "HITS@1", "HITS@3", "HITS@10"):
        assert abs(j_metrics[k] - t_metrics[k]) <= 0.002, (
            k, j_metrics[k], t_metrics[k])


MODEL_VARIANTS = [
    # (model, de, dr, adv, uni_weight, reg) — each exercises a different
    # loss-variant INTERACTION against the torch reference: L3 whole-table
    # regularization, uniform weighting, the trainable pRotatE modulus
    ("TransE", False, False, False, False, 0.0),
    ("DistMult", False, False, False, True, 1e-5),
    ("ComplEx", True, True, True, False, 2e-6),
    ("pRotatE", False, False, True, False, 0.0),
]


@pytest.mark.parametrize("model,de,dr,adv,uni,reg", MODEL_VARIANTS)
def test_f64_exact_all_models(pipeline, model, de, dr, adv, uni, reg):
    """The f64-exact trajectory guarantee for the other four model families
    (and the loss variants the RotatE leg doesn't touch): 200 steps through
    the mid-run decay, identical stream, params ~1e-12, MRR within ±0.002."""
    ds, filters, _, batches, _ = pipeline
    spec = ModelSpec(
        model_name=model, nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=D, gamma=G, double_entity_embedding=de,
        double_relation_embedding=dr,
    )
    steps, warm_up, lr = 200, 100, LR
    p0 = kge.init_params(spec, jax.random.PRNGKey(SEED))

    # --- torch double reference (oracle loss + torch.optim.Adam) ---
    ent = torch.tensor(np.array(p0["entity_embedding"]), dtype=torch.float64,
                       requires_grad=True)
    rel = torch.tensor(np.array(p0["relation_embedding"]), dtype=torch.float64,
                       requires_grad=True)
    leaves = [ent, rel]
    modulus = None
    if spec.has_modulus:
        modulus = torch.tensor(float(p0["modulus"]), dtype=torch.float64,
                               requires_grad=True)
        leaves.append(modulus)
    opt = torch.optim.Adam(leaves, lr=lr)
    w_up, cur_lr = warm_up, lr
    t_losses = []
    for step in range(steps):
        pos, neg, w, mode = batches[step]
        loss, _, _ = oracle.loss_fn(
            ent, rel, torch.from_numpy(np.asarray(pos, np.int64)),
            torch.from_numpy(np.asarray(neg, np.int64)),
            torch.from_numpy(np.asarray(w)).to(torch.float64), mode, model,
            G, spec.embedding_range, modulus=modulus, adv=adv, adv_temp=1.0,
            uni_weight=uni, regularization=reg)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if step >= w_up:
            cur_lr /= 10.0
            opt = torch.optim.Adam(leaves, lr=cur_lr)
            w_up *= 3

    # --- JAX f64 through the jitted Trainer ---
    jax.config.update("jax_enable_x64", True)
    try:
        from knowledgegraphembedding_tpu import eval as eval_mod
        from knowledgegraphembedding_tpu.train import Trainer
        import jax.numpy as jnp

        p64 = {k: np.asarray(v, np.float64) for k, v in p0.items()}
        tspec = TrainSpec(
            negative_sample_size=N, negative_adversarial_sampling=adv,
            adversarial_temperature=1.0, uni_weight=uni, regularization=reg,
            scoring="gather",  # the oracle's form; dense is pinned elsewhere
        )
        trainer = Trainer(spec, tspec, p64, lr=lr, warm_up_steps=warm_up)
        j_losses = []
        for step in range(steps):
            pos, neg, w, mode = batches[step]
            logs = trainer.one_step((
                jnp.asarray(pos), jnp.asarray(neg),
                jnp.asarray(np.asarray(w, np.float64)), mode,
            ))
            j_losses.append(float(logs["loss"]))
        np.testing.assert_allclose(j_losses, t_losses, rtol=0, atol=1e-9)
        if spec.has_modulus:
            np.testing.assert_allclose(
                float(trainer.params["modulus"]), float(modulus.detach()),
                rtol=0, atol=1e-12)
        j_metrics = eval_mod.test_step(
            trainer.params, spec, ds.test, filters,
            test_batch_size=32, eval_chunk_size=64,
            use_pallas=False, device_filter=False,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    t_ranks = []
    with torch.no_grad():
        E = spec.nentity
        for mode in ("head-batch", "tail-batch"):
            for i in range(0, len(ds.test), 32):
                posn = np.asarray(ds.test[i:i + 32], np.int64)
                pos_t = torch.from_numpy(posn)
                negs = torch.arange(E).unsqueeze(0).expand(len(pos_t), E)
                scores = oracle.forward(ent, rel, pos_t, negs, mode, model,
                                        G, spec.embedding_range,
                                        modulus=modulus)
                true = pos_t[:, 0] if mode == "head-batch" else pos_t[:, 2]
                true_score = scores.gather(1, true[:, None])
                mask = filters.filter_mask_rows(posn.astype(np.int32), mode)[:, :E]
                beats = ((scores > true_score) & ~torch.from_numpy(mask)
                         & (torch.arange(E)[None, :] != true[:, None]))
                t_ranks.extend((beats.sum(1) + 1).tolist())
    t_metrics = metrics_of(np.asarray(t_ranks, np.float64))
    for k in ("MRR", "HITS@1", "HITS@3", "HITS@10"):
        assert abs(j_metrics[k] - t_metrics[k]) <= 0.002, (
            model, k, j_metrics[k], t_metrics[k])


def test_f64_exact_dense_scoring_path(pipeline):
    """The dense MXU scoring path (one matmul vs the whole table + take)
    must ride the same f64-exact trajectory as the torch gather reference —
    pins the dense path's backward + Adam interaction, not just its
    per-step scores."""
    ds, filters, _, batches, _ = pipeline
    spec = ModelSpec(
        model_name="DistMult", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=D, gamma=G,
    )
    steps, warm_up = 150, 75
    p0 = kge.init_params(spec, jax.random.PRNGKey(SEED))

    ent = torch.tensor(np.array(p0["entity_embedding"]), dtype=torch.float64,
                       requires_grad=True)
    rel = torch.tensor(np.array(p0["relation_embedding"]), dtype=torch.float64,
                       requires_grad=True)
    opt = torch.optim.Adam([ent, rel], lr=LR)
    w_up, cur_lr = warm_up, LR
    t_losses = []
    for step in range(steps):
        pos, neg, w, mode = batches[step]
        loss, _, _ = oracle.loss_fn(
            ent, rel, torch.from_numpy(np.asarray(pos, np.int64)),
            torch.from_numpy(np.asarray(neg, np.int64)),
            torch.from_numpy(np.asarray(w)).to(torch.float64), mode,
            "DistMult", G, spec.embedding_range, adv=True, adv_temp=1.0)
        opt.zero_grad(); loss.backward(); opt.step()
        t_losses.append(float(loss.detach()))
        if step >= w_up:
            cur_lr /= 10.0
            opt = torch.optim.Adam([ent, rel], lr=cur_lr)
            w_up *= 3

    jax.config.update("jax_enable_x64", True)
    try:
        from knowledgegraphembedding_tpu.train import Trainer
        import jax.numpy as jnp

        p64 = {k: np.asarray(v, np.float64) for k, v in p0.items()}
        tspec = TrainSpec(
            negative_sample_size=N, negative_adversarial_sampling=True,
            adversarial_temperature=1.0, scoring="dense",
        )
        trainer = Trainer(spec, tspec, p64, lr=LR, warm_up_steps=warm_up)
        j_losses = []
        for step in range(steps):
            pos, neg, w, mode = batches[step]
            logs = trainer.one_step((
                jnp.asarray(pos), jnp.asarray(neg),
                jnp.asarray(np.asarray(w, np.float64)), mode,
            ))
            j_losses.append(float(logs["loss"]))
    finally:
        jax.config.update("jax_enable_x64", False)
    # the dense path reduces over d in a DIFFERENT order (matmul) than the
    # torch gather reference, so ~1e-15 reassociation noise per score
    # amplifies chaotically — measured 1.8e-8 at step 150; a semantic
    # drift (wrong take/backward) would sit orders above this bound
    np.testing.assert_allclose(j_losses, t_losses, rtol=0, atol=1e-6)
