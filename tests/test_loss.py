"""Loss + full train-step gradient parity vs the torch oracle
(SURVEY.md §4 item a): self-adversarial weighting (detached), subsampling
weights, uni_weight, L3 regularization — values AND grads allclose."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu import train as train_mod

import oracle_torch as oracle

CASES = [
    ("TransE", False, False),
    ("ComplEx", True, True),
    ("RotatE", True, False),
    ("pRotatE", False, False),
]


def setup(model, de, dr, seed=0, B=6, n=8):
    spec = ModelSpec(
        model_name=model, nentity=40, nrelation=5, hidden_dim=12, gamma=10.0,
        double_entity_embedding=de, double_relation_embedding=dr,
    )
    rng = np.random.default_rng(seed)
    r = spec.embedding_range
    ent = rng.uniform(-r, r, (spec.nentity, spec.entity_dim)).astype(np.float32)
    rel = rng.uniform(-r, r, (spec.nrelation, spec.relation_dim)).astype(np.float32)
    pos = np.stack(
        [rng.integers(0, spec.nentity, B), rng.integers(0, spec.nrelation, B),
         rng.integers(0, spec.nentity, B)], axis=1,
    ).astype(np.int32)
    neg = rng.integers(0, spec.nentity, (B, n)).astype(np.int32)
    weight = rng.uniform(0.1, 1.0, B).astype(np.float32)
    return spec, ent, rel, pos, neg, weight


@pytest.mark.parametrize("model,de,dr", CASES)
@pytest.mark.parametrize("adv", [False, True])
@pytest.mark.parametrize("uni", [False, True])
@pytest.mark.parametrize("mode", ["head-batch", "tail-batch"])
def test_loss_and_grad_parity(model, de, dr, adv, uni, mode):
    spec, ent, rel, pos, neg, weight = setup(model, de, dr)
    reg = 1e-5 if model == "ComplEx" else 0.0
    tspec = TrainSpec(
        negative_sample_size=neg.shape[1],
        negative_adversarial_sampling=adv,
        adversarial_temperature=0.7,
        uni_weight=uni,
        regularization=reg,
    )
    modulus_val = 0.5 * spec.embedding_range

    def jax_loss(ent_j, rel_j, mod_j):
        params = {"entity_embedding": ent_j, "relation_embedding": rel_j}
        if spec.has_modulus:
            params["modulus"] = mod_j
        loss, logs = train_mod.loss_and_logs(
            params, spec, tspec, jnp.asarray(pos), jnp.asarray(neg),
            jnp.asarray(weight), mode,
        )
        return loss, logs

    (loss_j, logs_j), (g_ent, g_rel, g_mod) = jax.value_and_grad(
        jax_loss, argnums=(0, 1, 2), has_aux=True
    )(jnp.asarray(ent), jnp.asarray(rel), jnp.float32(modulus_val))

    ent_t = torch.tensor(ent, requires_grad=True)
    rel_t = torch.tensor(rel, requires_grad=True)
    mod_t = torch.tensor(modulus_val, requires_grad=True)
    loss_t, pos_l, neg_l = oracle.loss_fn(
        ent_t, rel_t, torch.tensor(pos, dtype=torch.long),
        torch.tensor(neg, dtype=torch.long), torch.tensor(weight), mode,
        model, spec.gamma, spec.embedding_range,
        modulus=mod_t if spec.has_modulus else None,
        adv=adv, adv_temp=0.7, uni_weight=uni, regularization=reg,
    )
    loss_t.backward()

    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        float(logs_j["positive_sample_loss"]), pos_l.item(), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        float(logs_j["negative_sample_loss"]), neg_l.item(), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_ent), ent_t.grad.numpy(), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_rel), rel_t.grad.numpy(), rtol=5e-4, atol=1e-6
    )
    if spec.has_modulus:
        np.testing.assert_allclose(
            np.asarray(g_mod), mod_t.grad.numpy(), rtol=5e-4, atol=1e-6
        )


def test_adv_weights_are_detached():
    """Self-adversarial softmax weights must carry NO gradient: compare
    against an explicit stop-grad construction."""
    spec, ent, rel, pos, neg, weight = setup("TransE", False, False, seed=7)
    tspec = TrainSpec(negative_adversarial_sampling=True, adversarial_temperature=1.3)

    def jax_loss(ent_j):
        params = {"entity_embedding": ent_j, "relation_embedding": jnp.asarray(rel)}
        loss, _ = train_mod.loss_and_logs(
            params, spec, tspec, jnp.asarray(pos), jnp.asarray(neg),
            jnp.asarray(weight), "tail-batch",
        )
        return loss

    g = jax.grad(jax_loss)(jnp.asarray(ent))

    # torch oracle WITHOUT detach would differ; with detach must match
    ent_t = torch.tensor(ent, requires_grad=True)
    loss_t, _, _ = oracle.loss_fn(
        ent_t, torch.tensor(rel), torch.tensor(pos, dtype=torch.long),
        torch.tensor(neg, dtype=torch.long), torch.tensor(weight),
        "tail-batch", "TransE", spec.gamma, spec.embedding_range,
        adv=True, adv_temp=1.3,
    )
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(g), ent_t.grad.numpy(), rtol=5e-4, atol=1e-6)
