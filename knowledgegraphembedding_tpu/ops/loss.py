"""Self-adversarial negative-sampling loss + L3 regularization.

Functional redesign of the loss section of the reference's
``KGEModel.train_step`` (reference: codes/model.py ≈L267-330).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import TrainSpec


def log_sigmoid(x):
    """Numerically-stable log(sigmoid(x)) == torch.nn.functional.logsigmoid."""
    return -jax.nn.softplus(-x)


def kge_loss(
    positive_score: jnp.ndarray,  # f32[B, 1] raw scores of true triples
    negative_score: jnp.ndarray,  # f32[B, n] raw scores of corrupted triples
    subsampling_weight: jnp.ndarray,  # f32[B]
    spec: TrainSpec,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Reproduces the reference loss exactly (codes/model.py ≈L285-315):

      - self-adversarial: weights = softmax(n_score * alpha, axis=1),
        **stop-gradient'd** (the reference calls .detach()), times
        logsigmoid(-n_score), summed over the negative axis; otherwise a
        plain mean of logsigmoid(-n_score).
      - positive term: logsigmoid(pos_score).
      - subsampling weighting (word2vec-style) unless uni_weight:
        loss_x = -(w * score_x).sum() / w.sum().
      - final loss = (pos_loss + neg_loss) / 2.
    """
    if spec.negative_adversarial_sampling:
        adv_w = jax.lax.stop_gradient(
            jax.nn.softmax(negative_score * spec.adversarial_temperature, axis=1)
        )
        neg_term = jnp.sum(adv_w * log_sigmoid(-negative_score), axis=1)
    else:
        neg_term = jnp.mean(log_sigmoid(-negative_score), axis=1)

    pos_term = log_sigmoid(positive_score)[:, 0]  # squeeze(dim=1)

    if spec.uni_weight:
        positive_sample_loss = -jnp.mean(pos_term)
        negative_sample_loss = -jnp.mean(neg_term)
    else:
        w = subsampling_weight
        wsum = jnp.sum(w)
        positive_sample_loss = -jnp.sum(w * pos_term) / wsum
        negative_sample_loss = -jnp.sum(w * neg_term) / wsum

    loss = (positive_sample_loss + negative_sample_loss) / 2
    logs = {
        "positive_sample_loss": positive_sample_loss,
        "negative_sample_loss": negative_sample_loss,
        "loss": loss,
    }
    return loss, logs


def kge_loss_global(
    positive_score: jnp.ndarray,  # f32[Bl, 1] THIS device's rows
    negative_score: jnp.ndarray,  # f32[Bl, n]
    subsampling_weight: jnp.ndarray,  # f32[Bl]
    spec: TrainSpec,
    axis_name: str,
    n_shards: int,
    ent_local: jnp.ndarray = None,
    rel_replicated: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The reference loss with GLOBAL normalization for SPMD bodies inside
    ``shard_map``: per-row terms computed locally, every reduction psum'd so
    all devices return the identical global scalars. Shared by the
    table-gather (shard_map_step.py) and row-routing (routed_step.py)
    schedules — their loss math must never diverge.

    L3 regularization: entity rows are locally owned (psum of per-shard
    sums); the REPLICATED relation term is divided by the mesh size inside
    the psum'd loss so VMA's automatic psum of its grads counts it exactly
    once."""
    if spec.negative_adversarial_sampling:
        adv_w = jax.lax.stop_gradient(
            jax.nn.softmax(negative_score * spec.adversarial_temperature, axis=1)
        )
        neg_term = jnp.sum(adv_w * log_sigmoid(-negative_score), axis=1)
    else:
        neg_term = jnp.mean(log_sigmoid(-negative_score), axis=1)
    pos_term = log_sigmoid(positive_score)[:, 0]

    if spec.uni_weight:
        denom = jnp.float32(pos_term.shape[0] * n_shards)
        positive_sample_loss = -jax.lax.psum(jnp.sum(pos_term), axis_name) / denom
        negative_sample_loss = -jax.lax.psum(jnp.sum(neg_term), axis_name) / denom
    else:
        w = subsampling_weight
        wsum = jax.lax.psum(jnp.sum(w), axis_name)
        positive_sample_loss = -jax.lax.psum(jnp.sum(w * pos_term), axis_name) / wsum
        negative_sample_loss = -jax.lax.psum(jnp.sum(w * neg_term), axis_name) / wsum

    loss = (positive_sample_loss + negative_sample_loss) / 2
    logs = {
        "positive_sample_loss": positive_sample_loss,
        "negative_sample_loss": negative_sample_loss,
        "loss": loss,
    }
    if spec.regularization != 0.0:
        ent_l3 = jax.lax.psum(jnp.sum(jnp.abs(ent_local) ** 3), axis_name)
        rel_l3_over_d = jax.lax.psum(
            jnp.sum(jnp.abs(rel_replicated) ** 3) / n_shards, axis_name
        )
        reg = spec.regularization * (ent_l3 + rel_l3_over_d)
        loss = loss + reg
        logs["regularization"] = reg
        logs["loss"] = loss
    return loss, logs


def l3_regularization(params, coeff: float) -> jnp.ndarray:
    """lambda * (||E||_3^3 + ||R||_3^3) over the *whole* tables
    (codes/model.py ≈L305-312 — note the reference regularizes every row,
    not just the rows touched this step)."""
    e = params["entity_embedding"]
    r = params["relation_embedding"]
    reg = jnp.sum(jnp.abs(e) ** 3) + jnp.sum(jnp.abs(r) ** 3)
    return coeff * reg
