"""The jitted training step and the host-side training loop.

TPU-native redesign of the reference's ``KGEModel.train_step``
(reference: codes/model.py ≈L267-330) and the orchestration loop in
codes/run.py §main ≈L280-340:

  - the whole forward+loss+backward+Adam step is ONE jitted function
    ``(params, opt_state, batch, lr) -> (params, opt_state, logs)``;
    mode ('head-batch'/'tail-batch') is a static argument, so exactly two
    programs are compiled and cached;
  - the learning rate is a runtime scalar — the one-shot LR decay
    (÷10 at warm_up_steps, fresh Adam, warm_up×3; codes/run.py ≈L300)
    happens on the host with zero recompiles;
  - device-host sync happens only when logs are read (every log_steps),
    not every step: logs are accumulated on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .config import ModelSpec, TrainSpec
from .models import kge, scorers
from .ops import loss as loss_ops
from .ops import matmul_scoring
from . import optim


def use_dense_scoring(spec: ModelSpec, tspec: TrainSpec) -> bool:
    """Dense (MXU matmul vs whole table) beats the row gather when the
    matmul's B·E·d MACs cost less than streaming B·n·d·4 random bytes —
    roughly when E < ~100·n on v5e (MXU ~2 orders cheaper per element than
    random HBM reads)."""
    if tspec.scoring == "gather":
        return False
    if not matmul_scoring.supports_dense(spec.model_name):
        if tspec.scoring == "dense":
            raise ValueError(f"{spec.model_name} has no dense bilinear form")
        return False
    if tspec.scoring == "dense":
        return True
    return spec.nentity <= 100 * tspec.negative_sample_size


def loss_and_logs(
    params: kge.Params,
    spec: ModelSpec,
    tspec: TrainSpec,
    pos: jnp.ndarray,  # i32[B, 3]
    neg: jnp.ndarray,  # i32[B, n]
    weight: jnp.ndarray,  # f32[B]
    mode: str,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    compute_dtype = jnp.bfloat16 if tspec.precision == "bf16" else None
    if use_dense_scoring(spec, tspec):
        # compute dtype FOLLOWS THE PARAMS when no mixed-precision override
        # is set: a hardcoded float32 here silently downcast the dense
        # matmul under jax_enable_x64 — found by the full-shape f64 parity
        # harness as a broad ~1e-10 param drift vs torch (the gather path
        # tracked to 1e-15; tools/full_shape_parity.py §leg_f64).
        negative_score = matmul_scoring.dense_negative_scores(
            spec, params, pos, neg, mode,
            compute_dtype=compute_dtype or params["entity_embedding"].dtype,
        )
    elif neg.shape[0] == 1 and pos.shape[0] > 1:
        # Shared negatives ([1, n] broadcast): rematerialize the negative
        # forward in the backward instead of storing its [B, n, d]
        # residuals (~1 GB each at the headline shape — the backward was
        # 3x the forward). Measured on-chip fwd+bwd 10.5 -> 7.4 ms (-30%);
        # the row re-gather is only 2B+n rows here, so recompute is cheap.
        # Per-positive negatives take the OTHER branch on purpose: their
        # recompute repeats the B*n-row gather — measured 28% SLOWER.
        negative_score = jax.checkpoint(
            lambda p: kge.forward(p, spec, (pos, neg), mode, compute_dtype)
        )(params)
    else:
        negative_score = kge.forward(params, spec, (pos, neg), mode, compute_dtype)
    positive_score = kge.forward(params, spec, pos, scorers.SINGLE, compute_dtype)
    loss, logs = loss_ops.kge_loss(positive_score, negative_score, weight, tspec)
    if tspec.regularization != 0.0:
        reg = loss_ops.l3_regularization(params, tspec.regularization)
        loss = loss + reg
        logs["regularization"] = reg
        logs["loss"] = loss  # the reference logs the regularized total
    return loss, logs


@functools.partial(
    jax.jit,
    static_argnames=("spec", "tspec", "mode"),
    donate_argnames=("params", "opt_state"),
)
def train_step(
    params: kge.Params,
    opt_state: optim.AdamState,
    pos: jnp.ndarray,
    neg: jnp.ndarray,
    weight: jnp.ndarray,
    lr: jnp.ndarray,
    *,
    spec: ModelSpec,
    tspec: TrainSpec,
    mode: str,
):
    grad_fn = jax.value_and_grad(
        lambda p: loss_and_logs(p, spec, tspec, pos, neg, weight, mode),
        has_aux=True,
    )
    (_, logs), grads = grad_fn(params)
    params, opt_state = optim.apply_update(params, grads, opt_state, lr)
    return params, opt_state, logs


class Trainer:
    """Host-side loop state: step counter, LR schedule with Adam reset,
    log accumulation. The analogue of codes/run.py §main's train loop."""

    #: checkpoint_state() is a cheap local (params, opt_state) read — safe
    #: to snapshot on-device and write from a background thread
    #: (checkpoint.py §save_model). Mesh trainers set False: their state
    #: gather is a collective every process must join synchronously.
    supports_async_checkpoint = True

    def __init__(self, spec: ModelSpec, tspec: TrainSpec, params, lr: float,
                 warm_up_steps: int, init_step: int = 0):
        self.spec = spec
        self.tspec = tspec
        # train_step donates its params/opt_state buffers (in-place update on
        # device); the Trainer takes ownership with a one-time copy so the
        # caller's pytree stays valid.
        self.params = jax.tree.map(jnp.copy, params)
        self.opt_state = optim.init_state(params)
        self.current_learning_rate = lr
        self.warm_up_steps = warm_up_steps
        self.step = init_step

    def checkpoint_state(self):
        """(params, opt_state) as stored on this trainer — the checkpoint
        payload. ShardedTrainer overrides with a padding-stripped host copy."""
        return self.params, self.opt_state

    def one_step(self, batch) -> Dict[str, jnp.ndarray]:
        pos, neg, weight, mode = batch
        step_idx = self.step
        self.params, self.opt_state, logs = train_step(
            self.params,
            self.opt_state,
            pos,
            neg,
            weight,
            # lr in the PARAMS dtype (f32 normally; f64 under jax_enable_x64
            # parity runs — jnp.float32(0.01) carries a 2e-10 relative error
            # that seeds measurable drift over hundreds of steps)
            jnp.asarray(self.current_learning_rate,
                        self.params["entity_embedding"].dtype),
            spec=self.spec,
            tspec=self.tspec,
            mode=mode,
        )
        self.step = step_idx + 1
        # codes/run.py ≈L300: the decay check runs AFTER the step body, so
        # step == warm_up_steps still trains at the old LR; the next step
        # sees lr/10, a FRESH Adam (moments + bias-correction count reset),
        # and warm_up_steps*3 (so it usually fires exactly once).
        if step_idx >= self.warm_up_steps:
            self.current_learning_rate = self.current_learning_rate / 10.0
            import logging

            logging.info(
                "Change learning_rate to %f at step %d",
                self.current_learning_rate, step_idx,
            )  # same line the reference emits (codes/run.py ≈L300)
            self.opt_state = optim.init_state(self.params)
            self.warm_up_steps = self.warm_up_steps * 3
        return logs
