"""Checkpoint save / resume.

Mirrors the reference's checkpoint *contents* exactly (reference:
codes/run.py §save_model ≈L103-130 and the ``-init`` resume path in §main):

  - ``config.json``    — vars(args) round-trip (override_config semantics)
  - ``checkpoint.npz`` — step, current_learning_rate, warm_up_steps, both
    embedding tables, pRotatE modulus, and the FULL Adam state (moments +
    per-instance step count) so resume is bit-exact
  - ``entity_embedding.npy`` / ``relation_embedding.npy`` — the reference's
    de-facto serving artifact, kept byte-compatible (plain .npy tables)

The storage format is npz rather than a torch pickle: host-portable,
mmap-able, and trivially shardable (each host can write its table rows; see
parallel/sharding.py for the sharded variant).
"""

from __future__ import annotations

import atexit
import dataclasses
import json
import os
import threading
from typing import Optional, Tuple

import jax
import numpy as np

from .config import RunConfig
from .optim import AdamState
from .train import Trainer

# args whose saved values override the CLI on resume
# (codes/run.py §override_config ≈L83-100). We additionally carry ``gamma``:
# the reference stores gamma inside model_state_dict (it is a non-trainable
# nn.Parameter, codes/model.py ≈L35), so torch.load restores it implicitly;
# here gamma lives in the jit-static ModelSpec, so the config round-trip is
# the equivalent restore path.
# NB: data_path is NOT here — the reference only falls back to the saved
# data_path when the CLI didn't provide one (codes/run.py §override_config:
# `if args.data_path is None`), so an explicit --data_path at resume time
# must win (e.g. evaluating a checkpoint on a different split directory).
OVERRIDE_KEYS = (
    "countries",
    "model",
    "double_entity_embedding",
    "double_relation_embedding",
    "hidden_dim",
    "gamma",
    "test_batch_size",
)


def _atomic_write(path: str, write_fn) -> None:
    """Write via temp file + os.replace so a crash mid-save can never leave
    a truncated artifact — the crash-recovery model (SURVEY.md §5.3) is
    'resume from the last checkpoint', which must therefore always be a
    COMPLETE one."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        write_fn(f)
    os.replace(tmp, path)


def save_config(config: RunConfig, save_path: str) -> None:
    os.makedirs(save_path, exist_ok=True)
    payload = json.dumps(dataclasses.asdict(config), indent=2).encode()
    _atomic_write(
        os.path.join(save_path, "config.json"), lambda f: f.write(payload)
    )


def override_config(config: RunConfig) -> RunConfig:
    """Apply the saved model hyperparameters on resume while keeping the
    rest of the CLI args (codes/run.py §override_config)."""
    with open(os.path.join(config.init_checkpoint, "config.json")) as f:
        saved = json.load(f)
    for k in OVERRIDE_KEYS:
        if k in saved:
            setattr(config, k, saved[k])
    if config.data_path is None:
        config.data_path = saved.get("data_path")
    return config


def _flatten(params, opt_state: AdamState, step: int, lr: float,
             warm_up_steps: int) -> dict:
    """THE checkpoint key layout — single implementation shared by the
    synchronous and the async-writer paths, so the two serializers can
    never drift apart."""
    arrays = {
        "step": np.int64(step),
        "current_learning_rate": np.float64(lr),
        "warm_up_steps": np.int64(warm_up_steps),
        "adam_count": np.asarray(opt_state.count),
    }
    for name, val in params.items():
        arrays[f"param.{name}"] = np.asarray(val)
    for name, val in opt_state.m.items():
        arrays[f"adam_m.{name}"] = np.asarray(val)
    for name, val in opt_state.v.items():
        arrays[f"adam_v.{name}"] = np.asarray(val)
    return arrays


def _flatten_state(trainer: Trainer) -> dict:
    params, opt_state = trainer.checkpoint_state()
    return _flatten(params, opt_state, trainer.step,
                    trainer.current_learning_rate, trainer.warm_up_steps)


# at most one save in flight; the next save (or interpreter exit, or an
# explicit wait) joins it first, so artifacts are always written in order
_pending_save: Optional[threading.Thread] = None
_pending_error: Optional[BaseException] = None


def wait_for_pending_save() -> None:
    """Join any in-flight background save and RE-RAISE its failure: a
    swallowed ENOSPC/permission error would let training run for hours
    believing checkpoints exist — the exact failure mode checkpoints are
    for."""
    global _pending_save, _pending_error
    if _pending_save is not None:
        _pending_save.join()
        _pending_save = None
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("background checkpoint write failed") from err


def check_pending_save() -> None:
    """Non-blocking failure probe for the background writer: raises
    immediately if an async save already failed, without joining an
    in-flight healthy one. Poll this from the train loop's log window so an
    ENOSPC/permission failure aborts within one log interval instead of
    surfacing a full checkpoint interval later (at the NEXT save_model)."""
    global _pending_error
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("background checkpoint write failed") from err


atexit.register(wait_for_pending_save)


def _write_artifacts(arrays: dict, config: RunConfig, save_path: str) -> None:
    save_config(config, save_path)
    _atomic_write(
        os.path.join(save_path, "checkpoint.npz"),
        lambda f: np.savez(f, **arrays),
    )
    _atomic_write(
        os.path.join(save_path, "entity_embedding.npy"),
        lambda f: np.save(f, arrays["param.entity_embedding"]),
    )
    _atomic_write(
        os.path.join(save_path, "relation_embedding.npy"),
        lambda f: np.save(f, arrays["param.relation_embedding"]),
    )


def save_model(trainer: Trainer, config: RunConfig, save_path: str,
               asynchronous: bool = False) -> None:
    """config.json + checkpoint.npz + the two .npy table exports
    (codes/run.py §save_model). Multi-host: gathering the sharded state is
    a COLLECTIVE — every process must run it or the fleet deadlocks — but
    only process 0 touches the filesystem.

    ``asynchronous`` (single-device trainers, single process): take a
    DEVICE-side snapshot of params + Adam state (an HBM copy, ~ms — needed
    because the train step donates the live buffers) and run the
    device→host pull + file writes on a background thread, so training
    never stalls on checkpoint IO (the state pull costs ~40 s per save on
    a remote-dispatch runtime, seconds over PCIe at YAGO scale). The saved
    artifacts are bit-identical to a synchronous save at the same step;
    crash recovery is unchanged (atomic tmp+rename — a crash mid-write
    leaves the previous complete checkpoint). Mesh/multi-host trainers
    fall back to the synchronous path (their state gather is a
    collective)."""
    wait_for_pending_save()  # serialize with any in-flight save
    use_async = (
        asynchronous
        and jax.process_count() == 1
        and getattr(trainer, "supports_async_checkpoint", False)
    )
    if not use_async:
        arrays = _flatten_state(trainer)
        if jax.process_index() != 0:
            return
        _write_artifacts(arrays, config, save_path)
        return

    import jax.numpy as jnp

    params, opt_state = trainer.checkpoint_state()
    snap_p = jax.tree.map(jnp.copy, params)
    snap_o = jax.tree.map(jnp.copy, opt_state)
    step, lr = trainer.step, trainer.current_learning_rate
    warm_up = trainer.warm_up_steps

    def _write():
        global _pending_error
        try:
            _write_artifacts(
                _flatten(snap_p, snap_o, step, lr, warm_up),
                config, save_path,
            )
        except BaseException as e:  # surfaced by wait_for_pending_save
            _pending_error = e

    global _pending_save
    _pending_save = threading.Thread(target=_write, name="kge-ckpt-writer")
    _pending_save.start()


def load_checkpoint(path: str) -> Tuple[dict, AdamState, int, float, int]:
    """Returns (params, adam_state, step, lr, warm_up_steps)."""
    z = np.load(os.path.join(path, "checkpoint.npz"))
    params = {}
    m = {}
    v = {}
    for key in z.files:
        if key.startswith("param."):
            params[key[len("param."):]] = jax.numpy.asarray(z[key])
        elif key.startswith("adam_m."):
            m[key[len("adam_m."):]] = jax.numpy.asarray(z[key])
        elif key.startswith("adam_v."):
            v[key[len("adam_v."):]] = jax.numpy.asarray(z[key])
    state = AdamState(count=jax.numpy.asarray(z["adam_count"]), m=m, v=v)
    return (
        params,
        state,
        int(z["step"]),
        float(z["current_learning_rate"]),
        int(z["warm_up_steps"]),
    )


def restore_trainer(
    trainer: Trainer, path: str
) -> Trainer:
    """In-place restore of a Trainer from a checkpoint dir (the reference's
    ``-init`` path: model + optimizer state + step/lr/warm_up)."""
    params, state, step, lr, warm_up = load_checkpoint(path)
    trainer.params = params
    trainer.opt_state = state
    trainer.step = step
    trainer.current_learning_rate = lr
    trainer.warm_up_steps = warm_up
    return trainer
