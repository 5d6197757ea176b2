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


# ---------------------------------------------------------------------------
# Sharded checkpoint IO (SURVEY §5.4 "sharded-friendly format";
# VERDICT r2 next-round #5). The gather-to-process-0 path above is correct
# and fine at reference scales (1.9 GB YAGO), but at pod scale the whole
# fleet stalls while one host serializes the full table. Here every process
# writes ONLY its addressable blocks of the row-sharded leaves
# (entity table + its Adam moments) to its own npz —
# ``checkpoint.shard{p}-of-{n}.npz`` — while process 0 writes the small
# metadata npz (scalars + replicated leaves + global shapes). No collective,
# no full-table host copy on ANY process. Restore reads meta + every shard
# file and reassembles on ANY process count (including a single-process
# resume of a fleet checkpoint — the block index ranges are stored per
# block, so layout changes between save and restore are irrelevant).


def _shard_suffix(p: int, n: int) -> str:
    return f"shard{p:05d}-of-{n:05d}.npz"


def _host_leaf(val) -> np.ndarray:
    """Host copy of a REPLICATED leaf without a collective: a replicated
    global array is not fully addressable on a fleet, but every device's
    shard holds the full value."""
    if isinstance(val, jax.Array) and not val.is_fully_addressable:
        return np.asarray(val.addressable_shards[0].data)
    return np.asarray(val)


def _index_bounds(index, shape) -> np.ndarray:
    """(slice, slice) -> [r0, r1, c0, c1] with Nones resolved."""
    r, c = index
    return np.asarray(
        [r.start or 0, shape[0] if r.stop is None else r.stop,
         c.start or 0, shape[1] if c.stop is None else c.stop], np.int64)


def _sharded_state_arrays(trainer) -> Tuple[dict, dict]:
    """(local_blocks, meta_arrays) for the current process. Row-sharded
    leaves contribute addressable blocks locally; replicated leaves and
    scalars go to meta (written by process 0 only)."""
    # ``step`` is stamped into EVERY shard file as well as the meta npz:
    # per-file atomic replace cannot make a MULTI-file save atomic, so a
    # fleet preempted mid-save can leave shard files from two different
    # saves on disk — the load path hard-errors on a step mismatch instead
    # of silently resuming a mixed state.
    local: dict = {"step": np.int64(trainer.step)}
    meta: dict = {
        "sharded_shards": np.int64(jax.process_count()),
        "nentity": np.int64(trainer.spec.nentity),
        "step": np.int64(trainer.step),
        "current_learning_rate": np.float64(trainer.current_learning_rate),
        "warm_up_steps": np.int64(trainer.warm_up_steps),
        "adam_count": _host_leaf(trainer.opt_state.count),
    }
    for prefix, tree in (("param", trainer.params),
                         ("adam_m", trainer.opt_state.m),
                         ("adam_v", trainer.opt_state.v)):
        for name, val in tree.items():
            key = f"{prefix}.{name}"
            if isinstance(val, jax.Array) and not val.is_fully_replicated:
                meta[f"shape:{key}"] = np.asarray(val.shape, np.int64)
                for i, sh in enumerate(val.addressable_shards):
                    if sh.replica_id != 0:
                        # skip replicas: on a 2-D (data, model) mesh the
                        # relation table is P(None, 'model') — replicated
                        # across 'data' — so each column block appears on
                        # every data row; only replica 0 writes it (the
                        # guard is load-bearing TODAY, not future-proofing)
                        continue
                    local[f"{key}:block{i}"] = np.asarray(sh.data)
                    local[f"{key}:index{i}"] = _index_bounds(
                        sh.index, val.shape)
            else:
                meta[key] = _host_leaf(val)
    return local, meta


def _write_sharded_files(local: dict, meta: dict, config: RunConfig,
                         save_path: str) -> None:
    os.makedirs(save_path, exist_ok=True)
    p, n = jax.process_index(), jax.process_count()
    _atomic_write(
        os.path.join(save_path, "checkpoint." + _shard_suffix(p, n)),
        lambda f: np.savez(f, **local),
    )
    if p == 0:
        save_config(config, save_path)
        _atomic_write(
            os.path.join(save_path, "checkpoint.npz"),
            lambda f: np.savez(f, **meta),
        )


def save_model_sharded(trainer, config: RunConfig, save_path: str,
                       asynchronous: bool = False) -> None:
    """Per-process block writes; no state gather. The .npy table exports
    are NEVER written in sharded mode (they are inherently full-table
    artifacts; in --sharded_checkpoint runs even the final save stays
    shard-per-process) — produce them offline with
    ``tools/export_tables.py``.

    ``asynchronous``: unlike the full-state save, the sharded save has NO
    collective — every process touches only its own addressable blocks —
    so the device-snapshot + background-writer trick composes cleanly on
    fleets too. The main thread takes a per-device HBM copy of params +
    Adam state (~ms; required because the train step donates the live
    buffers) and the device→host block pull + per-process file writes run
    on a background thread. Artifacts are bit-identical to a synchronous
    save at the same step (pinned in tests/test_sharded_checkpoint.py),
    and the step-stamp consistency guard is unchanged — a fleet killed
    mid-async-save leaves mixed shard files that the load path hard-errors
    on, exactly like a mid-sync-save kill."""
    wait_for_pending_save()
    if not asynchronous:
        local, meta = _sharded_state_arrays(trainer)
        _write_sharded_files(local, meta, config, save_path)
        return

    import types

    import jax.numpy as jnp

    snap = types.SimpleNamespace(
        params=jax.tree.map(jnp.copy, trainer.params),
        opt_state=jax.tree.map(jnp.copy, trainer.opt_state),
        step=trainer.step,
        current_learning_rate=trainer.current_learning_rate,
        warm_up_steps=trainer.warm_up_steps,
        spec=trainer.spec,
    )

    def _write():
        global _pending_error
        try:
            local, meta = _sharded_state_arrays(snap)
            _write_sharded_files(local, meta, config, save_path)
        except BaseException as e:  # surfaced by wait_for_pending_save
            _pending_error = e

    global _pending_save
    _pending_save = threading.Thread(target=_write, name="kge-ckpt-writer")
    _pending_save.start()


def _load_sharded(path: str, meta) -> Tuple[dict, AdamState, int, float, int]:
    n = int(meta["sharded_shards"])
    nentity = int(meta["nentity"])
    step = int(meta["step"])
    full: dict = {}
    filled: dict = {}
    for p in range(n):
        fname = os.path.join(path, "checkpoint." + _shard_suffix(p, n))
        z = np.load(fname)
        if int(z["step"]) != step:
            raise RuntimeError(
                f"sharded checkpoint is inconsistent: {fname} is from step "
                f"{int(z['step'])} but checkpoint.npz says step {step} — a "
                "process was likely preempted mid-save; resume from an "
                "older consistent checkpoint instead of mixing saves")
        blocks = [k for k in z.files if ":block" in k]
        for bk in blocks:
            key, bi = bk.rsplit(":block", 1)
            if key not in full:
                shape = tuple(int(x) for x in meta[f"shape:{key}"])
                full[key] = np.empty(shape, z[bk].dtype)
                filled[key] = 0
            r0, r1, c0, c1 = z[f"{key}:index{bi}"]
            full[key][r0:r1, c0:c1] = z[bk]
            filled[key] += int(z[bk].size)
    for key, count in filled.items():
        want = int(np.prod(full[key].shape))
        if count != want:
            raise RuntimeError(
                f"sharded checkpoint block coverage for {key}: {count} of "
                f"{want} elements present across {n} shard files — a shard "
                "file is missing blocks (corrupt or layout-mismatched save)")
    trees: dict = {"param": {}, "adam_m": {}, "adam_v": {}}
    for source in (full, {k: meta[k] for k in meta.files
                          if k.split(".")[0] in trees and ":" not in k}):
        for key, val in source.items():
            prefix, name = key.split(".", 1)
            if name == "entity_embedding":
                val = val[:nentity]  # strip mesh padding rows
            trees[prefix][name] = jax.numpy.asarray(val)
    state = AdamState(count=jax.numpy.asarray(meta["adam_count"]),
                      m=trees["adam_m"], v=trees["adam_v"])
    return (
        trees["param"],
        state,
        int(meta["step"]),
        float(meta["current_learning_rate"]),
        int(meta["warm_up_steps"]),
    )


def is_sharded_checkpoint(path: str) -> bool:
    try:
        return "sharded_shards" in np.load(
            os.path.join(path, "checkpoint.npz")).files
    except OSError:
        return False


class _BlockCatalog:
    """Lazy index over a sharded checkpoint's block files.

    npz members decompress on ACCESS, so building the catalog touches only
    the tiny ``:index`` arrays (+ the step stamps); block payloads load on
    demand in :meth:`fill_slice` — the mechanism that lets a restoring
    process read only the bytes its own device shards need."""

    def __init__(self, path: str, n: int, expect_step: int):
        self._files: dict = {}
        self._entries: dict = {}  # key -> [(r0, r1, c0, c1, fname, blockkey)]
        for p in range(n):
            fname = os.path.join(path, "checkpoint." + _shard_suffix(p, n))
            z = np.load(fname)
            if int(z["step"]) != expect_step:
                raise RuntimeError(
                    f"sharded checkpoint is inconsistent: {fname} is from "
                    f"step {int(z['step'])} but checkpoint.npz says step "
                    f"{expect_step} — a process was likely preempted "
                    "mid-save; resume from an older consistent checkpoint")
            self._files[fname] = z
            for bk in z.files:
                if ":block" not in bk:
                    continue
                key, bi = bk.rsplit(":block", 1)
                r0, r1, c0, c1 = (int(x) for x in z[f"{key}:index{bi}"])
                self._entries.setdefault(key, []).append(
                    (r0, r1, c0, c1, fname, bk))

    def validate_coverage(self, key: str, saved_shape) -> None:
        """Index-only completeness check (no payload reads): the disjoint
        blocks must tile the saved array exactly."""
        total = sum((r1 - r0) * (c1 - c0)
                    for r0, r1, c0, c1, _, _ in self._entries.get(key, []))
        want = int(np.prod(saved_shape))
        if total != want:
            raise RuntimeError(
                f"sharded checkpoint block coverage for {key}: {total} of "
                f"{want} elements indexed across the shard files — a shard "
                "file is missing blocks (corrupt or layout-mismatched save)")

    def fill_slice(self, key: str, idx, out_shape, dtype) -> np.ndarray:
        """Assemble the target slice ``idx`` of the (possibly re-padded)
        global array, reading only intersecting blocks. Rows beyond the
        saved extent are zeros (mesh padding rows are zero by contract)."""
        r, c = idx
        r0t = r.start or 0
        r1t = out_shape[0] if r.stop is None else r.stop
        c0t = c.start or 0
        c1t = out_shape[1] if c.stop is None else c.stop
        out = np.zeros((r1t - r0t, c1t - c0t), dtype)
        for br0, br1, bc0, bc1, fname, bk in self._entries.get(key, []):
            ir0, ir1 = max(br0, r0t), min(br1, r1t)
            ic0, ic1 = max(bc0, c0t), min(bc1, c1t)
            if ir0 < ir1 and ic0 < ic1:
                block = self._files[fname][bk]
                out[ir0 - r0t:ir1 - r0t, ic0 - c0t:ic1 - c0t] = (
                    block[ir0 - br0:ir1 - br0, ic0 - bc0:ic1 - bc0])
        return out


def restore_trainer_sharded(trainer, path: str) -> None:
    """PROCESS-LOCAL restore of a mesh trainer from a per-shard checkpoint:
    each process materializes only its addressable device shards via
    ``jax.make_array_from_callback`` over the lazy block catalog — no
    process ever holds (or reads) the full table, which is the restore-side
    half of the pod-scale contract (``save_model_sharded`` is the save-side
    half; the generic ``load_checkpoint`` path still exists for
    single-device resumes and reassembles in host RAM).

    Works across LAYOUT CHANGES: the saved process/device count and row
    padding may differ from the restoring mesh — blocks are addressed by
    global row/col ranges, and rows beyond the saved extent are zeros
    (padding rows are zero by the pad_params contract)."""
    import jax.numpy as jnp

    meta = np.load(os.path.join(path, "checkpoint.npz"))
    if "sharded_shards" not in meta.files:
        raise ValueError(
            f"{path} is not a sharded checkpoint; use load_checkpoint")
    step = int(meta["step"])
    cat = _BlockCatalog(path, int(meta["sharded_shards"]), step)

    def build(key, template):
        saved_shape = tuple(int(x) for x in meta[f"shape:{key}"])
        cat.validate_coverage(key, saved_shape)
        return jax.make_array_from_callback(
            template.shape, template.sharding,
            lambda idx: cat.fill_slice(key, idx, template.shape,
                                       template.dtype))

    def restore_tree(prefix, tree):
        out = {}
        for name, val in tree.items():
            key = f"{prefix}.{name}"
            if f"shape:{key}" in meta.files:
                out[name] = build(key, val)
            else:
                host = np.asarray(meta[key])
                out[name] = jax.make_array_from_callback(
                    val.shape, val.sharding, lambda idx, h=host: h[idx])
        return out

    trainer.params = restore_tree("param", trainer.params)
    count = np.asarray(meta["adam_count"])
    tmpl = trainer.opt_state.count
    trainer.opt_state = AdamState(
        count=jax.make_array_from_callback(
            tmpl.shape, tmpl.sharding, lambda idx: count[idx]),
        m=restore_tree("adam_m", trainer.opt_state.m),
        v=restore_tree("adam_v", trainer.opt_state.v),
    )
    trainer.step = step
    trainer.current_learning_rate = float(meta["current_learning_rate"])
    trainer.warm_up_steps = int(meta["warm_up_steps"])


def load_checkpoint(path: str) -> Tuple[dict, AdamState, int, float, int]:
    """Returns (params, adam_state, step, lr, warm_up_steps). Transparently
    reassembles a per-shard fleet checkpoint (save_model_sharded) on any
    process count (in host RAM — mesh trainers should prefer the
    process-local ``restore_trainer_sharded``)."""
    z = np.load(os.path.join(path, "checkpoint.npz"))
    if "sharded_shards" in z.files:
        return _load_sharded(path, z)
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
