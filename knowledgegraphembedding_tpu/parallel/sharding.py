"""Multi-chip sharding over a ``jax.sharding.Mesh``.

The reference is strictly single-device (SURVEY.md §2.3: no
torch.distributed/NCCL anywhere); this module is the from-scratch TPU scale
path demanded by the north star:

  - 1-D mesh over the ``data`` axis (chips within a slice ride ICI; multiple
    hosts extend the same axis over DCN via ``jax.distributed.initialize``).
  - **Entity table row-sharded**: ``PartitionSpec('data', None)`` — the KGE
    analogue of expert/vocab parallelism. Adam moments shard identically, so
    the dense per-shard update touches only local HBM.
  - **Relation table + modulus replicated**: relation grads are combined by
    GSPMD with a ``psum`` over ``data``.
  - **Triple stream edge-partitioned**: pos/neg/weight batches sharded on
    the batch axis (each host samples its shard; the driver here shards a
    host-global batch).
  - Gathers from the row-sharded table are partitioned by GSPMD/XLA into
    collective gather/all-to-all exchanges — the 'annotate shardings, let
    XLA insert collectives' recipe. (A hand-scheduled shard_map/ragged
    all-to-all variant is the planned optimization once this baseline is
    profiled.)

Everything compiles and runs identically on the virtual
``--xla_force_host_platform_device_count=8`` CPU mesh used in CI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelSpec, TrainSpec
from ..models import kge
from .. import optim
from ..train import loss_and_logs

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(n_devices: Optional[int] = None,
               model_shards: int = 1) -> Mesh:
    """Device mesh: 1-D over ``data`` (the default), or 2-D
    ``(data, model)`` when ``model_shards > 1`` — the embedding-dim axis
    of the tables shards over ``model`` (GSPMD partitions the gathers,
    scorer reductions, and Adam sweep over both axes; the batch stays
    data-parallel only)."""
    devs = np.asarray(jax.devices())
    if model_shards > 1:
        data = (n_devices if n_devices is not None
                else len(devs) // model_shards)
        total = data * model_shards
    else:
        total = n_devices if n_devices is not None else len(devs)
    if total <= 0 or total > len(devs):
        raise ValueError(
            f"requested a {total}-device mesh "
            f"({model_shards} model shards) but only "
            f"{len(devs)} devices are available"
        )
    devs = devs[:total]
    if model_shards > 1:
        grid = devs.reshape(-1, model_shards)
        if jax.process_count() > 1:
            # the multihost batch stream assigns each host its data-rows:
            # a row straddling hosts would break that mapping silently
            # (the count check in cli.py cannot see placement)
            check_rows_single_process(
                [[d.process_index for d in row] for row in grid]
            )
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(devs, (DATA_AXIS,))


def check_rows_single_process(rows_process_indices) -> None:
    """Every 2-D-mesh data-row must live on ONE process (pure function so
    the straddle guard is unit-testable without faking device objects)."""
    for row in rows_process_indices:
        procs = set(row)
        if len(procs) > 1:
            raise ValueError(
                "2-D mesh data-row spans processes "
                f"{sorted(procs)}; choose --model_shards so each "
                "host's devices fill whole rows"
            )


def is_model_sharded(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.axis_names


def validate_model_sharding(spec: ModelSpec, mesh: Mesh) -> None:
    """Column sharding must divide both table widths EXACTLY — padding the
    embedding dim would corrupt the re/im half-split the complex-family
    scorers slice at dim//2."""
    if not is_model_sharded(mesh):
        return
    m = mesh.shape[MODEL_AXIS]
    if spec.entity_dim % m or spec.relation_dim % m:
        raise ValueError(
            f"--model_shards {m} must divide entity_dim "
            f"({spec.entity_dim}) and relation_dim ({spec.relation_dim})"
        )


def param_specs(spec: ModelSpec, model_sharded: bool = False) -> dict:
    col = MODEL_AXIS if model_sharded else None
    specs = {
        "entity_embedding": P(DATA_AXIS, col),  # rows x (optionally) cols
        "relation_embedding": P(None, col),  # replicated over data
    }
    if spec.has_modulus:
        specs["modulus"] = P()
    return specs


def opt_specs(spec: ModelSpec, model_sharded: bool = False) -> optim.AdamState:
    ps = param_specs(spec, model_sharded)
    return optim.AdamState(count=P(), m=dict(ps), v=dict(ps))


def batch_specs(shared_negatives: bool = False) -> Tuple:
    # shared-negative batches are [1, n] and must replicate; per-positive
    # negatives shard with the batch axis
    neg = P(None, None) if shared_negatives else P(DATA_AXIS, None)
    return P(DATA_AXIS, None), neg, P(DATA_AXIS)


def _named(mesh: Mesh, tree_specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree_specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def _place(value, sharding: NamedSharding):
    """Host array -> global device array under ``sharding``.

    Single-process: plain device_put. Multi-process: every host holds the
    SAME full host copy (identical PRNG init / identical checkpoint), so
    each host contributes its addressable shards via
    ``make_array_from_callback`` — device_put cannot build an array spanning
    non-addressable devices."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    if isinstance(value, jax.Array) and not value.is_fully_addressable:
        # already a global array (e.g. zeros_like of sharded params):
        # device_put reshards on-device, no host round trip
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def shard_params(params: kge.Params, spec: ModelSpec, mesh: Mesh) -> kge.Params:
    """Place an (unsharded) param pytree onto the mesh. Entity rows must
    divide the mesh for even layout; pad_entities() handles ragged tables."""
    sh = _named(mesh, param_specs(spec, is_model_sharded(mesh)))
    return jax.tree.map(_place, params, sh)


def shard_opt_state(state: optim.AdamState, spec: ModelSpec, mesh: Mesh) -> optim.AdamState:
    sh = _named(mesh, opt_specs(spec, is_model_sharded(mesh)))
    return jax.tree.map(_place, state, sh)


def shard_batch(mesh: Mesh, pos, neg, weight):
    pos_s, neg_s, w_s = batch_specs(shared_negatives=neg.shape[0] == 1)
    return (
        jax.device_put(pos, NamedSharding(mesh, pos_s)),
        jax.device_put(neg, NamedSharding(mesh, neg_s)),
        jax.device_put(weight, NamedSharding(mesh, w_s)),
    )


def make_sharded_train_step(spec: ModelSpec, tspec: TrainSpec, mesh: Mesh,
                            mode: str, shared_negatives: bool = False):
    """jit-compiled SPMD train step with explicit in/out shardings.

    The functional body is IDENTICAL to the single-chip path
    (train.loss_and_logs + optim.apply_update) — only the placement
    annotations differ; GSPMD inserts the collectives (row-gather exchange
    for entity lookups, psum for replicated relation grads, psum for the
    batch-reduced loss terms).
    """
    two_d = is_model_sharded(mesh)
    p_specs = param_specs(spec, two_d)
    o_specs = opt_specs(spec, two_d)
    pos_s, neg_s, w_s = batch_specs(shared_negatives)

    def step(params, opt_state, pos, neg, weight, lr):
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_logs(p, spec, tspec, pos, neg, weight, mode),
            has_aux=True,
        )
        (_, logs), grads = grad_fn(params)
        params, opt_state = optim.apply_update(params, grads, opt_state, lr)
        return params, opt_state, logs

    in_sh = (
        _named(mesh, p_specs),
        _named(mesh, o_specs),
        NamedSharding(mesh, pos_s),
        NamedSharding(mesh, neg_s),
        NamedSharding(mesh, w_s),
        NamedSharding(mesh, P()),
    )
    out_sh = (
        _named(mesh, p_specs),
        _named(mesh, o_specs),
        None,  # scalar logs: let XLA replicate
    )
    return jax.jit(step, in_shardings=in_sh, out_shardings=out_sh,
                   donate_argnums=(0, 1))


def pad_params(params: kge.Params, n_shards: int) -> kge.Params:
    """Zero-pad the entity table's row count up to a multiple of the shard
    count so the row-shard is even. ``spec.nentity`` stays the LOGICAL
    count: the sampler only draws ids < nentity, eval masks candidates >=
    nentity, and zero pad rows contribute exactly 0 to the L3 regularizer
    (|0|^3) and receive 0 gradient, so they stay zero forever — no parity
    drift."""
    ent = params["entity_embedding"]
    E = ent.shape[0]
    Epad = -(-E // n_shards) * n_shards
    if Epad != E:
        params = dict(params)
        params["entity_embedding"] = jnp.pad(ent, ((0, Epad - E), (0, 0)))
    return params


# jitted replication programs cached per mesh: a fresh jit(lambda) per leaf
# per checkpoint save would retrace+recompile the all_gather every time
_replicate_jit_cache: dict = {}


def _replicate_fn(mesh: Mesh):
    key = (mesh.axis_names, tuple(d.id for d in mesh.devices.flat))
    fn = _replicate_jit_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
        _replicate_jit_cache[key] = fn
    return fn


def replicate_to_host(params: kge.Params) -> kge.Params:
    """Gather a (possibly sharded) param tree to host numpy (checkpointing).

    Multi-process: a row-sharded global array is not fully addressable on
    any one host, so replicate it on-device first (an all_gather over ICI),
    then read the local copy."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)

    def to_host(x):
        if not isinstance(x, jax.Array) or x.is_fully_addressable:
            return np.asarray(jax.device_get(x))
        repl = _replicate_fn(x.sharding.mesh)(x)
        return np.asarray(repl.addressable_shards[0].data)

    return jax.tree.map(to_host, params)


class ShardedTrainer:
    """Mesh-parallel drop-in for train.Trainer: same step/LR-decay/Adam-reset
    semantics (codes/run.py §main ≈L280-340), with the entity table
    row-sharded and the batch data-parallel. Keeps one compiled program per
    (mode) thanks to the runtime-scalar learning rate."""

    supports_async_checkpoint = False  # state gather is a collective

    def __init__(self, spec: ModelSpec, tspec: TrainSpec, params, lr: float,
                 warm_up_steps: int, mesh: Mesh, init_step: int = 0,
                 shared_negatives: bool = False, spmd_mode: str = "gspmd"):
        self.spec = spec
        self.tspec = tspec
        self.mesh = mesh
        if is_model_sharded(mesh):
            if spmd_mode != "gspmd":
                raise ValueError(
                    "2-D (model-sharded) meshes run --spmd_mode gspmd only "
                    "(the hand-scheduled schedules are written for the 1-D "
                    f"row shard); got {spmd_mode!r}"
                )
            validate_model_sharding(spec, mesh)
        n_rows = mesh.shape[DATA_AXIS]
        self.params = shard_params(pad_params(params, n_rows), spec, mesh)
        self.opt_state = shard_opt_state(optim.init_state(self.params), spec, mesh)
        self.current_learning_rate = lr
        self.warm_up_steps = warm_up_steps
        self.step = init_step
        if spmd_mode == "shardmap":
            from .shard_map_step import make_shardmap_train_step as make_fn
        elif spmd_mode == "routed":
            from .routed_step import make_routed_train_step as make_fn
        elif spmd_mode == "gspmd":
            make_fn = make_sharded_train_step
        else:
            raise ValueError(
                f"spmd_mode {spmd_mode!r} not in ('gspmd', 'shardmap', 'routed')"
            )
        self._fns = {
            mode: make_fn(spec, tspec, mesh, mode,
                          shared_negatives=shared_negatives)
            for mode in ("head-batch", "tail-batch")
        }

    def host_params(self) -> kge.Params:
        """Unsharded host copy with padding rows stripped (checkpointing)."""
        p = replicate_to_host(self.params)
        p["entity_embedding"] = p["entity_embedding"][: self.spec.nentity]
        return p

    def checkpoint_state(self):
        p = self.host_params()
        E = self.spec.nentity
        m_full = replicate_to_host(self.opt_state.m)
        v_full = replicate_to_host(self.opt_state.v)
        m = {k: v[:E] if k == "entity_embedding" else v
             for k, v in m_full.items()}
        v_ = {k: v[:E] if k == "entity_embedding" else v
              for k, v in v_full.items()}
        state = optim.AdamState(count=np.asarray(self.opt_state.count), m=m, v=v_)
        return p, state

    def load_host_state(self, params, opt_state, step, lr, warm_up_steps):
        """Restore from an (unsharded) checkpoint onto the mesh."""
        n = self.mesh.shape[DATA_AXIS]
        self.params = shard_params(pad_params(params, n), self.spec, self.mesh)
        # Adam moments shard exactly like the params, so they pad the same
        m = pad_params(dict(opt_state.m), n)
        v = pad_params(dict(opt_state.v), n)
        state = optim.AdamState(count=opt_state.count, m=m, v=v)
        self.opt_state = shard_opt_state(state, self.spec, self.mesh)
        self.step = step
        self.current_learning_rate = lr
        self.warm_up_steps = warm_up_steps

    def one_step(self, batch):
        """batch holds THIS HOST's rows (the full batch single-process; the
        local shard of the global batch on a multi-host fleet) — OR, from
        the mesh device sampler, already-global device arrays, consumed
        as-is with zero host-side assembly."""
        from . import multihost

        pos, neg, weight, mode = batch
        step_idx = self.step
        if isinstance(pos, jax.Array):
            # device-sampled global batch (sampler/device_sampler.py
            # §MeshDeviceSampler): already laid out per batch_specs
            pos_d, neg_d, w_d = pos, neg, weight
        else:
            pos_d, neg_d, w_d = multihost.global_batch(
                self.mesh, np.asarray(pos), np.asarray(neg),
                np.asarray(weight, np.float32),
            )
        self.params, self.opt_state, logs = self._fns[mode](
            self.params, self.opt_state, pos_d, neg_d, w_d,
            jnp.float32(self.current_learning_rate),
        )
        self.step = step_idx + 1
        if step_idx >= self.warm_up_steps:  # same one-shot decay as Trainer
            self.current_learning_rate /= 10.0
            import logging

            logging.info(
                "Change learning_rate to %f at step %d",
                self.current_learning_rate, step_idx,
            )
            self.opt_state = shard_opt_state(
                optim.init_state(self.params), self.spec, self.mesh
            )
            self.warm_up_steps *= 3
        return logs
