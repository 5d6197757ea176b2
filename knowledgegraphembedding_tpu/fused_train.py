"""Fused multi-step training: k (sample -> forward -> backward -> Adam)
steps in ONE compiled dispatch (``--steps_per_dispatch k``).

The reference's train loop round-trips host<->device every step
(codes/run.py §main ≈L280-340: DataLoader batch in, loss scalar out). The
single-step TPU path here already moves only a [B] index vector per step
(sampler/device_sampler.py), but the HOST still pays a per-step dispatch:
iterator bookkeeping + one jit-call enqueue, ~1-4 ms on a remote-dispatch
runtime — 10-25 % of a fast step (dense MXU ~15 ms). This module scans k
whole steps inside one jitted program:

  - device-resident state (triples, subsampling weights, per-mode rejection
    CSRs) is closed over as jit arguments — uploaded once;
  - the host ships ONE [k, B] int32 epoch-permutation block per dispatch
    (k·4 KB) and receives ONE summed-log vector back;
  - tail/head alternation is branch-free: the scan body inlines a
    STATIC (tail, head) step pair (block-start parity resolved host-side;
    see _paired_scan — the earlier per-step ``lax.cond`` measured 15%
    slower because the branch blocks cross-step scheduling);
  - per-step RNG is ``fold_in(mode_base_key, per-mode draw counter)``,
    derived from the GLOBAL step index — deterministic, resume-stable, and
    independent of block boundaries (block(k) == k single fused steps
    bit-for-bit; pinned by tests/test_fused_train.py).

Reference-semantics invariants preserved: the caller (cli.py) clips each
block so it never crosses a log/checkpoint/valid boundary or the warm-up
LR-decay step, so event timing and decay placement match the reference
loop exactly (codes/run.py ≈L300).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import ModelSpec, TrainSpec
from .models import scorers
from . import optim
from .train import Trainer, loss_and_logs
from .sampler.device_sampler import DeviceSampler
from .sampler.negative import HEAD_BATCH, TAIL_BATCH

# fixed log-key order for the summed [L] log vector the block returns
_LOG_KEYS = ("loss", "negative_sample_loss", "positive_sample_loss")


def _log_keys(tspec: TrainSpec):
    return (_LOG_KEYS + ("regularization",) if tspec.regularization != 0.0
            else _LOG_KEYS)


def _sample_one(state: dict, key, idx_row, mode: str, *, spec: ModelSpec,
                n: int, shared: bool):
    """One device-side batch draw from the resident two-mode state — a thin
    adapter over the ONE shared implementation
    (sampler/device_sampler.py §sample_batch)."""
    from .sampler.device_sampler import sample_batch

    csr = (None if shared
           else state["tail_csr" if mode == TAIL_BATCH else "head_csr"])
    k_max = 0 if shared else state["k_max"][mode]
    return sample_batch(
        state["triples"], state["weights"], csr, k_max, key, idx_row, mode,
        nentity=spec.nentity, nrelation=spec.nrelation, n=n, shared=shared,
    )


def _step_key(head_base, tail_base, mode: str, s):
    """Per-step draw key from the GLOBAL step index: tail draws happen at
    even steps 0,2,… (tail-first alternation) so tail's draw counter at
    step s is s//2 + 1 — block-size independent and resume-stable."""
    if mode == TAIL_BATCH:
        return jax.random.fold_in(tail_base, s // 2 + 1)
    return jax.random.fold_in(head_base, (s - 1) // 2 + 1)


def _decay_after_block(trainer, make_opt_state):
    """The reference's one-shot warm-up decay, applied after a block whose
    last step reached the boundary (codes/run.py ≈L300): lr/10, FRESH
    optimizer state, warm_up*3. Shared by both fused trainers."""
    last = trainer.step - 1
    if last >= trainer.warm_up_steps:
        trainer.current_learning_rate /= 10.0
        import logging

        logging.info(
            "Change learning_rate to %f at step %d",
            trainer.current_learning_rate, last,
        )
        trainer.opt_state = make_opt_state()
        trainer.warm_up_steps = trainer.warm_up_steps * 3


def _paired_scan(one_mode, carry, idx_block, step0, k: int, start_tail: bool,
                 presample):
    """Scan k steps as branch-free (mode_a, mode_b) PAIRS plus at most one
    unpaired step. The r2 blocks dispatched a lax.cond per step to pick the
    mode; measured on-chip the cond program ran 59.6 ms/step vs 51.7 for
    the identical math with both static mode programs inlined per pair
    (+15% — the branch blocks XLA from scheduling across the step). The
    per-step math and order are unchanged, so blocks stay bit-exact vs
    single steps (test_fused_train pins this).

    ``presample(mode, steps, idx_steps)`` draws the (pos, neg, weight)
    batches for ALL of a mode's steps in one vectorized call BEFORE the
    scan; the scan consumes them as xs. Identical per-step keys produce
    identical draws (bit-exact vs in-loop sampling — same tests pin it),
    but the sampler leaves each iteration's critical path: in-loop it ran
    serially ahead of the step's gathers (measured 3.1 ms/step at the
    headline shape vs 1.05 ms for the same draw standalone — the scan body
    cannot overlap it with the previous step), presampled it runs as a few
    large VPU ops that XLA schedules once per block.

    Memory note: presampling materializes all k steps' batches in HBM at
    once — ~2·ceil(k/2)·B·(n+4) int32/f32 words live for the block's
    lifetime (k=16, B=1024, n=256: ~34 MB; the headline tables+moments are
    ~0.7 GB), so peak block memory grows linearly with
    ``--steps_per_dispatch``. At the flag's useful range (k ≤ 64 → ~137 MB)
    this is noise next to the tables; cli.py documents the scaling at the
    flag so pathological k values are a conscious choice.

    tail-first alternation (negative.py §BidirectionalIterator): even
    global steps sample tail-batch; ``start_tail`` is step0's parity,
    resolved HOST-side so the program structure is static.
    """
    m1, m2 = ((TAIL_BATCH, HEAD_BATCH) if start_tail
              else (HEAD_BATCH, TAIL_BATCH))
    pairs, rem = divmod(k, 2)
    steps = step0 + jnp.arange(k, dtype=jnp.int32)
    xs1 = presample(m1, steps[0::2], idx_block[0::2])  # [ceil(k/2), ...]
    xs2 = (presample(m2, steps[1::2], idx_block[1::2]) if k > 1 else None)
    total = None  # log dtype follows one_mode's output (f64 under x64)
    if pairs:
        def body(c, xs):
            x_a, x_b = xs
            c, v1 = one_mode(m1, c, x_a)
            c, v2 = one_mode(m2, c, x_b)
            return c, v1 + v2

        carry, logmat = jax.lax.scan(
            body, carry,
            (jax.tree.map(lambda t: t[:pairs], xs1), xs2))
        total = jnp.sum(logmat, axis=0)
    if rem:
        # the leftover step sits at an even offset from step0 -> mode m1
        carry, v = one_mode(m1, carry, jax.tree.map(lambda t: t[pairs], xs1))
        total = v if total is None else total + v
    return carry, total


@functools.partial(
    jax.jit,
    static_argnames=("spec", "tspec", "k", "start_tail", "seed_head",
                     "seed_tail", "k_max_head", "k_max_tail", "shared"),
    donate_argnames=("params", "opt_state"),
)
def _block_step(params, opt_state, state, lr, step0, idx_block, *,
                spec: ModelSpec, tspec: TrainSpec, k: int, start_tail: bool,
                seed_head: int, seed_tail: int, k_max_head: int,
                k_max_tail: int, shared: bool):
    """k fused steps: (params, opt_state, [k,B] idx) -> (params, opt_state,
    summed log vector [len(_LOG_KEYS)])."""
    n = tspec.negative_sample_size
    head_base = jax.random.PRNGKey(seed_head)
    tail_base = jax.random.PRNGKey(seed_tail)
    state = dict(state)
    state["k_max"] = {HEAD_BATCH: k_max_head, TAIL_BATCH: k_max_tail}

    def presample(mode, steps, idx_steps):
        return jax.vmap(
            lambda s, idx: _sample_one(
                state, _step_key(head_base, tail_base, mode, s), idx, mode,
                spec=spec, n=n, shared=shared)
        )(steps, idx_steps)

    def one_mode(mode, carry, batch):
        params, opt_state = carry
        pos, neg, w = batch
        grad_fn = jax.value_and_grad(
            lambda p: loss_and_logs(p, spec, tspec, pos, neg, w, mode),
            has_aux=True,
        )
        (_, logs), grads = grad_fn(params)
        params, opt_state = optim.apply_update(params, grads, opt_state, lr)
        return (params, opt_state), jnp.stack(
            [logs[kk] for kk in _log_keys(tspec)])

    (params, opt_state), total = _paired_scan(
        one_mode, (params, opt_state), idx_block, step0, k, start_tail,
        presample)
    return params, opt_state, total


class FusedDeviceTrainer(Trainer):
    """Drop-in Trainer that ALSO runs fused k-step blocks. Single-step
    semantics (one_step, checkpoint_state, LR decay + Adam reset) are
    inherited unchanged; ``run_block(k)`` advances k steps in one dispatch.

    The caller must clip k so a block never crosses the warm-up boundary
    (lr is constant within a block) — ``max_block(k)`` does the math.
    """

    def __init__(self, spec: ModelSpec, tspec: TrainSpec, params, lr: float,
                 warm_up_steps: int, train: np.ndarray, seed: int = 0,
                 init_step: int = 0, negative_sharing: str = "none"):
        super().__init__(spec, tspec, params, lr=lr,
                         warm_up_steps=warm_up_steps, init_step=init_step)
        self.negative_sharing = negative_sharing
        # two DeviceSamplers hold the resident state + host permutations;
        # their own RNG is unused (the block derives per-step keys), but the
        # index streams are exactly the iterator's (head seed, tail seed+1)
        self._head = DeviceSampler(
            train, spec.nentity, spec.nrelation, tspec.batch_size,
            tspec.negative_sample_size, HEAD_BATCH, seed=seed,
            negative_sharing=negative_sharing,
        )
        self._tail = DeviceSampler(
            train, spec.nentity, spec.nrelation, tspec.batch_size,
            tspec.negative_sample_size, TAIL_BATCH, seed=seed + 1,
            negative_sharing=negative_sharing,
            shared_state=(self._head.triples, self._head.weights),
        )
        self._seed_head, self._seed_tail = seed, seed + 1
        shared = negative_sharing == "batch"
        self._state = {
            "triples": self._head.triples,
            "weights": self._head.weights,
        }
        self._k_max = {HEAD_BATCH: 0, TAIL_BATCH: 0}
        if not shared:
            self._state["head_csr"] = {
                "offsets": self._head.csr.offsets,
                "counts": self._head.csr.counts,
                "values": self._head.csr.values,
            }
            self._state["tail_csr"] = {
                "offsets": self._tail.csr.offsets,
                "counts": self._tail.csr.counts,
                "values": self._tail.csr.values,
            }
            self._k_max = {HEAD_BATCH: self._head.csr.k_max,
                           TAIL_BATCH: self._tail.csr.k_max}
        else:
            # cond branches need identical state pytrees
            empty = {"offsets": jnp.zeros(1, jnp.int32),
                     "counts": jnp.zeros(1, jnp.int32),
                     "values": jnp.zeros(1, jnp.int32)}
            self._state["head_csr"] = empty
            self._state["tail_csr"] = dict(empty)
        self._shared = shared

    def max_block(self, k: int) -> int:
        """Largest block from the current step that keeps lr constant: the
        decay fires AFTER step_idx >= warm_up_steps, so the boundary step
        itself may close a block but not be crossed."""
        return max(1, min(k, self.warm_up_steps + 1 - self.step))

    def run_block(self, k: int) -> Dict[str, float]:
        """Advance k fused steps; returns the SUMMED logs dict (caller
        divides by its window count, exactly like per-step accumulation)."""
        if k > self.max_block(k):
            raise ValueError(
                f"run_block(k={k}) would cross the LR-decay boundary: "
                f"step={self.step}, warm_up_steps={self.warm_up_steps}; "
                f"clip with max_block() first"
            )
        idx = np.stack([
            (self._tail if (self.step + i) % 2 == 0 else self._head)
            ._next_indices()
            for i in range(k)
        ])
        step0 = self.step
        self.params, self.opt_state, logvec = _block_step(
            self.params, self.opt_state, self._state,
            jnp.asarray(self.current_learning_rate,
                        self.params["entity_embedding"].dtype),
            jnp.int32(step0), jnp.asarray(idx),
            spec=self.spec, tspec=self.tspec, k=k,
            start_tail=(step0 % 2 == 0),
            seed_head=self._seed_head, seed_tail=self._seed_tail,
            k_max_head=self._k_max[HEAD_BATCH],
            k_max_tail=self._k_max[TAIL_BATCH],
            shared=self._shared,
        )
        self.step = step0 + k
        _decay_after_block(self, lambda: optim.init_state(self.params))
        return dict(zip(_log_keys(self.tspec), logvec))


# ---------------------------------------------------------------------------
# Mesh-wide fused blocks: k SPMD steps (per-device sampling + explicit
# all_gather/psum_scatter collectives) in one dispatch
# ---------------------------------------------------------------------------

class FusedMeshTrainer:
    """k fused steps per dispatch on a device mesh (``--steps_per_dispatch``
    with ``--num_shards``): ONE shard_map program in which each device
    rejection-samples its shard of the batch and runs the hand-scheduled
    FSDP-style step (parallel/shard_map_step.py: all_gather table forward,
    psum_scatter grads backward) — scanned k times. Hosts ship one
    [k, B/P] index block per dispatch; works single- and multi-host.

    Same external surface as ShardedTrainer (checkpoint_state /
    host_params / load_host_state) plus run_block/max_block, so cli.py's
    fused loop drives either trainer unchanged.
    """

    def __init__(self, spec: ModelSpec, tspec: TrainSpec, params, lr: float,
                 warm_up_steps: int, train: np.ndarray, mesh, seed: int = 0,
                 init_step: int = 0, negative_sharing: str = "none"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import sharding as sh
        from .sampler.device_sampler import MeshDeviceSampler

        self.spec = spec
        self.tspec = tspec
        self.mesh = mesh
        n_dev = mesh.devices.size
        self.params = sh.shard_params(sh.pad_params(params, n_dev), spec, mesh)
        self.opt_state = sh.shard_opt_state(
            optim.init_state(self.params), spec, mesh)
        self.current_learning_rate = lr
        self.warm_up_steps = warm_up_steps
        self.step = init_step
        self.negative_sharing = negative_sharing
        shared = negative_sharing == "batch"
        self._shared = shared
        self._seed_head, self._seed_tail = seed, seed + 1

        import jax as _jax

        index_subset = None
        if _jax.process_count() > 1:
            from .parallel import multihost

            index_subset = multihost.host_shard_of_indices(len(train))
        self._head = MeshDeviceSampler(
            train, spec.nentity, spec.nrelation, tspec.batch_size,
            tspec.negative_sample_size, HEAD_BATCH, mesh, seed=seed,
            negative_sharing=negative_sharing, index_subset=index_subset)
        self._tail = MeshDeviceSampler(
            train, spec.nentity, spec.nrelation, tspec.batch_size,
            tspec.negative_sample_size, TAIL_BATCH, mesh, seed=seed + 1,
            negative_sharing=negative_sharing, index_subset=index_subset,
            shared_state=self._head._shareable_state)
        empty = {"offsets": jnp.zeros(1, jnp.int32),
                 "counts": jnp.zeros(1, jnp.int32),
                 "values": jnp.zeros(1, jnp.int32)}
        self._state = {
            "triples": self._head._shareable_state["triples"],
            "weights": self._head._shareable_state["weights"],
            "head_csr": dict(self._head._mode_state) or empty,
            "tail_csr": dict(self._tail._mode_state) or dict(empty),
        }
        self._k_max = {
            HEAD_BATCH: getattr(self._head, "_csr_k_max", 0),
            TAIL_BATCH: getattr(self._tail, "_csr_k_max", 0),
        }
        self._idx_sharding = NamedSharding(mesh, P(None, "data"))
        self._block_cache: dict = {}

    supports_async_checkpoint = False  # state gather is a collective

    # --- ShardedTrainer-compatible checkpoint surface ---
    host_params = None  # bound below to the ShardedTrainer implementations

    def max_block(self, k: int) -> int:
        return max(1, min(k, self.warm_up_steps + 1 - self.step))

    def _block_fn(self, k: int, start_tail: bool):
        fn = self._block_cache.get((k, start_tail))
        if fn is not None:
            return fn
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.shard_map_step import _global_loss_and_logs
        from .parallel.sharding import batch_specs, opt_specs, param_specs

        spec, tspec = self.spec, self.tspec
        n = tspec.negative_sample_size
        n_shards = self.mesh.devices.size
        shared = self._shared
        seed_head, seed_tail = self._seed_head, self._seed_tail
        k_max = dict(self._k_max)
        log_keys = _log_keys(tspec)

        def per_device(params, opt_state, state, lr, step0, idx_block):
            head_base = jax.random.PRNGKey(seed_head)
            tail_base = jax.random.PRNGKey(seed_tail)
            dev = jax.lax.axis_index("data")

            def presample(mode, steps, idx_steps):
                def draw(s, idx_row):
                    key = _step_key(head_base, tail_base, mode, s)
                    # shared negatives keep the UN-folded key (identical
                    # replicated [1, n] on every device); per-positive
                    # draws fold in the mesh position for independent
                    # streams
                    if not shared:
                        key = jax.random.fold_in(key, dev)
                    st = dict(state)
                    st["k_max"] = k_max
                    return _sample_one(st, key, idx_row, mode, spec=spec,
                                       n=n, shared=shared)

                return jax.vmap(draw)(steps, idx_steps)

            def one_mode(mode, carry, batch):
                params, opt_state = carry
                pos, neg, w = batch
                grad_fn = jax.value_and_grad(
                    lambda p: _global_loss_and_logs(
                        p, spec, tspec, pos, neg, w, mode, n_shards),
                    has_aux=True)
                (_, logs), grads = grad_fn(params)
                params, opt_state = optim.apply_update(
                    params, grads, opt_state, lr)
                return (params, opt_state), jnp.stack(
                    [logs[kk] for kk in log_keys])

            (params, opt_state), total = _paired_scan(
                one_mode, (params, opt_state), idx_block, step0, k,
                start_tail, presample)
            return params, opt_state, total

        P_ = P
        p_specs = param_specs(spec)
        o_specs = opt_specs(spec)
        state_specs = jax.tree.map(lambda _: P_(), self._state)
        body = jax.shard_map(
            per_device,
            mesh=self.mesh,
            in_specs=(p_specs, o_specs, state_specs, P_(), P_(),
                      P_(None, "data")),
            out_specs=(p_specs, o_specs, P_()),
            check_vma=True,
        )
        fn = jax.jit(body, donate_argnums=(0, 1))
        self._block_cache[(k, start_tail)] = fn
        return fn

    def run_block(self, k: int) -> Dict[str, float]:
        if k > self.max_block(k):
            raise ValueError(
                f"run_block(k={k}) would cross the LR-decay boundary: "
                f"step={self.step}, warm_up_steps={self.warm_up_steps}; "
                f"clip with max_block() first"
            )
        local = np.stack([
            (self._tail if (self.step + i) % 2 == 0 else self._head)
            ._next_indices()
            for i in range(k)
        ])
        if jax.process_count() == 1:
            idx = jax.device_put(local, self._idx_sharding)
        else:
            idx = jax.make_array_from_process_local_data(
                self._idx_sharding, local)
        step0 = self.step
        self.params, self.opt_state, logvec = self._block_fn(
            k, step0 % 2 == 0)(
            self.params, self.opt_state, self._state,
            jnp.float32(self.current_learning_rate), jnp.int32(step0), idx,
        )
        self.step = step0 + k

        def reset_opt():
            from .parallel import sharding as sh

            return sh.shard_opt_state(
                optim.init_state(self.params), self.spec, self.mesh)

        _decay_after_block(self, reset_opt)
        return dict(zip(_log_keys(self.tspec), logvec))


# checkpoint/restore surface: identical mechanics to ShardedTrainer — bind
# its implementations rather than duplicating the padding/replication logic
from .parallel.sharding import ShardedTrainer as _ST  # noqa: E402

FusedMeshTrainer.host_params = _ST.host_params
FusedMeshTrainer.checkpoint_state = _ST.checkpoint_state
FusedMeshTrainer.load_host_state = _ST.load_host_state
