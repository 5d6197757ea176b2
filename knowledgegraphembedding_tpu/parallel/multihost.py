"""Multi-host runtime bring-up.

The reference has no distributed layer at all (SURVEY.md §2.3). This module
is the from-scratch equivalent of a NCCL/MPI bootstrap, done the JAX way:

  - ``jax.distributed.initialize`` forms the multi-host runtime (DCN
    between hosts, ICI within a slice); after it returns, ``jax.devices()``
    spans the whole pod slice and the 1-D ``data`` mesh from sharding.py
    simply gets longer — the SPMD train step, collectives, and sharded
    evaluator are unchanged.
  - Each host runs its own sampler over its shard of the triple stream
    (edge partitioning): ``host_shard_of_triples`` deals triples
    round-robin by host id so the global batch is an even union of
    per-host batches, and ``host_batch_size`` = global / n_hosts.
  - ``jax.make_array_from_process_local_data`` assembles the global
    [B_global, ...] batch from per-host slices without any host ever
    holding the full batch.

Single-process multi-device (the CI/virtual-device case) needs none of
this — build_mesh over local devices is enough. These helpers are inert
(identity) when jax.process_count() == 1, so the same driver script runs
everywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    require: bool = False,
) -> None:
    """Bring up the multi-host runtime. On TPU pods the three arguments are
    auto-detected from the environment; pass them explicitly for CPU/GPU
    fleets. No-op if already initialized or single-process.

    NB: must run before anything initializes the XLA backend —
    ``jax.process_count()`` would itself initialize it and make
    ``jax.distributed.initialize`` raise, so the already-initialized check
    goes through ``jax.distributed.is_initialized()``, which is safe."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # ``require``: the caller EXPLICITLY asked for a fleet — a
            # silent single-host fallback would mean N independent
            # trainings all believing they are process 0, clobbering one
            # save_path. Only opportunistic auto-detection may degrade.
            if require:
                raise
            return  # single-host environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_shard_of_indices(n: int) -> np.ndarray:
    """Row indices of THIS host's edge-partition shard: k, k+P, k+2P, …
    (round-robin keeps relation/entity marginals even). The single source
    of the partitioning policy — the CLI and the triple-shard helper below
    both derive from it."""
    return np.arange(n)[jax.process_index() :: jax.process_count()]


def host_shard_of_triples(triples: np.ndarray) -> np.ndarray:
    """Edge-partition the training stream (see host_shard_of_indices)."""
    return triples[host_shard_of_indices(len(triples))]


def host_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts"
        )
    return global_batch_size // n


def verify_consistent_restore(step: int, lr: float, warm_up_steps: int) -> None:
    """Failure-recovery guard (SURVEY.md §5.3): after a cold resume, every
    host must have restored the SAME (step, lr, warm_up_steps) — a torn
    checkpoint (one host a save behind after a mid-save crash) would
    silently desynchronize the LR schedule and the sampler epoch. Raises on
    the mismatching hosts; no-op overhead single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    # NB: float32 on purpose — process_allgather rides jax arrays, which
    # silently downcast float64 when x64 is off; comparing a local float64
    # against the gathered float32 rows would false-alarm on every fleet.
    # Compare the gathered rows against each other instead (f32 holds steps
    # exactly up to 2^24, far past any max_steps).
    mine = np.asarray([float(step), float(lr), float(warm_up_steps)], np.float32)
    everyone = np.asarray(multihost_utils.process_allgather(mine))  # [n_hosts, 3]
    if not (everyone == everyone[0][None, :]).all():
        raise RuntimeError(
            f"inconsistent restore across hosts: host {jax.process_index()} "
            f"has (step, lr, warm_up)={mine.tolist()}, fleet={everyone.tolist()}"
        )


def global_batch(mesh: Mesh, local_pos, local_neg, local_weight):
    """Assemble the global device batch from per-host local slices.

    Single-process: a plain device_put with the batch sharding. Multi-host:
    ``make_array_from_process_local_data`` — each host contributes its rows,
    and the result is one global array sharded over the data axis."""
    pos_sh = NamedSharding(mesh, P(DATA_AXIS, None))
    # shared-negative batches are [1, n] and replicate (sharding.batch_specs)
    neg_sh = (
        NamedSharding(mesh, P(None, None))
        if local_neg.shape[0] == 1
        else pos_sh
    )
    w_sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() == 1:
        return (
            jax.device_put(local_pos, pos_sh),
            jax.device_put(local_neg, neg_sh),
            jax.device_put(local_weight, w_sh),
        )
    return (
        jax.make_array_from_process_local_data(pos_sh, local_pos),
        jax.make_array_from_process_local_data(neg_sh, local_neg),
        jax.make_array_from_process_local_data(w_sh, local_weight),
    )
