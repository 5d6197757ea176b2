"""Hand-scheduled SPMD train step: explicit collectives via ``jax.shard_map``.

The GSPMD path (``sharding.make_sharded_train_step``) annotates shardings and
lets XLA insert collectives. This module is the explicitly-scheduled variant
the north star calls for — the cross-device embedding-exchange collective is
written out, not inferred:

  forward:   full_table = all_gather(entity_shard, 'data')   [tiled, ICI]
  backward:  d(entity_shard) = psum_scatter(d(full_table))   [all_gather VJP]
  rel/mod:   grads psum'd across the mesh (tables replicated)
  update:    dense Adam on the LOCAL shard only (moments shard with the rows)

Why gather-the-table instead of routing rows with an all-to-all?  Count the
bytes. A request-routing exchange moves the B·(n+2)·d rows each step (the
batch's gathered embeddings + their gradients), while gathering the table
moves 2·E·d (table out, dense grad back). At reference scales the batch side
is far bigger: FB15k-237 best-config draws B·n = 262 144 rows per step from
an E = 14 541-row table — each entity is requested ~18× per step. Whenever
B·(n+2) > 2·E (every reference best_config, incl. YAGO3-10: 262k vs 246k),
the FSDP/ZeRO-3-style table gather is the cheaper collective, it is perfectly
dense (no ragged all-to-all, no capacity overflow), and XLA overlaps the
all_gather/psum_scatter with the surrounding gather/score compute. The
crossover (huge E, small B·n) is documented in BENCH_NOTES.md; a routing
variant only pays off past ~1M entities at small batch.

Numerics are identical to the single-device step (tests/test_shard_map.py
asserts allclose on params, moments, and logs): the loss is assembled from
psum'd numerators/denominators so every device computes the *global*
weighted loss of the reference (codes/model.py §train_step ≈L285-315), not a
mean-of-means.

Autodiff bookkeeping (the subtle part): shard_map's varying-manual-axes
tracking (check_vma=True) makes every grad leaf arrive globally reduced —
the entity shard's cotangent through ``all_gather``'s transpose
(``psum_scatter``), and the replicated relation/modulus leaves via the
automatic psum that keeps grads of replicated inputs replicated. Adding a
manual psum on top would scale grads by the mesh size (and with
check_vma=False the transpose of psum degrades to psum, scaling *all*
grads by the mesh size — tests/test_shard_map.py pins both trajectories).
The replicated relation table's L3-regularizer term is divided by the mesh
size inside the psum'd loss so it is counted exactly once.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from ..config import ModelSpec, TrainSpec
from ..models import kge, scorers
from ..ops import loss as loss_ops
from ..ops import matmul_scoring
from .. import optim
from .. import train as train_mod
from .sharding import DATA_AXIS, batch_specs, opt_specs, param_specs

P = jax.sharding.PartitionSpec


def _global_loss_and_logs(params_local, spec: ModelSpec, tspec: TrainSpec,
                          pos, neg, weight, mode: str, n_shards: int):
    """Per-device loss body; every returned scalar is the identical GLOBAL
    value on all devices (assembled from psums)."""
    full_ent = jax.lax.all_gather(
        params_local["entity_embedding"], DATA_AXIS, axis=0, tiled=True
    )
    p_full = dict(params_local, entity_embedding=full_ent)

    compute_dtype = jnp.bfloat16 if tspec.precision == "bf16" else None
    if train_mod.use_dense_scoring(spec, tspec):
        negative_score = matmul_scoring.dense_negative_scores(
            spec, p_full, pos, neg, mode,
            # dtype follows the params absent a bf16 override (a hardcoded
            # f32 silently downcast f64 parity runs; see train.loss_and_logs)
            compute_dtype=compute_dtype or full_ent.dtype,
        )
    else:
        negative_score = kge.forward(p_full, spec, (pos, neg), mode, compute_dtype)
    positive_score = kge.forward(p_full, spec, pos, scorers.SINGLE, compute_dtype)

    # the reference loss with GLOBAL normalization (codes/model.py
    # ≈L285-315) — shared with the routed schedule (ops/loss.py)
    return loss_ops.kge_loss_global(
        positive_score, negative_score, weight, tspec, DATA_AXIS, n_shards,
        ent_local=params_local["entity_embedding"],
        rel_replicated=params_local["relation_embedding"],
    )


def make_shardmap_train_step(spec: ModelSpec, tspec: TrainSpec, mesh,
                             mode: str, shared_negatives: bool = False):
    """Compiled explicit-collective SPMD step with the same signature as
    ``sharding.make_sharded_train_step``:
    (params, opt_state, pos, neg, weight, lr) -> (params, opt_state, logs).

    Entity rows (and their Adam moments) must already be padded to a
    multiple of the mesh size (``sharding.pad_params``).
    """
    n_shards = mesh.devices.size
    p_specs = param_specs(spec)
    o_specs = opt_specs(spec)
    pos_s, neg_s, w_s = batch_specs(shared_negatives)

    def per_device(params, opt_state, pos, neg, weight, lr):
        grad_fn = jax.value_and_grad(
            lambda p: _global_loss_and_logs(
                p, spec, tspec, pos, neg, weight, mode, n_shards
            ),
            has_aux=True,
        )
        (_, logs), grads = grad_fn(params)
        # With VMA tracking on (check_vma=True below), autodiff already
        # reduces every leaf globally: the entity shard's cotangent arrives
        # through all_gather's transpose (psum_scatter), and grads of the
        # replicated relation/modulus leaves are auto-psum'd so the result
        # is typed replicated. No further collectives needed here.
        params, opt_state = optim.apply_update(params, grads, opt_state, lr)
        return params, opt_state, logs

    body = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(p_specs, o_specs, pos_s, neg_s, w_s, P()),
        out_specs=(p_specs, o_specs, P()),
        # VMA tracking ON: psum outputs are typed replicated, so the
        # autodiff transpose of psum is identity (NOT psum — which would
        # scale every grad by the mesh size) and all_gather transposes to
        # psum_scatter. This is what makes the grad bookkeeping above exact.
        check_vma=True,
    )
    return jax.jit(body, donate_argnums=(0, 1))
