"""Filtered link-prediction evaluation + countries AUC-PR.

TPU-native redesign of the reference's ``KGEModel.test_step``
(reference: codes/model.py ≈L332-390 and codes/dataloader.py §TestDataset
≈L118-162).  Key departures, same semantics:

  - The reference materializes a ``[B, nentity]`` score row, adds a -1
    filter bias (which, because filtered candidate *ids* are replaced by the
    true entity, guarantees filtered candidates score exactly
    ``true_score - 1``), then argsorts.  Equivalent semantics, far cheaper
    on TPU: ``rank = 1 + #{unfiltered candidates with score > true_score}``
    — no argsort, no O(E) row gather (candidates are a *contiguous slice*
    of the entity table, streamed chunk-by-chunk through VMEM), and the
    count shards across devices with one ``psum`` (SURVEY.md §5.7).
  - The reference's per-candidate Python filter loop becomes a vectorized
    CSR mask paint on the host (data/filterset.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSpec
from .data.filterset import FilterSets
from .models import kge, scorers
from .ops import matmul_scoring


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("spec", "mode", "chunk"))
def ranks_batch(
    params: kge.Params,
    pos: jnp.ndarray,  # i32[B, 3]
    filter_mask: jnp.ndarray,  # bool[B, Epad] True = known-true (excl. self)
    *,
    spec: ModelSpec,
    mode: str,
    chunk: int,
) -> jnp.ndarray:
    """Filtered ranks (1-based) of the true entity for one eval batch."""
    ent = params["entity_embedding"]
    rel = params["relation_embedding"]
    E = spec.nentity
    n_chunks = _cdiv(E, chunk)

    if matmul_scoring.supports_dense(spec.model_name):
        # Bilinear models: one MXU matmul scores every candidate at once —
        # no candidate-axis loop at all (ops/matmul_scoring.py).
        scores = matmul_scoring.dense_scores_all(spec, params, pos, mode)  # [B, Etab]
        Etab = scores.shape[1]
        true_ids = pos[:, 0] if mode == scorers.HEAD_BATCH else pos[:, 2]
        true_score = jnp.take_along_axis(scores, true_ids[:, None], axis=1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, Etab), 1)
        mask = filter_mask[:, :Etab]
        if mask.shape[1] < Etab:
            mask = jnp.pad(mask, ((0, 0), (0, Etab - mask.shape[1])))
        beats = (scores > true_score) & (ids < E) & (~mask)
        return jnp.sum(beats, axis=1, dtype=jnp.int32) + 1

    # Score the true entity through the SAME mode-specific grouped form the
    # candidates use: in the reference the true entity sits inside the one
    # [B, E] score row being argsorted, so its score comes from the batch
    # layout, not the 'single' layout (they differ in float for RotatE's two
    # groupings). Comparing like-vs-like keeps rank parity exact.
    true_ids = pos[:, 0:1] if mode == scorers.HEAD_BATCH else pos[:, 2:3]
    true_score = kge.forward(params, spec, (pos, true_ids), mode)[:, 0]  # [B]
    # The chunk scoring below reduces over a [B, chunk, de] shape while the
    # line above reduced over [B, 1, de]; XLA may pick different reduction
    # orders, so the true candidate's chunk score can differ from true_score
    # by float noise and "beat itself". Exclude it by id — the reference's
    # argsort formulation compares the true entity to itself and never
    # counts it (codes/model.py ≈L365-375).

    r = jnp.take(rel, pos[:, 1], axis=0)[:, None, :]  # [B,1,dr]
    if mode == scorers.HEAD_BATCH:
        fixed = jnp.take(ent, pos[:, 2], axis=0)[:, None, :]  # tail fixed
    else:
        fixed = jnp.take(ent, pos[:, 0], axis=0)[:, None, :]  # head fixed

    def body(c, count):
        start = c * chunk
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0)
        valid = ids < E
        rows = jnp.take(ent, jnp.minimum(ids, E - 1), axis=0)[None, :, :]  # [1,chunk,de]
        if mode == scorers.HEAD_BATCH:
            score = scorers.score_fn(
                spec.model_name, rows, r, fixed,
                gamma=spec.gamma, embedding_range=spec.embedding_range,
                modulus=params.get("modulus"), mode=mode,
            )  # [B, chunk]
        else:
            score = scorers.score_fn(
                spec.model_name, fixed, r, rows,
                gamma=spec.gamma, embedding_range=spec.embedding_range,
                modulus=params.get("modulus"), mode=mode,
            )
        mask_chunk = jax.lax.dynamic_slice_in_dim(filter_mask, start, chunk, axis=1)
        beats = (
            (score > true_score[:, None])
            & valid[None, :]
            & (~mask_chunk)
            & (ids[None, :] != true_ids)
        )
        return count + jnp.sum(beats, axis=1, dtype=jnp.int32)

    count = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros(pos.shape[0], jnp.int32)
    )
    return count + 1


def _pad_mask(mask: np.ndarray, chunk: int) -> np.ndarray:
    E = mask.shape[1]
    Epad = _cdiv(E, chunk) * chunk
    if Epad == E:
        return mask
    return np.pad(mask, ((0, 0), (0, Epad - E)))


def metrics_from_ranks(ranks: np.ndarray) -> List[Dict[str, float]]:
    """Per-triple log dicts, exactly the reference's names
    (codes/model.py ≈L370-380)."""
    out = []
    for rk in ranks:
        rk = float(rk)
        out.append(
            {
                "MRR": 1.0 / rk,
                "MR": rk,
                "HITS@1": 1.0 if rk <= 1 else 0.0,
                "HITS@3": 1.0 if rk <= 3 else 0.0,
                "HITS@10": 1.0 if rk <= 10 else 0.0,
            }
        )
    return out


def test_step(
    params: kge.Params,
    spec: ModelSpec,
    test_triples: np.ndarray,
    filters: FilterSets,
    test_batch_size: int = 4,
    eval_chunk_size: int = 4096,
    modes: Sequence[str] = (scorers.HEAD_BATCH, scorers.TAIL_BATCH),
    test_log_steps: int = 1000,
    logger=None,
    use_pallas: Optional[bool] = None,
) -> Dict[str, float]:
    """Full filtered-ranking evaluation: both corruption directions, pooled
    mean over all (triple, direction) pairs (codes/model.py ≈L340-388).

    ``use_pallas``: None (default) auto-enables the fused table-streaming
    rank kernel (ops/pallas_rank.py) for distance-family models on TPU
    (measured 1.4-1.8x over the XLA chunked path); True/False force it.
    Bilinear models always use the MXU matmul path."""
    from .ops import pallas_rank

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    logs: List[Dict[str, float]] = []
    chunk = min(eval_chunk_size, _cdiv(spec.nentity, 1))
    total = len(test_triples) * len(modes)
    done = 0
    ranker = None
    if use_pallas and pallas_rank.supports(spec.model_name):
        ranker = pallas_rank.PallasRanker(params, spec)
    for mode in modes:
        for i in range(0, len(test_triples), test_batch_size):
            pos = np.asarray(test_triples[i : i + test_batch_size], np.int32)
            B = pos.shape[0]
            if B < test_batch_size:  # pad to static shape, drop pad ranks
                pad = np.repeat(pos[-1:], test_batch_size - B, axis=0)
                pos_p = np.concatenate([pos, pad], axis=0)
            else:
                pos_p = pos
            mask = filters.filter_mask_rows(pos_p, mode)
            mask = _pad_mask(mask, chunk)
            if ranker is not None:
                ranks = ranker.ranks(jnp.asarray(pos_p), jnp.asarray(mask), mode)
            else:
                ranks = ranks_batch(
                    params, jnp.asarray(pos_p), jnp.asarray(mask),
                    spec=spec, mode=mode, chunk=chunk,
                )
            ranks = np.asarray(ranks)[:B]
            logs.extend(metrics_from_ranks(ranks))
            done += B
            if logger is not None and (done // test_batch_size) % test_log_steps == 0:
                logger.info("Evaluating the model... (%d/%d)", done, total)

    return {k: float(np.mean([lg[k] for lg in logs])) for k in logs[0]}


# ---------------------------------------------------------------------------
# Countries: AUC-PR over region candidates (codes/model.py ≈L335-355)
# ---------------------------------------------------------------------------

def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """sklearn.metrics.average_precision_score for binary labels (the
    reference's only sklearn dependency), reimplemented in numpy:
    AP = sum_n (R_n - R_{n-1}) * P_n over the descending-score sweep."""
    order = np.argsort(-y_score, kind="stable")
    y = np.asarray(y_true)[order]
    s = np.asarray(y_score)[order]
    tp = np.cumsum(y)
    n_pos = tp[-1]
    if n_pos == 0:
        return 0.0
    k = np.arange(1, len(y) + 1)
    precision = tp / k
    recall = tp / n_pos
    # group ties: AP only counts the last index of each distinct score
    distinct = np.r_[s[1:] != s[:-1], True]
    precision, recall = precision[distinct], recall[distinct]
    prev_recall = np.r_[0.0, recall[:-1]]
    return float(np.sum((recall - prev_recall) * precision))


def countries_auc_pr(
    params: kge.Params,
    spec: ModelSpec,
    test_triples: np.ndarray,
    regions: Sequence[int],
    batch_size: int = 1024,
) -> float:
    """Score (head, relation, candidate_region) for every test triple ×
    region in 'single' mode; one pooled AP (codes/model.py ≈L335-355)."""
    samples = []
    y_true = []
    for h, r, t in np.asarray(test_triples):
        for reg in regions:
            samples.append((h, r, reg))
            y_true.append(1 if reg == t else 0)
    samples = np.asarray(samples, np.int32)
    scores = []
    score_one = jax.jit(
        lambda p, s: kge.forward(p, spec, s, scorers.SINGLE)[:, 0]
    )
    for i in range(0, len(samples), batch_size):
        sl = samples[i : i + batch_size]
        scores.append(np.asarray(score_one(params, jnp.asarray(sl))))
    y_score = np.concatenate(scores)
    return average_precision(np.asarray(y_true), y_score)
