"""Host-side rejection-sampled negative batches.

Redesign of the reference's ``TrainDataset`` + DataLoader-worker pipeline
(reference: codes/dataloader.py §TrainDataset.__getitem__ ≈L32-60): negatives
are uniform entity draws, rejection-filtered against the TRAIN-split true
heads/tails, emitted as fixed-size ``[B, n]`` int32 arrays (static shapes for
jit).  The reference does this per-triple inside torch DataLoader worker
processes; here it is a vectorized numpy routine (draw 2n per slot, filter
with np.isin against the CSR TrueIndex, top up the rare under-filled rows) —
one thread keeps a TPU busy, and a background prefetch thread double-buffers
host sampling against device compute (SURVEY.md §2.3 "intra-node CPU
parallelism").
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from ..data.filterset import FilterSets, subsampling_weights

HEAD_BATCH = "head-batch"
TAIL_BATCH = "tail-batch"

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, str]  # pos, neg, weight, mode


def sample_negatives_for_triple(
    h: int,
    r: int,
    t: int,
    mode: str,
    nentity: int,
    n: int,
    filters: FilterSets,
    rng: np.random.Generator,
) -> np.ndarray:
    """The reference's per-positive rejection loop (codes/dataloader.py
    ≈L42-58): draw 2n uniform ids, drop ids that are true heads (head-batch,
    filter key (r, t)) or true tails (tail-batch, key (h, r)) in the TRAIN
    set, repeat until n survive, truncate."""
    if mode == HEAD_BATCH:
        true = filters.train_true_heads(r, t)
    else:
        true = filters.train_true_tails(h, r)
    out = np.empty(0, np.int64)
    while out.size < n:
        cand = rng.integers(0, nentity, size=n * 2)
        cand = cand[np.isin(cand, true, invert=True, assume_unique=False)]
        out = np.concatenate([out, cand])
    return out[:n].astype(np.int32)


class TrainSampler:
    """Produces reference-distribution training batches for one mode.

    Epoch semantics mirror ``DataLoader(shuffle=True)`` + the infinite
    ``one_shot_iterator`` (codes/dataloader.py §BidirectionalOneShotIterator
    ≈L165-190): a fresh permutation of the train split every epoch; the last
    short batch of an epoch is padded from the next permutation so shapes
    stay static.
    """

    def __init__(
        self,
        triples: np.ndarray,
        nentity: int,
        nrelation: int,
        batch_size: int,
        negative_sample_size: int,
        mode: str,
        filters: FilterSets,
        seed: int = 0,
    ):
        assert mode in (HEAD_BATCH, TAIL_BATCH)
        self.triples = np.asarray(triples, np.int32)
        self.nentity = nentity
        self.batch_size = batch_size
        self.n = negative_sample_size
        self.mode = mode
        self.filters = filters
        self.rng = np.random.default_rng(seed)
        self.weights = subsampling_weights(self.triples, nrelation)
        self._order = np.empty(0, np.int64)

    def _next_indices(self) -> np.ndarray:
        while self._order.size < self.batch_size:
            self._order = np.concatenate(
                [self._order, self.rng.permutation(len(self.triples))]
            )
        idx, self._order = (
            self._order[: self.batch_size],
            self._order[self.batch_size :],
        )
        return idx

    def next_batch(self) -> Batch:
        idx = self._next_indices()
        pos = self.triples[idx]
        weight = self.weights[idx]
        neg = self._sample_negatives_batch(pos)
        return pos, neg, weight, self.mode

    def _sample_negatives_batch(self, pos: np.ndarray) -> np.ndarray:
        """Vectorized rejection sampling over the whole batch: one big
        uniform draw, per-row filter via a merged isin, per-row top-up only
        where the filter bit."""
        B, n = pos.shape[0], self.n
        neg = np.empty((B, n), np.int32)
        # Draw 2n per row up front; most rows finish in one round.
        cand = self.rng.integers(0, self.nentity, size=(B, 2 * n))
        for i in range(B):
            h, r, t = (int(x) for x in pos[i])
            if self.mode == HEAD_BATCH:
                true = self.filters.train_true_heads(r, t)
            else:
                true = self.filters.train_true_tails(h, r)
            row = cand[i]
            ok = row[np.isin(row, true, invert=True)]
            while ok.size < n:
                extra = self.rng.integers(0, self.nentity, size=2 * n)
                extra = extra[np.isin(extra, true, invert=True)]
                ok = np.concatenate([ok, extra])
            neg[i] = ok[:n]
        return neg


class BidirectionalIterator:
    """Strict head/tail alternation (codes/dataloader.py
    §BidirectionalOneShotIterator ≈L165-190): the internal step counter is
    incremented BEFORE the parity check, so the first batch is tail-batch."""

    def __init__(self, head_sampler: TrainSampler, tail_sampler: TrainSampler):
        self.head_sampler = head_sampler
        self.tail_sampler = tail_sampler
        self.step = 0

    def __iter__(self) -> Iterator[Batch]:
        return self

    def __next__(self) -> Batch:
        self.step += 1
        if self.step % 2 == 0:
            return self.head_sampler.next_batch()
        return self.tail_sampler.next_batch()


class PrefetchIterator:
    """Background-thread prefetch queue between the numpy sampler and the
    device — the TPU-native replacement for DataLoader worker processes
    (SURVEY.md §2.3). Depth-k double buffering hides host sampling latency
    behind device compute."""

    def __init__(self, inner, depth: int = 4):
        self.inner = inner
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                item = next(self.inner)
                while not self._stop.is_set():
                    try:
                        self.q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._exc = e

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        while True:
            if self._exc is not None:
                raise self._exc
            try:
                return self.q.get(timeout=0.1)
            except queue.Empty:
                continue

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)


def build_train_iterator(
    train: np.ndarray,
    nentity: int,
    nrelation: int,
    batch_size: int,
    negative_sample_size: int,
    filters: FilterSets,
    seed: int = 0,
    prefetch_depth: int = 4,
):
    """The analogue of codes/run.py §main's two-DataLoader construction."""
    head = TrainSampler(
        train, nentity, nrelation, batch_size, negative_sample_size,
        HEAD_BATCH, filters, seed=seed,
    )
    tail = TrainSampler(
        train, nentity, nrelation, batch_size, negative_sample_size,
        TAIL_BATCH, filters, seed=seed + 1,
    )
    it = BidirectionalIterator(head, tail)
    if prefetch_depth > 0:
        return PrefetchIterator(it, depth=prefetch_depth)
    return it
