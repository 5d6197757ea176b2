"""On-device (TPU-resident) negative sampler.

The reference samples negatives in DataLoader worker processes and ships
``[B, 3] + [B, n] + [B]`` tensors to the device every step
(codes/dataloader.py §TrainDataset.__getitem__ ≈L32-60). The host-side
samplers here (negative.py, native/) reproduce that; this module is the
TPU-native endgame: the training triples, the word2vec subsampling weights,
and the TRAIN-true filter sets all live in HBM, and the whole
draw→reject→top-up pipeline is ONE jitted program. Per step the host ships
only a ``[B]`` int32 vector of epoch-permutation indices (~4 KB) — the
sampling itself costs microseconds of VPU time.

Why this matters on real hardware: host→device transfers have fixed latency
(PCIe µs; ~26 ms(!) on this build's remote-tunnel TPU — see BENCH_NOTES.md),
and a fast train step (dense MXU scoring: ~13 ms) is otherwise
transfer-bound. It also frees the host CPU entirely (this box has one core)
and gives each device its own sampler shard for multi-host scale-out.

Distribution parity with the reference: negatives are iid uniform over the
non-true entities, first-n-of-stream order (same contract as the host
samplers; tests/test_device_sampler.py checks collisions, uniformity, and
the subsampling-weight formula). RNG is jax threefry rather than numpy —
SURVEY.md §7 "hard parts": bit-identical sampling with the reference is a
non-goal, distribution parity is the contract.

Filter-set representation (the piece SURVEY.md §7 assumed was not
TPU-friendly — it is, with the right layout): a device-resident CSR over
the composite key
  tail-batch: key = h·R + r, values = true tails
  head-batch: key = r·E + t, values = true heads
with DENSE offset/count arrays indexed by key (key space E·R ≤ 20M int32 at
reference scales — asserted at build time). Membership per batch is then
  starts = offsets[keys]                 (B scalar gathers)
  window = dynamic_slice(values, starts, Kmax)  (B CONTIGUOUS row reads)
  collided = any(cand == window, masked)        (chunked VPU compare)
A lexicographic binary search over sorted (key, value) pairs was measured
first and rejected: its log2(T)·B·2n scalar-granularity gathers run at
~47 ns each on the TPU (≈460 ms/batch — scalar gathers are the enemy);
the CSR window form is contiguous reads + pure VPU compares (~1-3 ms).
"""

from __future__ import annotations

import functools


import numpy as np

import jax
import jax.numpy as jnp

from ..data.filterset import subsampling_weights
from .negative import HEAD_BATCH, TAIL_BATCH


def _like_vma(x, ref):
    """Match x's varying-manual-axes type to ref's (no-op outside shard_map
    or when ref is unvarying): loop carries created fresh inside a
    check_vma=True shard_map body must be cast varying before they can meet
    varying per-iteration values."""
    axes = getattr(jax.typeof(ref), "vma", None)
    if not axes:
        return x
    return jax.lax.pcast(x, tuple(axes), to="varying")


def csr_member(offsets: jnp.ndarray, counts: jnp.ndarray, values: jnp.ndarray,
               k_max: int, keys: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
    """bool[B, m]: cand[b, j] in the true-value set of keys[b].

    One contiguous Kmax-window read per row + a chunked VPU
    broadcast-compare (never materializes more than [B, m, CHUNK]).
    Pure function so the single-device sampler and the shard_map body of
    the mesh sampler share one implementation."""
    B, m = cand.shape
    starts = jnp.take(offsets, keys)  # [B]
    cnts = jnp.take(counts, keys)  # [B]
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(values, (s,), (k_max,))
    )(starts)  # [B, Kmax] — contiguous reads
    CHUNK = 16
    n_chunks = -(-k_max // CHUNK)
    pad = n_chunks * CHUNK - k_max
    if pad:
        windows = jnp.pad(windows, ((0, 0), (0, pad)), constant_values=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(i, acc):
        wc = jax.lax.dynamic_slice(windows, (0, i * CHUNK), (B, CHUNK))
        # window positions past this key's count belong to the NEXT
        # key's values — mask them out or negatives get over-rejected
        valid = (i * CHUNK + col) < cnts[:, None]  # [B, CHUNK]
        hit = jnp.any(
            (cand[:, :, None] == wc[:, None, :]) & valid[:, None, :],
            axis=-1,
        )
        return acc | hit

    return jax.lax.fori_loop(
        0, n_chunks, body, _like_vma(jnp.zeros((B, m), bool), cand)
    )


def gap_negatives(rng: jax.Array, qk: jnp.ndarray, csr, k_max: int, n: int,
                  nentity: int) -> jnp.ndarray:
    """i32[B, n] exact uniform draws over the non-TRAIN-true set, by GAP
    SAMPLING (r3) instead of rejection: draw u ~ U[0, E - c_b) per slot and
    shift it past the true values with the order-statistic identity

        result = u + |{j < c : v_j - j <= u}|

    where v is the key's sorted, DEDUPLICATED true-partner list (strictly
    increasing, so v_j - j is non-decreasing and the count is exact — the
    result is the u-th smallest non-true entity; no true partner can ever
    be produced). One chunked window-compare pass over n candidates
    replaces the old rejection path's 2n-wide candidate draw + membership
    test + [B, 3n] stable argsort + data-dependent while_loop top-up
    rounds. Same sampling contract (iid uniform over the allowed set —
    tests/test_device_sampler.py pins no-collision + uniformity), ~3x less
    device work per draw at the headline shape, and no data-dependent
    control flow left in the sampler."""
    cnts = jnp.take(csr["counts"], qk)  # [B]
    u = jax.random.randint(
        rng, (qk.shape[0], n), 0, (nentity - cnts)[:, None], dtype=jnp.int32)
    return gap_map(u, qk, csr, k_max, nentity)


def gap_map(u: jnp.ndarray, qk: jnp.ndarray, csr, k_max: int,
            nentity: int) -> jnp.ndarray:
    """The pure order-statistic shift of gap_negatives: map u[b, j] in
    [0, E - c_b) to the u-th smallest entity NOT in key qk[b]'s true set.
    Separated so tests can verify the mapping exhaustively."""
    B, _ = u.shape
    starts = jnp.take(csr["offsets"], qk)  # [B]
    cnts = jnp.take(csr["counts"], qk)  # [B]
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(csr["values"], (s,), (k_max,))
    )(starts)  # [B, Kmax] — contiguous reads
    CHUNK = 16
    n_chunks = -(-k_max // CHUNK)
    pad = n_chunks * CHUNK - k_max
    if pad:
        windows = jnp.pad(windows, ((0, 0), (0, pad)),
                          constant_values=nentity)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(i, acc):
        wc = jax.lax.dynamic_slice(windows, (0, i * CHUNK), (B, CHUNK))
        j = i * CHUNK + col  # [1, CHUNK] global window position
        # positions past this key's count belong to the NEXT key's values;
        # nentity > any u, so they never count
        thresh = jnp.where(j < cnts[:, None], wc - j, nentity)  # v_j - j
        return acc + jnp.sum(
            u[:, :, None] >= thresh[:, None, :], axis=-1, dtype=jnp.int32)

    shift = jax.lax.fori_loop(
        0, n_chunks, body, _like_vma(jnp.zeros(u.shape, jnp.int32), u))
    return u + shift


def sample_batch(triples, weights, csr, k_max: int, key, idx_row, mode: str,
                 *, nentity: int, nrelation: int, n: int, shared: bool):
    """THE device-side batch draw: positives + weights by epoch index, then
    either one shared [1, n] uniform set or per-positive rejection-filtered
    negatives. Single implementation shared by DeviceSampler,
    MeshDeviceSampler's shard_map body, and the fused train blocks
    (fused_train.py) — any change to sampling semantics lands in all of
    them at once (they pin block==per-step trajectory parity)."""
    pos = jnp.take(triples, idx_row, axis=0)  # [B, 3]
    weight = jnp.take(weights, idx_row)  # [B]
    if shared:
        neg = jax.random.randint(key, (1, n), 0, nentity, dtype=jnp.int32)
        return pos, neg, weight
    if mode == TAIL_BATCH:
        qk = pos[:, 0] * nrelation + pos[:, 1]
    else:
        qk = pos[:, 1] * nentity + pos[:, 2]
    neg = gap_negatives(key, qk, csr, k_max, n, nentity)
    return pos, neg, weight


def validate_key_space(nentity: int, nrelation: int,
                       negative_sharing: str) -> None:
    """Only the rejection-filtering CSR needs int32 composite keys; the
    shared-negative mode draws unfiltered. One guard for every device
    sampler variant."""
    if (negative_sharing != "batch"
            and int(nentity) * int(nrelation) >= 2**31):
        raise ValueError(
            "device sampler pair-key space exceeds int32 "
            f"(E*R = {nentity * nrelation}); use a host sampler backend"
        )


def build_mode_csr(triples: np.ndarray, nentity: int, nrelation: int,
                   mode: str):
    """(offsets, counts, values, k_max) numpy arrays of the TRAIN-true
    rejection CSR for one corruption mode — shared by the single-device and
    mesh samplers. Guards against a key whose true set covers EVERY entity
    (the jitted rejection while_loop could never terminate)."""
    from ..data.filterset import TrueIndex, dense_key_arrays

    h, r, t = triples[:, 0], triples[:, 1], triples[:, 2]
    if mode == TAIL_BATCH:
        keys, vals, n_keys = (
            h.astype(np.int64) * nrelation + r, t, nentity * nrelation)
    else:
        keys, vals, n_keys = (
            r.astype(np.int64) * nentity + t, h, nrelation * nentity)
    uniq_pairs = np.unique(keys.astype(np.int64) * nentity + vals)
    counts = np.unique(uniq_pairs // nentity, return_counts=True)[1]
    if counts.size and counts.max() >= nentity:
        raise ValueError(
            "a positive's TRAIN-true partner set covers every entity "
            f"— no valid negatives exist (mode={mode})"
        )
    # gap sampling needs each key's value list unique AND sorted (the
    # order-statistic shift counts strict gaps) — build from the
    # deduplicated pairs; membership semantics are unchanged, and counts
    # now agree with the coverage guard above
    idx = TrueIndex.build(uniq_pairs // nentity,
                          (uniq_pairs % nentity).astype(np.int32))
    return dense_key_arrays(idx, n_keys, pad_value=nentity)


class _EpochIndexStream:
    """Host-side epoch permutation stream (the DataLoader(shuffle=True) +
    infinite-iterator semantics of negative.py): draws ``count`` row
    indices per call from reshuffled passes over the pool. ONE
    implementation for the single-device and mesh samplers (multihost edge
    partitioning = a subset pool)."""

    def __init__(self, n_train: int, index_subset, seed: int, count: int):
        self._pool = (
            np.asarray(index_subset, np.int64)
            if index_subset is not None
            else np.arange(n_train, dtype=np.int64)
        )
        if len(self._pool) == 0:
            raise ValueError("empty train-stream shard — nothing to sample")
        self._order = np.empty(0, np.int64)
        self._rng = np.random.default_rng(seed)
        self._count = count

    def next(self) -> np.ndarray:
        while self._order.size < self._count:
            self._order = np.concatenate(
                [self._order, self._rng.permutation(self._pool)]
            )
        idx, self._order = (
            self._order[: self._count],
            self._order[self._count:],
        )
        return idx.astype(np.int32)


class _DeviceCSR:
    """Device-resident CSR over a dense composite-key space: for key k the
    true values are ``values[offsets[k] : offsets[k] + counts[k]]``."""

    def __init__(self, keys: np.ndarray, vals: np.ndarray, n_keys: int,
                 sentinel: int):
        from ..data.filterset import TrueIndex, dense_key_arrays

        idx = TrueIndex.build(keys.astype(np.int64), vals)
        offsets, counts, values, self.k_max = dense_key_arrays(
            idx, n_keys, pad_value=sentinel
        )
        self.values = jnp.asarray(values)
        self.offsets = jnp.asarray(offsets)
        self.counts = jnp.asarray(counts)

    @classmethod
    def from_arrays(cls, offsets, counts, values, k_max: int) -> "_DeviceCSR":
        self = cls.__new__(cls)
        self.offsets = jnp.asarray(offsets)
        self.counts = jnp.asarray(counts)
        self.values = jnp.asarray(values)
        self.k_max = int(k_max)
        return self

    def member(self, keys: jnp.ndarray, cand: jnp.ndarray) -> jnp.ndarray:
        return csr_member(self.offsets, self.counts, self.values, self.k_max,
                          keys, cand)


class DeviceSampler:
    """Device-resident train-batch sampler for one corruption mode.

    Host keeps only the epoch permutation stream (same
    ``DataLoader(shuffle=True)`` + infinite-iterator semantics as
    negative.py §TrainSampler); everything else happens in one jitted
    program per mode.
    """

    def __init__(self, triples: np.ndarray, nentity: int, nrelation: int,
                 batch_size: int, negative_sample_size: int, mode: str,
                 seed: int = 0, negative_sharing: str = "none",
                 index_subset=None, shared_state=None):
        assert mode in (HEAD_BATCH, TAIL_BATCH)
        triples = np.asarray(triples, np.int32)
        if len(triples) == 0:
            raise ValueError("empty train split — nothing to sample")
        validate_key_space(nentity, nrelation, negative_sharing)
        self.mode = mode
        self.nentity = nentity
        self.nrelation = nrelation
        self.batch_size = batch_size
        self.n = negative_sample_size
        self.negative_sharing = negative_sharing
        self.n_train = len(triples)

        # device-resident state; triples/weights are mode-independent and
        # shared between the head/tail samplers (one upload, one HBM copy)
        if shared_state is not None:
            self.triples, self.weights = shared_state
        else:
            self.triples = jnp.asarray(triples)
            self.weights = jnp.asarray(subsampling_weights(triples, nrelation))

        self.csr = None
        if negative_sharing != "batch":
            self.csr = _DeviceCSR.from_arrays(
                *build_mode_csr(triples, nentity, nrelation, mode)
            )

        self._key = jax.random.PRNGKey(seed)
        # multihost edge partitioning: the host-side epoch permutation draws
        # only this host's row indices; the resident triples/weights/filter
        # CSR stay FULL-train (reference semantics, same as negative.py)
        self._stream = _EpochIndexStream(
            self.n_train, index_subset, seed, batch_size
        )
        self._sample = jax.jit(
            functools.partial(self._sample_impl, self),
            static_argnums=(),
        )

    # ---- host side: epoch permutation stream (tiny) ----
    def _next_indices(self) -> np.ndarray:
        return self._stream.next()

    # ---- device side: the whole sampling pipeline, jitted ----
    @staticmethod
    def _sample_impl(self, rng: jax.Array, idx: jnp.ndarray):
        shared = self.negative_sharing == "batch"
        csr = (None if shared else {
            "offsets": self.csr.offsets, "counts": self.csr.counts,
            "values": self.csr.values,
        })
        return sample_batch(
            self.triples, self.weights, csr,
            0 if shared else self.csr.k_max, rng, idx, self.mode,
            nentity=self.nentity, nrelation=self.nrelation, n=self.n,
            shared=shared,
        )

    def next_batch(self):
        self._key, sub = jax.random.split(self._key)
        idx = jnp.asarray(self._next_indices())  # the ONLY per-step H2D
        pos, neg, weight = self._sample(sub, idx)
        return pos, neg, weight, self.mode


class DeviceBidirectionalIterator:
    """Tail-first strict alternation (same contract as
    negative.py §BidirectionalIterator), with a device-side lookahead queue:
    batch k+depth is dispatched before batch k is returned, so the tiny idx
    transfer and the sampling program are always in flight ahead of the
    consumer's train step."""

    def __init__(self, head: DeviceSampler, tail: DeviceSampler, depth: int = 2):
        self._samplers = (head, tail)  # counter parity: odd steps -> tail,
        # so the FIRST batch is tail-batch, like the reference iterator
        self.step = 0
        self._queue = []
        self._depth = max(1, depth)
        for _ in range(self._depth):
            self._enqueue()

    def _enqueue(self):
        self.step += 1
        sampler = self._samplers[self.step % 2]
        self._queue.append(sampler.next_batch())

    def __iter__(self):
        return self

    def __next__(self):
        self._enqueue()
        return self._queue.pop(0)

    def close(self):
        self._queue.clear()


def build_device_iterator(train: np.ndarray, nentity: int, nrelation: int,
                          batch_size: int, negative_sample_size: int,
                          seed: int = 0, negative_sharing: str = "none",
                          depth: int = 2, index_subset=None):
    head = DeviceSampler(train, nentity, nrelation, batch_size,
                         negative_sample_size, HEAD_BATCH, seed=seed,
                         negative_sharing=negative_sharing,
                         index_subset=index_subset)
    tail = DeviceSampler(train, nentity, nrelation, batch_size,
                         negative_sample_size, TAIL_BATCH, seed=seed + 1,
                         negative_sharing=negative_sharing,
                         index_subset=index_subset,
                         shared_state=(head.triples, head.weights))
    return DeviceBidirectionalIterator(head, tail, depth=depth)


# ---------------------------------------------------------------------------
# Mesh-wide SPMD device sampler (single- AND multi-host)
# ---------------------------------------------------------------------------

def _place_replicated(x, mesh):
    """Host array -> globally-replicated mesh array. Multi-process: every
    host holds the identical full copy (same train file), so each
    contributes it via make_array_from_process_local_data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


class MeshDeviceSampler:
    """SPMD device sampler over a jax.sharding.Mesh — the design goal the
    single-device sampler's docstring states, realized: EACH DEVICE samples
    its own shard of the global batch, on-device, inside one jitted
    shard_map program. Hosts ship only their [B/P] epoch-permutation index
    rows (plus a step scalar) per step; the emitted pos/neg/weight are
    GLOBAL arrays already laid out with the trainer's batch shardings
    (sharding.batch_specs), so the train step consumes them with ZERO
    host-side assembly — on a multi-host fleet no host ever touches batch
    payload at all.

    Semantics match the host/multihost sampler stack (negative.py + the
    CLI's edge partitioning): per-host epoch permutation over its
    round-robin shard of the train rows, full-train subsampling weights and
    TRAIN-true rejection filtering, iid uniform negatives per device
    (per-device RNG streams via fold_in(axis_index)). Shared-negative mode
    draws ONE [1, n] set from the un-folded key — identical on every
    device/host, satisfying its replicated sharding by construction.
    """

    def __init__(self, triples: np.ndarray, nentity: int, nrelation: int,
                 batch_size: int, negative_sample_size: int, mode: str,
                 mesh, seed: int = 0, negative_sharing: str = "none",
                 index_subset=None, shared_state=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert mode in (HEAD_BATCH, TAIL_BATCH)
        triples = np.asarray(triples, np.int32)
        if len(triples) == 0:
            raise ValueError("empty train split — nothing to sample")
        n_proc = jax.process_count()
        if batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by the "
                f"{mesh.devices.size}-device mesh"
            )
        if batch_size % n_proc != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by {n_proc} hosts"
            )
        validate_key_space(nentity, nrelation, negative_sharing)
        self.mode = mode
        self.mesh = mesh
        self.nentity = nentity
        self.nrelation = nrelation
        self.batch_size = batch_size
        self.n = negative_sample_size
        self.negative_sharing = negative_sharing
        self._local_b = batch_size // n_proc
        self._idx_sharding = NamedSharding(mesh, P("data"))

        if shared_state is not None:
            state = dict(shared_state)
        else:
            state = {
                "triples": _place_replicated(triples, mesh),
                "weights": _place_replicated(
                    np.asarray(subsampling_weights(triples, nrelation),
                               np.float32), mesh),
            }
        self._mode_state = {}
        k_max = 0
        if negative_sharing != "batch":
            offsets, counts_arr, values, k_max = build_mode_csr(
                triples, nentity, nrelation, mode
            )
            self._mode_state = {
                "offsets": _place_replicated(offsets, mesh),
                "counts": _place_replicated(counts_arr, mesh),
                "values": _place_replicated(values, mesh),
            }
            self._csr_k_max = int(k_max)
        self._state = {**state, **self._mode_state}
        self._shareable_state = state  # triples/weights: mode-independent

        # host side: per-host epoch permutation over its edge-partition
        # shard; the DEVICE-draw seed stays host-independent (every device
        # folds its own mesh position into the same base key)
        self._stream = _EpochIndexStream(
            len(triples), index_subset,
            seed + 7919 * jax.process_index(), self._local_b,
        )
        self._step = 0

        self._sample = jax.jit(
            functools.partial(
                _mesh_sample, mesh=mesh, mode=mode, nentity=nentity,
                nrelation=nrelation, n=self.n,
                negative_sharing=negative_sharing, k_max=int(k_max),
                seed=seed,
            ),
            static_argnums=(),
            in_shardings=(
                jax.tree.map(lambda _: NamedSharding(mesh, P()), self._state),
                NamedSharding(mesh, P()),
                self._idx_sharding,
            ),
        )

    def _next_indices(self) -> np.ndarray:
        return self._stream.next()

    def next_batch(self):
        local_idx = self._next_indices()
        if jax.process_count() == 1:
            idx = jax.device_put(local_idx, self._idx_sharding)
        else:
            idx = jax.make_array_from_process_local_data(
                self._idx_sharding, local_idx
            )
        self._step += 1
        pos, neg, weight = self._sample(
            self._state, np.int32(self._step), idx
        )
        return pos, neg, weight, self.mode


def _mesh_sample(state, step, idx, *, mesh, mode, nentity, nrelation, n,
                 negative_sharing, k_max, seed):
    """One SPMD sampling step: shard_map over the mesh, per-device draws.
    Jitted by MeshDeviceSampler.__init__ (one compiled program per sampler;
    the keyword configuration is baked via functools.partial)."""
    from jax.sharding import PartitionSpec as P

    shared = negative_sharing == "batch"

    def per_device(state, step, idx_local):
        base = jax.random.fold_in(jax.random.PRNGKey(seed), step)
        # shared negatives use the UN-folded key: the identical [1, n] set
        # on every device, satisfying the replicated out_spec by
        # construction; per-positive draws fold in the mesh position for
        # independent per-device streams
        key = (base if shared
               else jax.random.fold_in(base, jax.lax.axis_index("data")))
        csr = None if shared else {
            "offsets": state["offsets"], "counts": state["counts"],
            "values": state["values"],
        }
        return sample_batch(
            state["triples"], state["weights"], csr, k_max, key, idx_local,
            mode, nentity=nentity, nrelation=nrelation, n=n, shared=shared,
        )

    neg_spec = P(None, None) if negative_sharing == "batch" else P("data", None)
    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), state), P(), P("data")),
        out_specs=(P("data", None), neg_spec, P("data")),
        check_vma=True,
    )(state, step, idx)


def build_mesh_device_iterator(mesh, train: np.ndarray, nentity: int,
                               nrelation: int, batch_size: int,
                               negative_sample_size: int, seed: int = 0,
                               negative_sharing: str = "none", depth: int = 2,
                               index_subset=None):
    """Tail-first alternating mesh sampler pair (same contract as
    build_device_iterator, emitting mesh-global batches)."""
    head = MeshDeviceSampler(train, nentity, nrelation, batch_size,
                             negative_sample_size, HEAD_BATCH, mesh,
                             seed=seed, negative_sharing=negative_sharing,
                             index_subset=index_subset)
    tail = MeshDeviceSampler(train, nentity, nrelation, batch_size,
                             negative_sample_size, TAIL_BATCH, mesh,
                             seed=seed + 1, negative_sharing=negative_sharing,
                             index_subset=index_subset,
                             shared_state=head._shareable_state)
    return DeviceBidirectionalIterator(head, tail, depth=depth)
