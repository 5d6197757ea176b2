"""Prefetch-pipeline determinism (SURVEY.md §5.2): the background prefetch
thread must deliver exactly the same batch sequence as the unbuffered
iterator for a given seed — no reordering, no drops, no races. Plus
multihost helper units (single-process semantics)."""

import numpy as np

from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.sampler import build_train_iterator


def collect(it, n):
    out = []
    for _ in range(n):
        pos, neg, w, mode = next(it)
        out.append((pos.copy(), neg.copy(), w.copy(), mode))
    return out


def test_prefetch_sequence_matches_unbuffered():
    ds = make_random_kg(nentity=150, nrelation=5, ntriples=1500, n_valid=100, n_test=100, seed=11)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)

    def build(depth):
        return build_train_iterator(
            ds.train, ds.nentity, ds.nrelation, 16, 8, filters,
            seed=42, prefetch_depth=depth, backend="numpy",
        )

    a = build(0)
    b = build(4)
    seq_a = collect(a, 25)
    seq_b = collect(b, 25)
    b.close()
    for (pa, na, wa, ma), (pb, nb, wb, mb) in zip(seq_a, seq_b):
        assert ma == mb
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(na, nb)
        np.testing.assert_array_equal(wa, wb)


def test_prefetch_close_is_idempotent_and_propagates_errors():
    class Boom:
        def __next__(self):
            raise RuntimeError("sampler exploded")

    from knowledgegraphembedding_tpu.sampler import PrefetchIterator
    import pytest

    it = PrefetchIterator(Boom(), depth=2)
    with pytest.raises(RuntimeError, match="sampler exploded"):
        next(it)
    it.close()
    it.close()  # second close must not hang or raise


def test_multihost_helpers_single_process():
    import jax
    from knowledgegraphembedding_tpu.parallel import multihost, sharding

    triples = np.arange(30).reshape(10, 3).astype(np.int32)
    assert multihost.host_shard_of_triples(triples).shape == (10, 3)
    assert multihost.host_batch_size(32) == 32
    mesh = sharding.build_mesh(8)
    pos = np.zeros((16, 3), np.int32)
    neg = np.zeros((1, 4), np.int32)  # shared negatives stay replicated
    w = np.zeros(16, np.float32)
    pos_d, neg_d, w_d = multihost.global_batch(mesh, pos, neg, w)
    assert pos_d.sharding.spec == jax.sharding.PartitionSpec("data", None)
    assert neg_d.sharding.spec == jax.sharding.PartitionSpec(None, None)


def test_verify_consistent_restore(monkeypatch):
    """§5.3 failure-recovery guard: no-op single-process; raises when a host
    restored a different (step, lr, warm_up) tuple (simulated via a mocked
    2-host allgather)."""
    import jax
    import pytest
    from jax.experimental import multihost_utils
    from knowledgegraphembedding_tpu.parallel import multihost

    multihost.verify_consistent_restore(100, 1e-4, 50000)  # single-process: ok

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x: np.stack([x, x]),
    )
    multihost.verify_consistent_restore(100, 1e-4, 50000)  # consistent fleet

    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x: np.stack([x, x * 0 + 7.0]),  # host 1 a save behind
    )
    with pytest.raises(RuntimeError, match="inconsistent restore"):
        multihost.verify_consistent_restore(100, 1e-4, 50000)
