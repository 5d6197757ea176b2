"""Native (C++/OpenMP) sampler: builds, never emits train-true collisions,
covers the entity range, and matches the numpy path's distribution."""

import numpy as np
import pytest

from knowledgegraphembedding_tpu import native
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.sampler import TrainSampler

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def make_env():
    ds = make_random_kg(nentity=300, nrelation=5, ntriples=3000, n_valid=200, n_test=200, seed=0)
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    return ds, filters


def test_no_collisions_and_range():
    ds, filters = make_env()
    for mode in ("head-batch", "tail-batch"):
        s = TrainSampler(ds.train, ds.nentity, ds.nrelation, 64, 33, mode,
                         filters, seed=1, backend="native")
        for _ in range(4):
            pos, neg, w, m = s.next_batch()
            assert neg.shape == (64, 33)
            assert neg.min() >= 0 and neg.max() < ds.nentity
            for i in range(64):
                h, r, t = (int(x) for x in pos[i])
                if mode == "head-batch":
                    true = set(filters.train_true_heads(r, t).tolist())
                else:
                    true = set(filters.train_true_tails(h, r).tolist())
                assert not (set(neg[i].tolist()) & true)


def test_distribution_uniform_over_allowed():
    """chi-square-ish sanity: over many draws for one positive, every
    allowed entity appears with roughly uniform frequency."""
    ds, filters = make_env()
    s = TrainSampler(ds.train, ds.nentity, ds.nrelation, 1, 4096, "tail-batch",
                     filters, seed=2, backend="native")
    pos = ds.train[:1]
    keys = s._row_keys(pos)
    draws = []
    for trial in range(20):
        draws.append(native.sample_negatives(s._true_enc, keys, ds.nentity, 4096, seed=trial))
    counts = np.bincount(np.concatenate(draws).ravel(), minlength=ds.nentity)
    h, r = int(pos[0, 0]), int(pos[0, 1])
    true_tails = filters.train_true_tails(h, r)
    assert counts[true_tails].sum() == 0
    allowed = np.ones(ds.nentity, bool)
    allowed[true_tails] = False
    expected = counts.sum() / allowed.sum()
    ratio = counts[allowed] / expected
    assert ratio.min() > 0.5 and ratio.max() < 1.7  # 20*4096 draws over ~298 bins


def test_count_members_matches_numpy():
    rng = np.random.default_rng(0)
    true_enc = np.sort(rng.choice(10_000, 500, replace=False).astype(np.int64))
    cand = rng.integers(0, 10_000, 5000).astype(np.int64)
    want = int(np.isin(cand, true_enc).sum())
    assert native.count_members(true_enc, cand) == want
