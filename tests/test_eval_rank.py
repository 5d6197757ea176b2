"""Filtered-rank parity on a toy graph vs a brute-force oracle that mirrors
the reference's argsort procedure (codes/model.py §test_step ≈L332-390 and
codes/dataloader.py §TestDataset ≈L118-162), plus AUC-PR parity vs sklearn
(SURVEY.md §4 item c)."""

import numpy as np

import jax.numpy as jnp

from knowledgegraphembedding_tpu import eval as eval_mod
from knowledgegraphembedding_tpu.config import ModelSpec
from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.synthetic import make_random_kg
from knowledgegraphembedding_tpu.models import kge


def brute_force_rank(ent, rel, spec, triple, all_true, mode):
    """Reference procedure: score every candidate, set filtered candidates
    to (true_score - 1) via the id-replacement trick, argsort descending,
    find the true entity's position."""
    h, r, t = (int(x) for x in triple)
    E = spec.nentity
    params = {"entity_embedding": jnp.asarray(ent), "relation_embedding": jnp.asarray(rel)}
    cand = np.arange(E, dtype=np.int32)
    if mode == "head-batch":
        filtered = {hh for (hh, rr, tt) in all_true if rr == r and tt == t} - {h}
        pos = np.asarray([[h, r, t]], np.int32)
        neg_ids = cand.copy()
        true_ent = h
    else:
        filtered = {tt for (hh, rr, tt) in all_true if hh == h and rr == r} - {t}
        pos = np.asarray([[h, r, t]], np.int32)
        neg_ids = cand.copy()
        true_ent = t
    # reference replaces filtered candidate ids by the true entity and adds
    # bias -1 → their adjusted score is exactly true_score - 1
    for e in filtered:
        neg_ids[e] = true_ent
    scores = np.asarray(
        kge.forward(params, spec, (jnp.asarray(pos), jnp.asarray(neg_ids[None, :])), mode)
    )[0]
    bias = np.zeros(E, np.float32)
    bias[list(filtered)] = -1.0
    adj = scores + bias
    order = np.argsort(-adj, kind="stable")
    rank = int(np.where(order == true_ent)[0][0]) + 1
    return rank


def test_rank_parity_brute_force():
    ds = make_random_kg(nentity=60, nrelation=4, ntriples=600, n_valid=30, n_test=30, seed=5)
    spec = ModelSpec(
        model_name="RotatE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=8, gamma=6.0, double_entity_embedding=True,
    )
    rng = np.random.default_rng(0)
    r = spec.embedding_range
    ent = rng.uniform(-r, r, (ds.nentity, spec.entity_dim)).astype(np.float32)
    rel = rng.uniform(-r, r, (ds.nrelation, spec.relation_dim)).astype(np.float32)
    params = {"entity_embedding": jnp.asarray(ent), "relation_embedding": jnp.asarray(rel)}
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    all_true = set(map(tuple, ds.all_true_triples.tolist()))

    for mode in ("head-batch", "tail-batch"):
        test_triples = ds.test[:12]
        mask = filters.filter_mask_rows(test_triples, mode)
        mask_p = eval_mod._pad_mask(mask, 16)
        ranks = np.asarray(
            eval_mod.ranks_batch(
                params, jnp.asarray(test_triples), jnp.asarray(mask_p),
                spec=spec, mode=mode, chunk=16,
            )
        )
        for i, triple in enumerate(test_triples):
            want = brute_force_rank(ent, rel, spec, triple, all_true, mode)
            assert ranks[i] == want, (mode, i, ranks[i], want)


def test_metrics_shape_and_names():
    ds = make_random_kg(nentity=40, nrelation=3, ntriples=300, n_valid=10, n_test=10, seed=6)
    spec = ModelSpec(
        model_name="TransE", nentity=ds.nentity, nrelation=ds.nrelation,
        hidden_dim=8, gamma=6.0,
    )
    rng = np.random.default_rng(1)
    r = spec.embedding_range
    params = {
        "entity_embedding": jnp.asarray(
            rng.uniform(-r, r, (ds.nentity, spec.entity_dim)).astype(np.float32)
        ),
        "relation_embedding": jnp.asarray(
            rng.uniform(-r, r, (ds.nrelation, spec.relation_dim)).astype(np.float32)
        ),
    }
    filters = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    m = eval_mod.test_step(params, spec, ds.test, filters, test_batch_size=4, eval_chunk_size=16)
    assert set(m) == {"MRR", "MR", "HITS@1", "HITS@3", "HITS@10"}
    assert 0.0 < m["MRR"] <= 1.0
    assert 1.0 <= m["MR"] <= ds.nentity


def test_average_precision_vs_sklearn():
    try:
        from sklearn.metrics import average_precision_score
    except ImportError:
        import pytest

        pytest.skip("sklearn not available")
    rng = np.random.default_rng(2)
    for trial in range(5):
        y = (rng.random(50) < 0.3).astype(int)
        if y.sum() == 0:
            y[0] = 1
        s = rng.normal(size=50)
        s[3] = s[7]  # force a tie
        np.testing.assert_allclose(
            eval_mod.average_precision(y, s),
            average_precision_score(y, s),
            rtol=1e-6,
        )
