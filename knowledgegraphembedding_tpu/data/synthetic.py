"""Synthetic knowledge-graph generators.

The build machine has no copy of FB15k/WN18RR/YAGO3-10 (zero egress), so
tests and benchmarks run on generated graphs with the same file format and
statistical shape as the reference's datasets (reference: data/<name>/
layout, SURVEY.md §2.1 #6).  Two generators:

  - ``make_random_kg``: scale-free-ish random graph at any (E, R, N) size —
    drives throughput benchmarks at FB15k-237/YAGO3-10 scale.
  - ``make_clustered_kg``: a *learnable* graph with planted block structure
    (entities in clusters; relations connect specific cluster pairs), the
    moral equivalent of countries_S1: a correct trainer must push filtered
    metrics far above chance within a few hundred steps, so it serves as the
    fast end-to-end smoke test (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

from .vocab import Dataset


def _dedup(triples: np.ndarray) -> np.ndarray:
    return np.unique(triples, axis=0)


def _split(triples: np.ndarray, rng: np.random.Generator, n_valid: int, n_test: int):
    if n_valid + n_test >= len(triples):
        raise ValueError(
            f"n_valid + n_test = {n_valid + n_test} >= {len(triples)} "
            "generated triples — the train split would be empty (dedup / "
            "self-loop filtering may have shrunk the graph)"
        )
    perm = rng.permutation(len(triples))
    triples = triples[perm]
    valid = triples[:n_valid]
    test = triples[n_valid : n_valid + n_test]
    train = triples[n_valid + n_test :]
    return train, valid, test


def make_random_kg(
    nentity: int = 1000,
    nrelation: int = 20,
    ntriples: int = 20000,
    n_valid: int = 500,
    n_test: int = 500,
    seed: int = 0,
) -> Dataset:
    """Random multigraph with mildly skewed entity popularity (Zipf-ish),
    matching the degree skew real KGs show (drives subsampling-weight paths)."""
    rng = np.random.default_rng(seed)
    # Zipf-ish popularity over entities
    pop = 1.0 / np.arange(1, nentity + 1) ** 0.7
    pop /= pop.sum()
    h = rng.choice(nentity, size=ntriples * 2, p=pop)
    t = rng.choice(nentity, size=ntriples * 2, p=pop)
    r = rng.integers(0, nrelation, size=ntriples * 2)
    triples = _dedup(np.stack([h, r, t], axis=1).astype(np.int32))
    triples = triples[triples[:, 0] != triples[:, 2]]
    # _dedup returns rows SORTED by (h, r, t): truncating directly would
    # keep only the smallest head ids and destroy the Zipf degree shape —
    # permute first so the kept subset is an unbiased sample
    triples = triples[rng.permutation(len(triples))[:ntriples]]
    train, valid, test = _split(triples, rng, n_valid, n_test)
    return Dataset(
        nentity=nentity, nrelation=nrelation,
        train=train, valid=valid, test=test, name="synthetic_random",
    )


def make_clustered_kg(
    n_clusters: int = 8,
    entities_per_cluster: int = 16,
    nrelation: int = 4,
    seed: int = 0,
    edge_prob: float = 0.6,
    n_valid: int = 64,
    n_test: int = 64,
) -> Dataset:
    """Planted-structure graph: relation k links cluster c -> cluster
    (c + k + 1) % n_clusters. Dense enough that held-out edges are
    predictable from the block structure — filtered MRR must rise well above
    chance if the model/loss/sampler are correct (countries_S1 stand-in)."""
    rng = np.random.default_rng(seed)
    E = n_clusters * entities_per_cluster
    cluster = np.arange(E) // entities_per_cluster
    triples = []
    for rel in range(nrelation):
        for c in range(n_clusters):
            src = np.where(cluster == c)[0]
            dst = np.where(cluster == (c + rel + 1) % n_clusters)[0]
            mask = rng.random((len(src), len(dst))) < edge_prob
            hh, tt = np.nonzero(mask)
            for a, b in zip(src[hh], dst[tt]):
                triples.append((a, rel, b))
    triples = _dedup(np.asarray(triples, np.int32))
    train, valid, test = _split(triples, rng, n_valid, n_test)
    return Dataset(
        nentity=E, nrelation=nrelation,
        train=train, valid=valid, test=test, name="synthetic_clustered",
    )


def make_countries_like(seed: int = 0) -> Dataset:
    """A tiny countries_S1-style dataset: entities = countries + regions;
    one relation ``locatedin``; every country is in exactly one region
    (region ids are the Dataset.regions list).  AUC-PR must approach 1.0
    after brief training, exactly as upstream uses countries_S1
    (SURVEY.md §4 item 2)."""
    rng = np.random.default_rng(seed)
    n_regions = 5
    n_countries = 120
    E = n_countries + n_regions
    region_of = rng.integers(0, n_regions, size=n_countries)
    regions = list(range(n_countries, E))
    # relation 0: locatedin(country, region); relation 1: neighbor(country, country)
    loc = np.stack(
        [np.arange(n_countries), np.zeros(n_countries, int), n_countries + region_of],
        axis=1,
    )
    # neighbors mostly within the same region (signal for generalization)
    nbrs = []
    for c in range(n_countries):
        same = np.where(region_of == region_of[c])[0]
        picks = rng.choice(same, size=min(3, len(same)), replace=False)
        for p in picks:
            if p != c:
                nbrs.append((c, 1, p))
    nbrs = np.asarray(nbrs, int)
    # hold out some locatedin edges as valid/test (the countries task)
    perm = rng.permutation(n_countries)
    test_c, valid_c, train_c = perm[:15], perm[15:30], perm[30:]
    ds = Dataset(
        nentity=E,
        nrelation=2,
        train=np.concatenate([loc[train_c], nbrs], axis=0).astype(np.int32),
        valid=loc[valid_c].astype(np.int32),
        test=loc[test_c].astype(np.int32),
        regions=regions,
        name="synthetic_countries",
    )
    return ds
