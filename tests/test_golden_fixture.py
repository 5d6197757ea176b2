"""Golden-file fixture in the EXACT upstream dataset format (VERDICT r1
next-item #2): real FB15k/-237-style slash names, WN18-style numeric
names, relation names with dots and slashes, an out-of-id-order
entities.dict, CRLF line endings (valid.txt), and a trailing blank line
(test.txt). The loader must round-trip all of it — the moment this code
meets a networked machine, tools/fetch_data.sh + this layout reproduce
BASELINE.md unchanged.

Reference: codes/run.py §read_triple ≈L133-145 + §main ≈L190-220 (the
dict/triple parsing this pins).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from knowledgegraphembedding_tpu.data.filterset import FilterSets
from knowledgegraphembedding_tpu.data.vocab import load_dataset, save_dataset

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_upstream")


def test_golden_fixture_loads_exactly():
    ds = load_dataset(FIXTURE)
    assert ds.nentity == 8 and ds.nrelation == 3
    # ids come from the dict FILE, not file order (entities.dict is shuffled)
    assert ds.entity2id["/m/027rn"] == 0
    assert ds.entity2id["/m/0f8l9c"] == 3
    assert ds.entity2id["02958343"] == 2
    assert ds.relation2id["/film/film./film/film/genre"] == 2
    assert ds.train.shape == (10, 3) and ds.train.dtype == np.int32
    np.testing.assert_array_equal(ds.train[0], [0, 0, 1])
    np.testing.assert_array_equal(ds.train[4], [4, 1, 6])
    # CRLF split must strip \r — names would otherwise miss the dict
    assert ds.valid.shape == (3, 3)
    np.testing.assert_array_equal(ds.valid[0], [0, 1, 3])
    # trailing blank line skipped
    assert ds.test.shape == (3, 3)
    np.testing.assert_array_equal(ds.test[2], [6, 0, 2])
    # the full downstream pipeline accepts it
    f = FilterSets.build(ds.train, ds.all_true_triples, ds.nentity, ds.nrelation)
    assert f.nentity == 8


def test_golden_fixture_round_trips(tmp_path):
    ds = load_dataset(FIXTURE)
    out = str(tmp_path / "rt")
    save_dataset(ds, out)
    ds2 = load_dataset(out)
    assert ds2.entity2id == ds.entity2id
    assert ds2.relation2id == ds.relation2id
    for split in ("train", "valid", "test"):
        np.testing.assert_array_equal(getattr(ds2, split), getattr(ds, split))


@pytest.mark.parametrize("corrupt", [False, True])
def test_fetch_data_validate_only(tmp_path, corrupt):
    """tools/fetch_data.sh --validate-only checks a populated tree against
    the published counts (countries_S1 used: smallest pinned dataset)."""
    d = tmp_path / "data" / "countries_S1"
    d.mkdir(parents=True)
    (d / "entities.dict").write_text(
        "".join(f"{i}\te{i}\n" for i in range(271)))
    (d / "relations.dict").write_text("0\tlocatedIn\n1\tneighborOf\n")
    ntr = 1110 if corrupt else 1111  # one dropped line must fail the check
    (d / "train.txt").write_text("e0\tlocatedIn\te1\n" * ntr)
    (d / "valid.txt").write_text("e0\tlocatedIn\te1\n" * 24)
    (d / "test.txt").write_text("e0\tlocatedIn\te1\n" * 24)
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "fetch_data.sh")
    r = subprocess.run(
        ["bash", script, "--validate-only", str(tmp_path / "data")],
        capture_output=True, text=True)
    if corrupt:
        assert r.returncode != 0 and "expected 1111" in r.stderr
    else:
        assert r.returncode == 0, r.stdout + r.stderr
        assert "ok countries_S1" in r.stdout
