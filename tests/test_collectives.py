"""Pin the SPMD collective schedules in the COMPILED artifact (VERDICT r1
next-item #3): each --spmd_mode's optimized HLO must contain exactly the
collectives its design doc claims (shard_map_step.py / routed_step.py /
BENCH_NOTES.md §Multi-chip collective choice), with byte counts matching the
analytic table — the multi-chip scaling story machine-checked, not prose.

Shapes are scaled down (compile time on the virtual CPU mesh), but every
byte assertion uses the SAME closed-form formulas as BENCH_NOTES.md; the
reference-scale crossover arithmetic is asserted separately at true
FB15k-237 / YAGO3-10 sizes.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu import optim
from knowledgegraphembedding_tpu.config import ModelSpec, TrainSpec
from knowledgegraphembedding_tpu.models import kge
from knowledgegraphembedding_tpu.parallel import sharding
from knowledgegraphembedding_tpu.parallel.routed_step import (
    _capacity,
    make_routed_train_step,
)
from knowledgegraphembedding_tpu.parallel.shard_map_step import make_shardmap_train_step

N_DEV = 8
E, R, HID, B, N = 1408, 11, 64, 256, 64  # E % N_DEV == 0 -> Epad == E
D_ENT = 2 * HID  # RotatE -de

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "pred": 1, "s8": 1,
                "u8": 1}
# "= <shape or tuple> <collective>(" — excludes get-tuple-element users
_COLL_RE = re.compile(
    r"= *(\([^)]*\)|\S+) (all-gather|reduce-scatter|all-to-all|all-reduce)\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _collectives(hlo_text):
    """[(op, total_bytes, [shapes])] for every collective instruction."""
    out = []
    for m in _COLL_RE.finditer(hlo_text):
        shapes, nbytes = [], 0
        for dt, dims in _SHAPE_RE.findall(m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            nbytes += n * _DTYPE_BYTES[dt]
            shapes.append((dt, dims))
        out.append((m.group(2), nbytes, shapes))
    return out


@pytest.fixture(scope="module")
def compiled():
    """Optimized HLO text of one train step per spmd mode, plus the batch
    geometry used."""
    spec = ModelSpec(model_name="RotatE", nentity=E, nrelation=R,
                     hidden_dim=HID, gamma=6.0, double_entity_embedding=True)
    tspec = TrainSpec(negative_sample_size=N, batch_size=B,
                      negative_adversarial_sampling=True)
    mesh = sharding.build_mesh(N_DEV)
    params0 = kge.init_params(spec, jax.random.PRNGKey(0))
    p = sharding.shard_params(sharding.pad_params(params0, N_DEV), spec, mesh)
    s = sharding.shard_opt_state(optim.init_state(p), spec, mesh)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(np.stack(
        [rng.integers(0, E, B), rng.integers(0, R, B), rng.integers(0, E, B)],
        axis=1).astype(np.int32))
    neg = jnp.asarray(rng.integers(0, E, (B, N)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0.2, 1.0, B).astype(np.float32))
    args = (*sharding.shard_batch(mesh, pos, neg, w), jnp.float32(1e-2))

    texts = {}
    for name, make in (("shardmap", make_shardmap_train_step),
                       ("routed", make_routed_train_step),
                       ("gspmd", sharding.make_sharded_train_step)):
        fn = make(spec, tspec, mesh, "tail-batch")
        texts[name] = fn.lower(p, s, *args).compile().as_text()
    return texts


def test_shardmap_schedule_is_allgather_plus_reduce_scatter(compiled):
    """The claimed FSDP-style schedule (shard_map_step.py module doc):
    forward all-gathers the FULL table, backward reduce-scatters the dense
    grad; no all-to-all anywhere."""
    colls = _collectives(compiled["shardmap"])
    table_bytes = E * D_ENT * 4
    ag = [c for c in colls if c[0] == "all-gather"]
    rs = [c for c in colls if c[0] == "reduce-scatter"]
    assert [c[1] for c in ag] == [table_bytes], ag  # exactly ONE, full table
    assert [c[1] for c in rs] == [table_bytes // N_DEV], rs
    assert not [c for c in colls if c[0] == "all-to-all"], colls
    # BENCH_NOTES §Multi-chip row 1: ICI bytes/device/step = 2·E·d·4·(D−1)/D.
    # all-gather receives (D-1)/D of its output remotely; reduce-scatter
    # sends (D-1)/D of its input (= D· its output) remotely.
    ici = (ag[0][1] + rs[0][1] * N_DEV) * (N_DEV - 1) // N_DEV
    assert ici == 2 * E * D_ENT * 4 * (N_DEV - 1) // N_DEV


def test_routed_schedule_is_all_to_all_no_table_gather(compiled):
    """The claimed row-routing exchange (routed_step.py module doc): ids
    ride one all-to-all, rows ride one forward + one transposed backward
    all-to-all at the static capacity; the full table is NEVER gathered."""
    colls = _collectives(compiled["routed"])
    cap = _capacity(B // N_DEV * N, N_DEV, n_skewed=2 * (B // N_DEV))
    row_bytes = N_DEV * cap * D_ENT * 4  # [D, C, d] per exchange
    row_a2a = [c for c in colls if c[0] == "all-to-all" and c[1] == row_bytes]
    assert len(row_a2a) == 2, colls  # forward rows + transposed grad rows
    id_a2a = [c for c in colls if c[0] == "all-to-all"
              and c[1] == N_DEV * cap * 4 and c[2][0][0] == "s32"]
    assert len(id_a2a) == 1, colls  # request ids
    table_bytes = E * D_ENT * 4
    assert not [c for c in colls if c[0] == "all-gather"
                and c[1] >= table_bytes], colls
    # BENCH_NOTES §Multi-chip row 2 at the compiled shapes (with the honest
    # capacity padding): ICI bytes/device/step for the row payloads
    ici = 2 * row_bytes * (N_DEV - 1) // N_DEV
    analytic_min = 2 * (B // N_DEV) * (N + 2) * D_ENT * 4 * (N_DEV - 1) // N_DEV
    assert ici >= analytic_min  # capacity never under-provisions requests
    assert ici <= 3 * analytic_min  # ...and pads by a bounded factor


def test_gspmd_gathers_table_without_all_to_all(compiled):
    """GSPMD is XLA's choice (sharding.py): we pin only the claims the docs
    make — it partitions via a full-table all-gather + all-reduce-family
    grad combine, comparable to the hand schedule, and never falls back to
    a routed all-to-all."""
    colls = _collectives(compiled["gspmd"])
    table_bytes = E * D_ENT * 4
    assert [c for c in colls if c[0] == "all-gather" and c[1] == table_bytes]
    assert not [c for c in colls if c[0] == "all-to-all"], colls
    # the dense table grad is globally combined (all-reduce or
    # reduce-scatter, whichever XLA picked — observed: all-reduce)
    assert [c for c in colls if c[0] in ("all-reduce", "reduce-scatter")
            and c[1] >= table_bytes], colls


def test_reference_scale_crossover_arithmetic():
    """BENCH_NOTES §Multi-chip: at every reference best_config the table
    gather moves fewer bytes than row routing; crossover at E > B·(n+2)/2."""
    for E_, B_, n_ in ((14541, 1024, 256),    # FB15k-237
                       (40943, 512, 1024),    # WN18RR
                       (123182, 1024, 400)):  # YAGO3-10
        assert 2 * E_ < B_ * (n_ + 2), (E_, B_, n_)
    assert 2 * 2_000_000 > 1024 * (256 + 2)  # past ~1M entities routing wins
