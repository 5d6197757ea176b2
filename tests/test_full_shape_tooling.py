"""Resume-exactness of tools/full_shape_parity.py's torch-leg checkpointing.

The f32 full-shape leg costs hours of single-core torch
(tools/full_shape_parity.py §leg_f32); its train/eval loops persist progress
so a session or round boundary mid-run resumes instead of restarting. These
tests pin that an interrupted+resumed run is BIT-IDENTICAL to an
uninterrupted one (params, windows, Adam state effects, ranks) at toy
shapes — the same loop code the full-shape leg executes.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

_spec = importlib.util.spec_from_file_location(
    "full_shape_parity", os.path.join(REPO, "tools", "full_shape_parity.py"))
fsp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and fsp)

E, R, D, B, N = 48, 5, 8, 16, 12
STEPS, WARM, LOG = 6, 3, 2


def _toy(model_name="RotatE"):
    from knowledgegraphembedding_tpu.config import ModelSpec
    from knowledgegraphembedding_tpu.models import kge
    import jax

    spec = ModelSpec(model_name=model_name, nentity=E, nrelation=R,
                     hidden_dim=D, gamma=4.0,
                     double_entity_embedding=(model_name == "RotatE"))
    p0 = kge.init_params(spec, jax.random.PRNGKey(3))
    rng = np.random.default_rng(7)
    batches = []
    for s in range(STEPS):
        pos = np.stack([rng.integers(0, E, B), rng.integers(0, R, B),
                        rng.integers(0, E, B)], axis=1).astype(np.int64)
        neg = rng.integers(0, E, (B, N)).astype(np.int64)
        w = np.full((B,), 0.5, np.float32)
        batches.append((pos, neg, w,
                        "head-batch" if s % 2 else "tail-batch"))
    return spec, p0, batches


@pytest.mark.parametrize("model_name", ["RotatE", "pRotatE"])
def test_run_torch_resume_bit_identical(tmp_path, monkeypatch, model_name):
    # run_torch dispatches the oracle via the module-global MODEL
    monkeypatch.setattr(fsp, "MODEL", model_name)
    spec, p0, batches = _toy(model_name)
    ref_ent, ref_rel, ref_win, ref_mod = fsp.run_torch(
        p0, batches, spec, dtype=torch.float32, steps=STEPS, warm_up=WARM,
        log=LOG)

    ck = str(tmp_path / "leg.ckpt")
    # "interrupt" after 4 of 6 steps (past the warm-up decay + Adam reset at
    # step 3, so the reset survives the round-trip), then resume to the end
    fsp.run_torch(p0, batches, spec, dtype=torch.float32, steps=4,
                  warm_up=WARM, log=LOG, ckpt_path=ck, save_every=2)
    assert os.path.exists(ck)
    ent, rel, win, mod = fsp.run_torch(
        p0, batches, spec, dtype=torch.float32, steps=STEPS, warm_up=WARM,
        log=LOG, ckpt_path=ck, save_every=2)

    assert win == ref_win
    assert torch.equal(ent, ref_ent)
    assert torch.equal(rel, ref_rel)
    # pRotatE's trainable modulus rides Adam alongside the tables
    # (codes/model.py §KGEModel.__init__ ≈L52-55); it must survive the
    # interrupt+resume round-trip bit-identically too
    if model_name == "pRotatE":
        assert mod is not None and torch.equal(mod, ref_mod)
    else:
        assert mod is None and ref_mod is None


def test_run_torch_resume_stale_ckpt_without_modulus_errors(
        tmp_path, monkeypatch):
    """A pre-modulus-era checkpoint resumed under a pRotatE spec must fail
    with an explicit message, not a bare KeyError (ADVICE r4 low)."""
    monkeypatch.setattr(fsp, "MODEL", "pRotatE")
    spec, p0, batches = _toy("pRotatE")
    ck = str(tmp_path / "stale.ckpt")
    fsp.run_torch(p0, batches, spec, dtype=torch.float32, steps=4,
                  warm_up=WARM, log=LOG, ckpt_path=ck, save_every=2)
    st = torch.load(ck, weights_only=False)
    del st["mod"]
    fsp._atomic_torch_save(st, ck)
    with pytest.raises(RuntimeError, match="stale checkpoint"):
        fsp.run_torch(p0, batches, spec, dtype=torch.float32, steps=STEPS,
                      warm_up=WARM, log=LOG, ckpt_path=ck, save_every=2)


def test_opt0_restores_strict_division_rounding():
    """The pRotatE f64 leg runs under --xla_backend_optimization_level=0
    because XLA:CPU's default pipeline strength-reduces division-by-
    constant into reciprocal-multiply + FMA contraction, which moves
    |sin| kink phases off exactly-0 (r5 root cause: an exact f32-grid
    a+b==c init collision gave torch phase 0/subgradient 0 but JAX
    4.5e-17/subgradient 1 -> 2e-5 Adam-amplified drift). This pins that
    the flag still buys strict per-op IEEE rounding — if a JAX upgrade
    breaks it, the parity harness's premise fails loudly here first.
    Subprocess: XLA_FLAGS must be set before backend init."""
    import subprocess

    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
scale = 0.0035014087480216972
# the recorded r5 collision: a + b == c exactly in f64
a, b, c = -0.010831356048583984, 0.0035430099815130234, -0.007288346067070961
assert np.float64(a) + np.float64(b) == np.float64(c)
f = jax.jit(lambda x, y, z: (x / scale + y / scale) - z / scale)
got = float(f(jnp.float64(a), jnp.float64(b), jnp.float64(c)))
want = float((np.float64(a) / scale + np.float64(b) / scale)
             - np.float64(c) / scale)
assert got == want == 0.0, (got, want)
print("STRICT_OK")
"""
    env = dict(os.environ, XLA_FLAGS="--xla_backend_optimization_level=0",
               JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "STRICT_OK" in out.stdout, (out.stdout, out.stderr[-2000:])


def test_filtered_ranks_resume_bit_identical(tmp_path, monkeypatch):
    from knowledgegraphembedding_tpu.data.filterset import FilterSets

    monkeypatch.setattr(fsp, "E", E)
    spec, p0, batches = _toy()
    ent = torch.tensor(np.array(p0["entity_embedding"]), dtype=torch.float32)
    rel = torch.tensor(np.array(p0["relation_embedding"]), dtype=torch.float32)
    rng = np.random.default_rng(11)
    # test split of 8 with batch=4 -> uniform 4-rank units, so truncating
    # the checkpoint at a unit boundary is ranks[:half*4]
    tri = np.stack([rng.integers(0, E, 38), rng.integers(0, R, 38),
                    rng.integers(0, E, 38)], axis=1).astype(np.int64)
    filters = FilterSets.build(tri[:30], tri, E, R)
    test = tri[30:]

    ref = fsp.torch_filtered_ranks(ent, rel, test, filters, spec, batch=4)

    # truncate a completed checkpoint to half the units -> resume must
    # reproduce the remaining units exactly
    ck = str(tmp_path / "eval.ckpt")
    full = fsp.torch_filtered_ranks(ent, rel, test, filters, spec, batch=4,
                                    ckpt_path=ck, save_every=1)
    assert np.array_equal(full, ref)
    st = torch.load(ck, weights_only=False)
    half = st["done"] // 2
    n_per_unit = len(st["ranks"]) // st["done"]
    fsp._atomic_torch_save(
        {"ranks": st["ranks"][: half * n_per_unit], "done": half}, ck)
    resumed = fsp.torch_filtered_ranks(ent, rel, test, filters, spec,
                                       batch=4, ckpt_path=ck, save_every=1)
    assert np.array_equal(resumed, ref)
