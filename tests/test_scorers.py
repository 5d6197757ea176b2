"""Oracle parity: JAX scorers vs the pure-PyTorch reference oracle —
scores AND gradients allclose on fixed inputs for all five models × three
modes (SURVEY.md §4 item a)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from knowledgegraphembedding_tpu.config import ModelSpec
from knowledgegraphembedding_tpu.models import kge, scorers

import oracle_torch as oracle

CASES = [
    # (model, double_entity, double_relation)
    ("TransE", False, False),
    ("DistMult", False, False),
    ("ComplEx", True, True),
    ("RotatE", True, False),
    ("pRotatE", False, False),
]
MODES = ["single", "head-batch", "tail-batch"]


def make_spec(model, de, dr, nentity=50, nrelation=7, dim=16, gamma=12.0):
    return ModelSpec(
        model_name=model, nentity=nentity, nrelation=nrelation,
        hidden_dim=dim, gamma=gamma,
        double_entity_embedding=de, double_relation_embedding=dr,
    )


def make_inputs(spec, B=5, n=9, seed=0):
    rng = np.random.default_rng(seed)
    r = spec.embedding_range
    ent = rng.uniform(-r, r, (spec.nentity, spec.entity_dim)).astype(np.float32)
    rel = rng.uniform(-r, r, (spec.nrelation, spec.relation_dim)).astype(np.float32)
    pos = np.stack(
        [
            rng.integers(0, spec.nentity, B),
            rng.integers(0, spec.nrelation, B),
            rng.integers(0, spec.nentity, B),
        ],
        axis=1,
    ).astype(np.int32)
    neg = rng.integers(0, spec.nentity, (B, n)).astype(np.int32)
    return ent, rel, pos, neg


@pytest.mark.parametrize("model,de,dr", CASES)
@pytest.mark.parametrize("mode", MODES)
def test_score_parity(model, de, dr, mode):
    spec = make_spec(model, de, dr)
    ent, rel, pos, neg = make_inputs(spec)
    params = {
        "entity_embedding": jnp.asarray(ent),
        "relation_embedding": jnp.asarray(rel),
    }
    modulus_val = 0.5 * spec.embedding_range
    if spec.has_modulus:
        params["modulus"] = jnp.float32(modulus_val)

    sample = jnp.asarray(pos) if mode == "single" else (jnp.asarray(pos), jnp.asarray(neg))
    got = np.asarray(kge.forward(params, spec, sample, mode))

    want = oracle.forward(
        torch.tensor(ent), torch.tensor(rel),
        torch.tensor(pos, dtype=torch.long), torch.tensor(neg, dtype=torch.long),
        mode, model, spec.gamma, spec.embedding_range,
        modulus=torch.tensor(modulus_val) if spec.has_modulus else None,
    ).numpy()

    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    if mode == "single":
        assert got.shape == (pos.shape[0], 1)
    else:
        assert got.shape == neg.shape


@pytest.mark.parametrize("model,de,dr", CASES)
@pytest.mark.parametrize("mode", ["head-batch", "tail-batch"])
def test_grad_parity(model, de, dr, mode):
    """d(sum of scores)/d(tables) matches torch autograd."""
    spec = make_spec(model, de, dr)
    ent, rel, pos, neg = make_inputs(spec, seed=3)
    modulus_val = 0.5 * spec.embedding_range

    def jax_obj(ent_j, rel_j, mod_j):
        params = {"entity_embedding": ent_j, "relation_embedding": rel_j}
        if spec.has_modulus:
            params["modulus"] = mod_j
        s = kge.forward(params, spec, (jnp.asarray(pos), jnp.asarray(neg)), mode)
        return jnp.sum(s * jnp.cos(jnp.arange(s.size).reshape(s.shape)))  # non-trivial weights

    g_ent, g_rel, g_mod = jax.grad(jax_obj, argnums=(0, 1, 2))(
        jnp.asarray(ent), jnp.asarray(rel), jnp.float32(modulus_val)
    )

    ent_t = torch.tensor(ent, requires_grad=True)
    rel_t = torch.tensor(rel, requires_grad=True)
    mod_t = torch.tensor(modulus_val, requires_grad=True)
    s = oracle.forward(
        ent_t, rel_t, torch.tensor(pos, dtype=torch.long),
        torch.tensor(neg, dtype=torch.long), mode, model, spec.gamma,
        spec.embedding_range, modulus=mod_t if spec.has_modulus else None,
    )
    w = torch.cos(torch.arange(s.numel(), dtype=torch.float32).reshape(s.shape))
    (s * w).sum().backward()

    np.testing.assert_allclose(
        np.asarray(g_ent), ent_t.grad.numpy(), rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_rel), rel_t.grad.numpy(), rtol=3e-4, atol=3e-5
    )
    if spec.has_modulus:
        np.testing.assert_allclose(
            np.asarray(g_mod), mod_t.grad.numpy(), rtol=3e-4, atol=3e-5
        )


def test_headbatch_tailbatch_agree_rotate():
    """RotatE's two grouped forms are the same math: scoring the SAME triples
    in either mode must agree (|h∘r−t| == |conj(r)∘t−h| when |r|=1)."""
    spec = make_spec("RotatE", True, False)
    ent, rel, pos, _ = make_inputs(spec, B=8, n=1)
    params = {
        "entity_embedding": jnp.asarray(ent),
        "relation_embedding": jnp.asarray(rel),
    }
    neg_h = pos[:, :1]  # "negative" = the true head
    neg_t = pos[:, 2:]  # "negative" = the true tail
    s_head = kge.forward(params, spec, (jnp.asarray(pos), jnp.asarray(neg_h)), "head-batch")
    s_tail = kge.forward(params, spec, (jnp.asarray(pos), jnp.asarray(neg_t)), "tail-batch")
    s_single = kge.forward(params, spec, jnp.asarray(pos), "single")
    np.testing.assert_allclose(np.asarray(s_head), np.asarray(s_single), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_tail), np.asarray(s_single), rtol=1e-4, atol=1e-4)


def test_model_spec_validation():
    with pytest.raises(ValueError):
        make_spec("RotatE", False, False)
    with pytest.raises(ValueError):
        make_spec("ComplEx", True, False)
    with pytest.raises(ValueError):
        make_spec("NoSuchModel", False, False)


def test_abs_kink_subgradient_matches_torch():
    """d|x|/dx at EXACTLY 0 must be 0 (torch's sign(0) convention), not
    JAX's default +1. Embedding init values are f32-granular, so exact
    cancellations in h + r - t really occur (~1 per 33M score elements at
    the FB15k-237 TransE shape, measured by tools/full_shape_parity.py:
    one kink element drove a 5.6e-7 f64 param drift vs torch's own 3e-15
    op-order noise). TransE's L1 and pRotatE's |sin| both route through
    scorers.abs_ref (reference: codes/model.py §TransE ≈L172, §pRotatE
    ≈L247 — torch.norm(p=1)/abs backward is sign(x))."""
    import jax

    g = jax.grad(scorers.abs_ref)(0.0)
    assert float(g) == 0.0
    assert float(jax.grad(scorers.abs_ref)(2.0)) == 1.0
    assert float(jax.grad(scorers.abs_ref)(-2.0)) == -1.0

    # the kink inside a full TransE loss-shaped expression: a score element
    # that is exactly zero contributes zero gradient to every operand
    def transe_sum(h):
        r = jnp.asarray([1.0, 2.0])
        t = jnp.asarray([4.0, -1.0])  # h+r-t == [0, 4] at h=[3, 1]
        return jnp.sum(scorers.transe(h, r, t, 9.0, "single"))

    gh = jax.grad(transe_sum)(jnp.asarray([3.0, 1.0]))
    assert float(gh[0]) == 0.0      # the exactly-cancelled column
    assert float(gh[1]) == -1.0     # ordinary column: -d|x|/dx = -sign(4)

    def protate_sum(h):
        # phase difference exactly 0 in col 0 via identical h/t, r = 0;
        # col 1's phase diff is pi/4 — away from the |sin| extremum, so
        # its gradient is O(1) (cos(pi/4)), not f32 rounding noise of
        # cos(pi/2) (ADVICE r4 low)
        r = jnp.asarray([0.0, 0.5])
        t = jnp.asarray([3.0, 1.0])
        return jnp.sum(scorers.protate(
            h, r, t, 9.0, 2.0, jnp.asarray(1.0), "single"))

    gp = jax.grad(protate_sum)(jnp.asarray([3.0, 1.0]))
    assert float(gp[0]) == 0.0
    assert abs(float(gp[1])) > 0.5  # ~ modulus * cos(pi/4) * pi/2
