"""Dense-Adam parity vs torch.optim.Adam, including multi-step trajectories
and the warm-up optimizer reset (SURVEY.md §3.5, §7 hard-parts)."""

import numpy as np
import torch

import jax.numpy as jnp

from knowledgegraphembedding_tpu import optim


def test_adam_matches_torch_multistep():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(12)]
    lr = 3e-3

    # torch trajectory
    p_t = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.Adam([p_t], lr=lr)
    for g in grads:
        opt.zero_grad()
        p_t.grad = torch.tensor(g)
        opt.step()

    # jax trajectory
    params = {"w": jnp.asarray(p0)}
    state = optim.init_state(params)
    for g in grads:
        params, state = optim.apply_update(
            params, {"w": jnp.asarray(g)}, state, jnp.float32(lr)
        )

    np.testing.assert_allclose(
        np.asarray(params["w"]), p_t.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_adam_reset_matches_fresh_torch_optimizer():
    """After the warm-up LR decay the reference constructs a FRESH Adam
    (codes/run.py §main ≈L300) — moments and bias-correction count restart."""
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(10)]
    lr1, lr2 = 1e-2, 1e-3

    p_t = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.Adam([p_t], lr=lr1)
    for g in grads[:5]:
        opt.zero_grad()
        p_t.grad = torch.tensor(g)
        opt.step()
    opt = torch.optim.Adam([p_t], lr=lr2)  # fresh instance — state resets
    for g in grads[5:]:
        opt.zero_grad()
        p_t.grad = torch.tensor(g)
        opt.step()

    params = {"w": jnp.asarray(p0)}
    state = optim.init_state(params)
    for g in grads[:5]:
        params, state = optim.apply_update(params, {"w": jnp.asarray(g)}, state, jnp.float32(lr1))
    state = optim.init_state(params)  # the reset
    for g in grads[5:]:
        params, state = optim.apply_update(params, {"w": jnp.asarray(g)}, state, jnp.float32(lr2))

    np.testing.assert_allclose(
        np.asarray(params["w"]), p_t.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_dense_moments_touch_every_row():
    """Reference parity detail (SURVEY.md §3.1): once a row's moment is
    nonzero it keeps moving on later steps even with zero gradient."""
    params = {"w": jnp.zeros((3, 2))}
    state = optim.init_state(params)
    g1 = jnp.asarray(np.array([[1, 1], [0, 0], [0, 0]], np.float32))
    params, state = optim.apply_update(params, {"w": g1}, state, jnp.float32(0.1))
    moved_after_1 = np.asarray(params["w"]).copy()
    # second step with ZERO grad: row 0 must still move (moment decay)
    g0 = jnp.zeros((3, 2))
    params, state = optim.apply_update(params, {"w": g0}, state, jnp.float32(0.1))
    assert not np.allclose(np.asarray(params["w"])[0], moved_after_1[0])
    assert np.allclose(np.asarray(params["w"])[1:], 0.0)
