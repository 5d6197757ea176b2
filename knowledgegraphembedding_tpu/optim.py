"""Dense Adam over embedding-table pytrees, with the reference's exact
optimizer-lifecycle semantics.

The reference uses ``torch.optim.Adam`` (codes/run.py §main ≈L250) with
default betas/eps and — crucially — *dense* gradients: the autograd of
``index_select`` produces a full-size gradient tensor, so every row's Adam
moments decay and every warm row keeps moving every step (SURVEY.md §3.1).
On TPU a dense per-shard update is perfectly regular and vectorizes onto the
VPU, so we reproduce those semantics exactly by default.

The reference's LR schedule constructs a *fresh* Adam at the warm-up
boundary (codes/run.py §main ≈L300: lr/=10, new Adam, warm_up*=3) — moments
AND the bias-correction step count reset. ``init_state`` is cheap, so the
host loop simply calls it again at the boundary.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: jnp.ndarray  # i32[] steps taken by THIS optimizer instance
    m: Dict[str, jnp.ndarray]  # first moments, same pytree as params
    v: Dict[str, jnp.ndarray]  # second moments


BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-8  # torch.optim.Adam defaults


def init_state(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        count=jnp.zeros((), jnp.int32),
        m=zeros,
        v=jax.tree.map(jnp.zeros_like, params),
    )


def apply_update(
    params, grads, state: AdamState, lr: jnp.ndarray
) -> Tuple[Dict[str, jnp.ndarray], AdamState]:
    """One torch-semantics Adam step:
    m <- b1 m + (1-b1) g;  v <- b2 v + (1-b2) g^2
    p <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
    """
    count = state.count + 1

    def upd(p, g, m, v):
        # bias correction in the PARAMS dtype: f32 runs keep the existing
        # arithmetic, while f64 runs (jax_enable_x64 trajectory-parity
        # harnesses) stay exact — a hardcoded f32 here seeds a ~1e-6
        # relative error (1 - 0.999 rounded in f32) into an otherwise
        # f64-exact trajectory
        t = count.astype(p.dtype)
        bc1 = 1.0 - BETA1**t
        bc2 = 1.0 - BETA2**t
        m = BETA1 * m + (1.0 - BETA1) * g
        v = BETA2 * v + (1.0 - BETA2) * (g * g)
        m_hat = m / bc1
        v_hat = v / bc2
        p = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
        return p, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(count=count, m=new_m, v=new_v)
