"""Dict-based Adam optimizer (pure pytree state, no optax objects).

Matches torch.optim.Adam semantics used by the reference's NN CPD training
loops (``vbn/cpds/gaussian_nn.py:156-171``): L2 weight decay folded into the
gradient (not decoupled), bias-corrected first/second moments. Keeping the
optimizer state as a plain nested dict of arrays makes it (a) persistable in
the framework's npz checkpoints exactly like model params — mirroring the
reference persisting its optimizer on the module — and (b) a first-class jit
input with no custom pytree registrations.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8
_B1 = 0.9
_B2 = 0.999


def adam_init(params) -> Dict:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree_util.tree_map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.float32),
    }


def adam_step(
    params,
    grads,
    state: Dict,
    lr: float,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
) -> Tuple[Dict, Dict]:
    """One Adam update. Returns (new_params, new_state)."""
    if weight_decay:
        grads = jax.tree_util.tree_map(
            lambda g, p: g + weight_decay * p, grads, params
        )
    if max_grad_norm is not None and max_grad_norm > 0:
        leaves = jax.tree_util.tree_leaves(grads)
        gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))
        clip = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * clip, grads)
    step = state["step"] + 1.0
    m = jax.tree_util.tree_map(
        lambda m_, g: _B1 * m_ + (1 - _B1) * g, state["m"], grads
    )
    v = jax.tree_util.tree_map(
        lambda v_, g: _B2 * v_ + (1 - _B2) * g * g, state["v"], grads
    )
    mhat_scale = 1.0 / (1.0 - _B1**step)
    vhat_scale = 1.0 / (1.0 - _B2**step)
    new_params = jax.tree_util.tree_map(
        lambda p, m_, v_: p
        - lr * (m_ * mhat_scale) / (jnp.sqrt(v_ * vhat_scale) + _EPS),
        params,
        m,
        v,
    )
    return new_params, {"m": m, "v": v, "step": step}
