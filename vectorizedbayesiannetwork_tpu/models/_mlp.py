"""Pure-JAX MLP building block shared by the neural CPD families.

Replaces the reference's ``_build_mlp`` torch Sequential
(``vbn/cpds/gaussian_nn.py:16-34``) with an explicit parameter pytree and a
pure apply function — jit/vmap/shard friendly, and the MLP forward is a
chain of GEMMs XLA tiles onto the MXU. Initialization follows torch's
Linear default (Kaiming-uniform with fan-in bounds) so learning dynamics
match the reference's at matched hyperparameters.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
}


def check_activation(name: str) -> str:
    if name not in _ACTIVATIONS:
        raise ValueError(
            f"Unknown activation {name!r}; expected one of {sorted(_ACTIVATIONS)}"
        )
    return name


def mlp_init(
    key: jax.Array,
    input_dim: int,
    hidden_dims: Sequence[int],
    output_dim: int,
) -> Dict:
    """Create {'layers': [{'w': [in,out], 'b': [out]}, ...]}."""
    dims = [int(input_dim)] + [int(h) for h in hidden_dims] + [int(output_dim)]
    layers = []
    for i in range(len(dims) - 1):
        fan_in, fan_out = dims[i], dims[i + 1]
        bound = 1.0 / math.sqrt(max(1, fan_in))
        kw, kb = jax.random.split(jax.random.fold_in(key, i))
        layers.append(
            {
                "w": jax.random.uniform(
                    kw, (fan_in, fan_out), jnp.float32, -bound, bound
                ),
                "b": jax.random.uniform(
                    kb, (fan_out,), jnp.float32, -bound, bound
                ),
            }
        )
    return {"layers": layers}


def mlp_apply(params: Dict, x: jax.Array, activation: str) -> jax.Array:
    act = _ACTIVATIONS[activation]
    layers = params["layers"]
    h = x
    for i, layer in enumerate(layers):
        h = h @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            h = act(h)
    return h
