"""Fixed-shape particle resampling primitives.

The reference resamples with ``torch.multinomial``
(``vbn/inference/resampled_importance_sampling.py:33-41``) — data-dependent
host control flow. Here resampling is a fixed-shape device op usable inside
jit/scan: multinomial via Gumbel top-k-free inverse-CDF, plus systematic
resampling (lower variance, the standard SMC choice). When particles are
sharded over a mesh the cumulative-sum/search pattern maps to a psum +
all_gather of shard prefix sums (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def systematic_resample_indices(
    key: jax.Array, weights: jax.Array
) -> jax.Array:
    """weights [B, S] (normalized) -> ancestor indices [B, S] (int32)."""
    b, s = weights.shape
    u0 = jax.random.uniform(key, (b, 1))
    positions = (u0 + jnp.arange(s, dtype=weights.dtype)[None, :]) / s
    cum = jnp.cumsum(weights, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-38)  # exact normalization
    idx = jax.vmap(
        lambda c, p: jnp.searchsorted(c, p, side="left")
    )(cum, positions)
    return jnp.clip(idx, 0, s - 1).astype(jnp.int32)


def multinomial_resample_indices(
    key: jax.Array, weights: jax.Array
) -> jax.Array:
    """i.i.d. multinomial ancestors [B, S] via per-draw inverse CDF."""
    b, s = weights.shape
    u = jax.random.uniform(key, (b, s))
    cum = jnp.cumsum(weights, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-38)
    idx = jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="left"))(cum, u)
    return jnp.clip(idx, 0, s - 1).astype(jnp.int32)


def gather_particles(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values [B, S, D], idx [B, S] -> resampled [B, S, D]."""
    return jnp.take_along_axis(values, idx[..., None], axis=1)
