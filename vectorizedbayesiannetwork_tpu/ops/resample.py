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
    """weights [B, S] (normalized) -> ancestor indices [B, S] (int32).

    Search-free TPU form. With stratified positions p_j = (j + u0)/S the
    count of positions below each CDF step has the closed form
    ``t_i = ceil(S·cum_i − u0)``, and the ancestor of position j is
    ``a_j = #{i : t_i ≤ j}`` — one scatter-add histogram of the t_i plus a
    prefix sum. The previous ``searchsorted`` form lowered to ~20 rounds of
    random [B,S] gathers and measured 1.7 s at B=8, S=1M on v5e; this form
    measures ~8 ms end-to-end in RIS at the same shape.
    """
    b, s = weights.shape
    u0 = jax.random.uniform(key, (b, 1))
    cum = jnp.cumsum(weights, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-20)  # exact normalization (guard must be normal-range f32: TPUs flush subnormals)
    # t_i = number of positions strictly below cum_i, in [0, S]
    t = jnp.clip(jnp.ceil(s * cum - u0), 0, s).astype(jnp.int32)
    # histogram of t over 0..S per batch row, then inclusive prefix sum:
    # a_j = #{i: t_i <= j}
    hist = jnp.zeros((b, s + 1), jnp.int32)
    hist = jax.vmap(lambda h, ti: h.at[ti].add(1))(hist, t)
    a = jnp.cumsum(hist[:, : s], axis=1)
    return jnp.clip(a, 0, s - 1).astype(jnp.int32)


def multinomial_resample_indices(
    key: jax.Array, weights: jax.Array
) -> jax.Array:
    """i.i.d. multinomial ancestors [B, S] via per-draw inverse CDF."""
    b, s = weights.shape
    u = jax.random.uniform(key, (b, s))
    cum = jnp.cumsum(weights, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-20)
    idx = jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="left"))(cum, u)
    return jnp.clip(idx, 0, s - 1).astype(jnp.int32)


def gather_particles(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values [B, S, D], idx [B, S] -> resampled [B, S, D]."""
    return jnp.take_along_axis(values, idx[..., None], axis=1)
