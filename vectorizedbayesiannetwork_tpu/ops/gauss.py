"""Fused Gaussian / numeric primitives shared by CPD kernels.

These are the elementwise building blocks XLA fuses into the surrounding
GEMMs (parity with the reference's ``vbn/cpds/utils.py`` helpers and the
per-CPD Gaussian NLL math, e.g. ``vbn/cpds/linear_gaussian.py:185-217``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def diag_gaussian_log_prob(
    x: jax.Array, loc: jax.Array, scale: jax.Array
) -> jax.Array:
    """Sum of independent Normal log-pdfs over the last axis.

    x/loc/scale broadcastable [..., D] -> [...].
    """
    z = (x - loc) / scale
    return -0.5 * jnp.sum(z * z + 2.0 * jnp.log(scale) + LOG_2PI, axis=-1)


def gaussian_log_prob(x: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Elementwise Normal log-pdf (no reduction)."""
    z = (x - loc) / scale
    return -0.5 * (z * z + 2.0 * jnp.log(scale) + LOG_2PI)


def safe_softplus(x: jax.Array, min_value: float = 0.0) -> jax.Array:
    return jax.nn.softplus(x) + min_value


def stable_log(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return jnp.log(jnp.maximum(x, eps))


def normalize_probs(p: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    p = jnp.maximum(p, 0.0)
    return p / jnp.maximum(jnp.sum(p, axis=axis, keepdims=True), eps)


def standardize_stats(x: jax.Array, eps: float = 1e-6):
    """Per-feature (mean, std>=eps) over axis 0."""
    mean = jnp.mean(x, axis=0)
    std = jnp.maximum(jnp.std(x, axis=0), eps)
    return mean, std
