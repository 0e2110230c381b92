"""KDE pairwise-kernel evaluation at MXU speed.

The KDE hot op (SURVEY.md §2.2 marks it as the natural blocked kernel) is
the O(M·N·D) pairwise Gaussian kernel between M query rows and N stored
support points. The reference evaluates it as broadcast subtract-square
chunks on the VPU-equivalent (``vbn/cpds/kde.py:131-147``). Here the
squared distance is expanded to ``||x||^2 - 2 x·t + ||t||^2`` so the cross
term becomes ONE GEMM on the MXU — the standard distance-matrix trick — and
the M axis is streamed in fixed-size chunks via ``lax.map`` so the [chunk,
N] logit tiles never exceed a bounded HBM footprint at 1M+ particles.

All outputs are exactly the masked logsumexp quantities of the naive form
(up to float associativity).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_CHUNK = 4096  # query rows per streamed tile; [_CHUNK, N] tiles stay ~64MB


def _pairwise_kernel_logits(
    q: jax.Array, data: jax.Array, scale: float
) -> jax.Array:
    """sum_d log N(q_m - t_n; 0, scale) -> [M, N] via one GEMM.

    precision=HIGHEST is required: TPU XLA defaults fp32 matmuls to a
    single bf16 MXU pass, whose ~0.4% relative error on the cross term
    becomes ~0.1 absolute error in the exponentiated kernel logits.
    """
    d = q.shape[-1]
    inv2s2 = 1.0 / (2.0 * scale * scale)
    cross = jnp.dot(q, data.T, precision=jax.lax.Precision.HIGHEST)
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    t2 = jnp.sum(data * data, axis=-1)[None, :]
    sq = q2 - 2.0 * cross + t2
    const = -d * (0.5 * math.log(2.0 * math.pi) + math.log(scale))
    return -sq * inv2s2 + const


def _chunked(fn, m: int, *arrays):
    """Apply fn over _CHUNK-row tiles of the leading axis, concatenated.

    Pads M to a multiple of the chunk so every tile has static shape.
    """
    if m <= _CHUNK:
        return fn(*arrays)
    n_chunks = -(-m // _CHUNK)
    m_pad = n_chunks * _CHUNK
    padded = [
        jnp.concatenate(
            [a, jnp.zeros((m_pad - m,) + a.shape[1:], a.dtype)], axis=0
        ).reshape(n_chunks, _CHUNK, *a.shape[1:])
        for a in arrays
    ]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(padded))
    return out.reshape(m_pad, *out.shape[2:])[:m]


def kde_log_prob(
    x: jax.Array,  # [M, Dx]
    parents: Optional[jax.Array],  # [M, Dp] or None (root)
    data_x: jax.Array,  # [N, Dx]
    data_p: jax.Array,  # [N, Dp]
    log_mask: jax.Array,  # [N] (0 valid, -inf-ish invalid)
    y_scale: float,
    p_scale: float,
) -> jax.Array:
    """Conditional KDE log density -> [M]."""
    m = x.shape[0]

    if parents is None or data_p.shape[-1] == 0:
        n_eff = jnp.maximum(jnp.sum(jnp.exp(log_mask)), 1.0)

        from .kde_pallas import (
            _DIRECT_D,
            kde_log_prob_root_fused,
            pallas_available,
        )

        if pallas_available() and x.shape[-1] <= _DIRECT_D:
            return kde_log_prob_root_fused(
                x, data_x, log_mask, y_scale
            ) - jnp.log(n_eff)

        def tile(xt):
            log_ky = _pairwise_kernel_logits(xt, data_x, y_scale)
            return jax.scipy.special.logsumexp(
                log_ky + log_mask[None, :], axis=1
            )

        return _chunked(tile, m, x) - jnp.log(n_eff)

    from .kde_pallas import kde_log_prob_fused, pallas_available

    if pallas_available():
        # Fused Pallas path on real TPUs: no HBM round trip for the
        # [chunk, N] logit tiles.
        return kde_log_prob_fused(
            x, parents, data_x, data_p, log_mask, y_scale, p_scale
        )

    def tile(xt, pt):
        log_ky = _pairwise_kernel_logits(xt, data_x, y_scale)
        log_kp = (
            _pairwise_kernel_logits(pt, data_p, p_scale) + log_mask[None, :]
        )
        num = jax.scipy.special.logsumexp(log_kp + log_ky, axis=1)
        den = jax.scipy.special.logsumexp(log_kp, axis=1)
        return num - den

    return _chunked(tile, m, x, parents)


def _chunked_keyed(fn, key: jax.Array, m: int, *arrays):
    """Like ``_chunked`` but hands each tile its own PRNG subkey.

    Random bits are generated PER TILE inside the mapped body — never as a
    full [M, N] array in HBM. (A [1M, 4k] Gumbel field is 16 GB; generating
    it tile-by-tile bounds the footprint at [_CHUNK, N].)
    """
    if m <= _CHUNK:
        return fn(key, *arrays)
    n_chunks = -(-m // _CHUNK)
    m_pad = n_chunks * _CHUNK
    keys = jax.random.split(key, n_chunks)
    padded = [
        jnp.concatenate(
            [a, jnp.zeros((m_pad - m,) + a.shape[1:], a.dtype)], axis=0
        ).reshape(n_chunks, _CHUNK, *a.shape[1:])
        for a in arrays
    ]
    out = jax.lax.map(lambda xs: fn(xs[0], *xs[1:]), (keys, *padded))
    return out.reshape(m_pad, *out.shape[2:])[:m]


def kde_sample_indices(
    key: jax.Array,
    parents: Optional[jax.Array],  # [M, Dp] or None
    data_p: jax.Array,  # [N, Dp]
    log_mask: jax.Array,  # [N]
    p_scale: float,
    m: int,
) -> jax.Array:
    """Parent-softmax-weighted support pick via Gumbel-argmax -> [M] int32."""
    n = data_p.shape[0]
    if parents is None or data_p.shape[-1] == 0:

        def tile_root(k):
            rows = min(m, _CHUNK)
            g = jax.random.gumbel(k, (rows, n))
            return jnp.argmax(log_mask[None, :] + g, axis=-1).astype(
                jnp.int32
            )

        return _chunked_keyed(tile_root, key, m)

    def tile(k, pt):
        g = jax.random.gumbel(k, (pt.shape[0], n))
        scores = (
            _pairwise_kernel_logits(pt, data_p, p_scale) + log_mask[None, :]
        )
        return jnp.argmax(scores + g, axis=-1).astype(jnp.int32)

    return _chunked_keyed(tile, key, m, parents)
