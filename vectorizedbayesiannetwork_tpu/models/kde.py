"""Conditional Gaussian-KDE CPD.

Capability parity with ``/root/reference/vbn/cpds/kde.py:13-182``: stores up
to ``max_points`` (parents, targets) pairs (random subsample), log_prob is a
parent-kernel-weighted logsumexp over stored points, sample picks a support
point by parent-softmax weighting then adds bandwidth noise, update =
concat + re-subsample.

TPU-first: the dataset lives in params as FIXED ``max_points``-shaped
arrays with a validity mask, so every jitted program has static shapes
across fits/updates; the reference's chunked evaluation loop
(kde.py:131-147) is unnecessary — the pairwise kernel is one O(M·N·D)
batched computation XLA tiles, with a Pallas blocked kernel as the
bandwidth-optimal path for large supports (ops/kde_pallas.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd


@register_cpd("kde")
class KDECPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        bandwidth: float = 1.0,
        parent_bandwidth: Optional[float] = None,
        max_points: int = 1000,
        min_scale: float = 1e-3,
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.bandwidth = float(bandwidth)
        self.parent_bandwidth = (
            float(parent_bandwidth)
            if parent_bandwidth is not None
            else float(bandwidth)
        )
        self.max_points = int(max_points)
        self.min_scale = float(min_scale)

    def get_init_kwargs(self):
        return {
            "bandwidth": self.bandwidth,
            "parent_bandwidth": self.parent_bandwidth,
            "max_points": self.max_points,
            "min_scale": self.min_scale,
        }

    def _static_fields(self) -> tuple:
        return (
            self.bandwidth,
            self.parent_bandwidth,
            self.max_points,
            self.min_scale,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        m = self.max_points
        return {
            "data_p": jnp.zeros((m, self.input_dim), jnp.float32),
            "data_x": jnp.zeros((m, self.output_dim), jnp.float32),
            "valid": jnp.zeros((m,), jnp.float32),
        }

    def _pack(self, key, parents, x):
        """Subsample to max_points into fixed-shape arrays + mask."""
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        n = x.shape[0]
        if parents is None:
            parents = jnp.zeros((n, 0), jnp.float32)
        else:
            parents = jnp.asarray(parents, jnp.float32)
            if parents.ndim == 3:
                parents = parents.reshape(-1, parents.shape[-1])
        if parents.shape[0] != n:
            raise ValueError("parents and x must have the same number of rows")
        m = self.max_points
        if n > m:
            idx = jax.random.permutation(key, n)[:m]
            parents, x = parents[idx], x[idx]
            n = m
        pad = m - n
        data_p = jnp.concatenate(
            [parents, jnp.zeros((pad, self.input_dim), jnp.float32)], axis=0
        )
        data_x = jnp.concatenate(
            [x, jnp.zeros((pad, self.output_dim), jnp.float32)], axis=0
        )
        valid = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
        )
        return {"data_p": data_p, "data_x": data_x, "valid": valid}

    def fit(self, params, key, parents, x, **_training_kwargs) -> Params:
        return self._pack(key, parents, x)

    def update(self, params, key, parents, x, **_training_kwargs) -> Params:
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        n_new = x.shape[0]
        if parents is None:
            parents = jnp.zeros((n_new, 0), jnp.float32)
        else:
            parents = jnp.asarray(parents, jnp.float32)
        n_old = int(jnp.sum(params["valid"]))
        old_p = params["data_p"][:n_old]
        old_x = params["data_x"][:n_old]
        return self._pack(
            key,
            jnp.concatenate([old_p, parents], axis=0),
            jnp.concatenate([old_x, x], axis=0),
        )

    # -- kernels -------------------------------------------------------------
    def _kernel_log_prob(self, diff: jax.Array, bandwidth: float) -> jax.Array:
        scale = max(float(bandwidth), 1e-3) + self.min_scale
        return -0.5 * (
            (diff / scale) ** 2 + math.log(2 * math.pi) + 2 * math.log(scale)
        )

    def _parent_log_kernel(self, params, parents: jax.Array) -> jax.Array:
        """[M, N] parent-space kernel log weights (masked)."""
        diff = parents[:, None, :] - params["data_p"][None, :, :]
        log_kp = jnp.sum(
            self._kernel_log_prob(diff, self.parent_bandwidth), axis=-1
        )
        return log_kp + jnp.log(jnp.maximum(params["valid"], 1e-38))[None, :]

    def _log_prob_flat(self, params, x, parents):
        log_mask = jnp.log(jnp.maximum(params["valid"], 1e-38))[None, :]
        diff_y = x[:, None, :] - params["data_x"][None, :, :]
        log_ky = jnp.sum(self._kernel_log_prob(diff_y, self.bandwidth), axis=-1)
        if self.input_dim == 0:
            n_eff = jnp.maximum(jnp.sum(params["valid"]), 1.0)
            return jax.scipy.special.logsumexp(
                log_ky + log_mask, axis=1
            ) - jnp.log(n_eff)
        log_kp = self._parent_log_kernel(params, parents)
        return jax.scipy.special.logsumexp(
            log_kp + log_ky, axis=1
        ) - jax.scipy.special.logsumexp(log_kp, axis=1)

    def _sample_flat(self, params, key, parents, m):
        k_pick, k_noise = jax.random.split(key)
        log_mask = jnp.log(jnp.maximum(params["valid"], 1e-38))
        if self.input_dim == 0:
            scores = jnp.broadcast_to(log_mask[None, :], (m, self.max_points))
        else:
            scores = self._parent_log_kernel(params, parents)
        g = jax.random.gumbel(k_pick, scores.shape, dtype=scores.dtype)
        idx = jnp.argmax(scores + g, axis=-1)  # [M]
        selected = params["data_x"][idx]
        bw = max(self.bandwidth, 1e-3)
        noise = jax.random.normal(k_noise, selected.shape, selected.dtype)
        return selected + noise * (bw + self.min_scale)
