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
    # sample path runs a Pallas kernel with in-kernel PRNG seeding — not
    # safe under the level-grouping vmap (see inference/_sweep.py)
    sample_groupable = False

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        bandwidth="scott",
        parent_bandwidth=None,
        max_points: int = 1000,
        min_scale: float = 1e-3,
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        # ``bandwidth`` accepts a float (reference parity,
        # /root/reference/vbn/cpds/kde.py:24) or "scott": data-driven
        # Scott-rule bandwidths resolved host-side at fit time, like the
        # categorical support inference — a fixed 0.5 oversmooths any
        # problem whose conditionals are tighter than the kernel (the
        # round-2 gaussian-class artifact had kde KL 0.035-0.13 vs
        # <=0.003 for every other backend, VERDICT.md weak #5).
        self._bw_mode = (
            str(bandwidth) if isinstance(bandwidth, str) else None
        )
        self.bandwidth = (
            1.0 if self._bw_mode else float(bandwidth)
        )
        if parent_bandwidth is None:
            self.parent_bandwidth = self.bandwidth
            self._p_bw_follows = True
        else:
            self.parent_bandwidth = float(parent_bandwidth)
            self._p_bw_follows = False
        if self._bw_mode is not None and self._bw_mode != "scott":
            raise ValueError(
                f"Unknown bandwidth rule {bandwidth!r}; use a float or 'scott'."
            )
        self.max_points = int(max_points)
        self.min_scale = float(min_scale)

    def get_init_kwargs(self):
        return {
            "bandwidth": self._bw_mode or self.bandwidth,
            "parent_bandwidth": (
                None if self._p_bw_follows else self.parent_bandwidth
            ),
            "max_points": self.max_points,
            "min_scale": self.min_scale,
        }

    def get_extra_state(self):
        # resolved bandwidths survive save/load (the rule ran at fit time)
        return {
            "bandwidth": self.bandwidth,
            "parent_bandwidth": self.parent_bandwidth,
        }

    def set_extra_state(self, state) -> None:
        if not state:
            return
        self.bandwidth = float(state.get("bandwidth", self.bandwidth))
        self.parent_bandwidth = float(
            state.get("parent_bandwidth", self.parent_bandwidth)
        )

    def _resolve_bandwidths(self, parents, x) -> None:
        """Scott-rule resolution (host-side, fit-time spec refinement).

        bw = mean-dim sigma * n_eff^(-1/(d+4)) with d = the JOINT kernel
        dimension (parents + target): the estimator is Nadaraya-Watson in
        the product space, so the joint dimension sets the rate.
        """
        if self._bw_mode is None:
            return
        import numpy as np

        x_np = np.asarray(x, np.float32).reshape(x.shape[0], -1)
        n_eff = max(2, min(x_np.shape[0], self.max_points))
        d = self.input_dim + self.output_dim
        rate = float(n_eff) ** (-1.0 / (d + 4))
        sig_y = float(np.mean(np.std(x_np, axis=0))) or 1.0
        self.bandwidth = max(sig_y * rate, 1e-3)
        if parents is not None and self.input_dim:
            p_np = np.asarray(parents, np.float32).reshape(
                np.asarray(parents).shape[0], -1
            )
            sig_p = float(np.mean(np.std(p_np, axis=0))) or 1.0
            self.parent_bandwidth = max(sig_p * rate, 1e-3)
        else:
            self.parent_bandwidth = self.bandwidth

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
        self._resolve_bandwidths(parents, x)
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

    def update_program(self, conf):
        """Pure fixed-shape variant of ``update`` (fused update path).

        The eager form reads the valid count to host and concatenates
        variable-length slices; here the buffer keeps its static
        ``max_points`` shape and the uniform re-subsample among valid
        rows is a Gumbel top-k over the (buffer + batch) pool — the same
        distribution (uniform m-subset of the valid rows, all of them
        when they fit), with row order permuted (KDE is order-invariant).
        """

        def fn(params, key, parents, x):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 1:
                x = x[:, None]
            n_new = x.shape[0]
            if parents is None:
                parents = jnp.zeros((n_new, 0), jnp.float32)
            else:
                parents = jnp.asarray(parents, jnp.float32).reshape(n_new, -1)
            pool_p = jnp.concatenate([params["data_p"], parents], axis=0)
            pool_x = jnp.concatenate([params["data_x"], x], axis=0)
            pool_v = jnp.concatenate(
                [params["valid"], jnp.ones((n_new,), jnp.float32)]
            )
            g = jnp.where(
                pool_v > 0,
                jax.random.gumbel(key, pool_v.shape, dtype=jnp.float32),
                -1e30,  # invalid rows lose every top-k contest
            )
            _, idx = jax.lax.top_k(g, self.max_points)
            return {
                "data_p": jnp.take(pool_p, idx, axis=0),
                "data_x": jnp.take(pool_x, idx, axis=0),
                "valid": jnp.take(pool_v, idx),
            }

        return fn

    # -- kernels (MXU matmul form, chunked over M; ops/kde_kernel.py) --------
    def _y_scale(self) -> float:
        return max(float(self.bandwidth), 1e-3) + self.min_scale

    def _p_scale(self) -> float:
        return max(float(self.parent_bandwidth), 1e-3) + self.min_scale

    def _log_prob_flat(self, params, x, parents):
        from ..ops.kde_kernel import kde_log_prob

        # 1e-20, not 1e-38: TPUs flush subnormal f32 to zero, which would
        # turn this soft mask into a hard -inf (NaN risk downstream).
        log_mask = jnp.log(jnp.maximum(params["valid"], 1e-20))
        return kde_log_prob(
            x,
            parents if self.input_dim else None,
            params["data_x"],
            params["data_p"],
            log_mask,
            self._y_scale(),
            self._p_scale(),
        )

    def _sample_flat(self, params, key, parents, m):
        from ..ops.kde_kernel import kde_sample_indices
        from ..ops.kde_pallas import (
            _DIRECT_D,
            kde_sample_picked_fused,
            pallas_available,
        )

        k_pick, k_noise = jax.random.split(key)
        # 1e-20, not 1e-38: TPUs flush subnormal f32 to zero, which would
        # turn this soft mask into a hard -inf (NaN risk downstream).
        log_mask = jnp.log(jnp.maximum(params["valid"], 1e-20))
        bw = max(self.bandwidth, 1e-3)
        if pallas_available() and self.input_dim <= _DIRECT_D:
            # Fused pick: scores + Gumbel + argmax + one-hot GEMM in VMEM —
            # avoids the random HBM gather of picked support rows
            # (BENCH_NOTES.md: the gather dominates sampling at M ~ 500k).
            selected = kde_sample_picked_fused(
                k_pick,
                parents if self.input_dim else None,
                params["data_p"],
                params["data_x"],
                log_mask,
                self._p_scale(),
                m,
            )
        else:
            idx = kde_sample_indices(
                k_pick,
                parents if self.input_dim else None,
                params["data_p"],
                log_mask,
                self._p_scale(),
                m,
            )
            selected = params["data_x"][idx]
        noise = jax.random.normal(k_noise, selected.shape, selected.dtype)
        return selected + noise * (bw + self.min_scale)
