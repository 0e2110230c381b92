"""Random-Fourier-Features Gaussian CPD (GP regression approximation).

Capability parity with ``/root/reference/vbn/cpds/rff_gaussian.py:13-291``:
features ``sqrt(2/F) cos(x W^T + b)`` with seeded frozen RFF weights,
closed-form ridge solve ``(Phi^T Phi + r I)^{-1} Phi^T y`` in standardized
space, residual variance floor, update = refit. Fit is one GEMM + one dense
solve; evaluation is a fused GEMM + cos + GEMM chain on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ..ops.gauss import diag_gaussian_log_prob


@register_cpd("rff_gaussian")
class RFFGaussianCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        n_features: int = 256,
        lengthscale: float = 1.0,
        ridge: float = 1e-6,
        min_scale: float = 1e-3,
        use_bias: bool = True,
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        if int(n_features) <= 0:
            raise ValueError("n_features must be >= 1")
        if float(lengthscale) <= 0:
            raise ValueError("lengthscale must be > 0")
        self.n_features = int(n_features)
        self.lengthscale = float(lengthscale)
        self.ridge = float(ridge)
        self.min_scale = float(min_scale)
        self.use_bias = bool(use_bias)

    def get_init_kwargs(self):
        return {
            "n_features": self.n_features,
            "lengthscale": self.lengthscale,
            "ridge": self.ridge,
            "min_scale": self.min_scale,
            "use_bias": self.use_bias,
        }

    def _static_fields(self) -> tuple:
        return (
            self.n_features,
            self.lengthscale,
            self.ridge,
            self.min_scale,
            self.use_bias,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        kw, kb = jax.random.split(key)
        if self.input_dim == 0:
            rff_w = jnp.zeros((self.n_features, 0), jnp.float32)
            rff_b = jnp.zeros((self.n_features,), jnp.float32)
        else:
            ls = max(self.lengthscale, 1e-6)
            rff_w = (
                jax.random.normal(
                    kw, (self.n_features, self.input_dim), jnp.float32
                )
                / ls
            )
            rff_b = 2.0 * math.pi * jax.random.uniform(
                kb, (self.n_features,), jnp.float32
            )
        return {
            "rff_w": rff_w,
            "rff_b": rff_b,
            "coef": jnp.zeros((self.n_features, self.output_dim), jnp.float32),
            "bias": jnp.zeros((self.output_dim,), jnp.float32),
            "var": jnp.ones((self.output_dim,), jnp.float32),
            "stats": {
                "mean_x": jnp.zeros((self.input_dim,), jnp.float32),
                "std_x": jnp.ones((self.input_dim,), jnp.float32),
                "mean_y": jnp.zeros((self.output_dim,), jnp.float32),
                "std_y": jnp.ones((self.output_dim,), jnp.float32),
            },
        }

    def _features(self, params: Params, parents_norm: jax.Array) -> jax.Array:
        proj = parents_norm @ params["rff_w"].T + params["rff_b"]
        return math.sqrt(2.0 / float(self.n_features)) * jnp.cos(proj)

    def fit(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        *,
        ridge: Optional[float] = None,
        **_training_kwargs,
    ) -> Params:
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
        r = self.ridge if ridge is None else float(ridge)
        if r < 0:
            raise ValueError("ridge must be >= 0")
        mean_y = jnp.mean(x, axis=0)
        std_y = jnp.maximum(jnp.std(x, axis=0), 1e-6)
        if self.input_dim == 0:
            stats = {
                "mean_x": jnp.zeros((0,), jnp.float32),
                "std_x": jnp.ones((0,), jnp.float32),
                "mean_y": mean_y,
                "std_y": std_y,
            }
            return {
                **params,
                "coef": jnp.zeros_like(params["coef"]),
                "bias": jnp.zeros_like(params["bias"]),
                "var": jnp.maximum(std_y**2, 1e-6),
                "stats": stats,
            }
        parents = jnp.asarray(parents, jnp.float32)
        if parents.ndim == 3:
            parents = parents.reshape(-1, parents.shape[-1])
        mean_x = jnp.mean(parents, axis=0)
        std_x = jnp.maximum(jnp.std(parents, axis=0), 1e-6)
        stats = {
            "mean_x": mean_x, "std_x": std_x, "mean_y": mean_y, "std_y": std_y
        }
        pn = (parents - mean_x) / std_x
        xn = (x - mean_y) / std_y
        phi = self._features(params, pn)
        if self.use_bias:
            phi_aug = jnp.concatenate(
                [phi, jnp.ones((phi.shape[0], 1), phi.dtype)], axis=1
            )
        else:
            phi_aug = phi
        gram = phi_aug.T @ phi_aug + r * jnp.eye(
            phi_aug.shape[1], dtype=phi.dtype
        )
        theta = jnp.linalg.solve(gram, phi_aug.T @ xn)
        if self.use_bias:
            coef, bias = theta[:-1], theta[-1]
        else:
            coef = theta
            bias = jnp.zeros((self.output_dim,), jnp.float32)
        residual = xn - (phi @ coef + bias)
        var_norm = jnp.maximum(jnp.var(residual, axis=0), 1e-6)
        return {
            **params,
            "coef": coef,
            "bias": bias,
            "var": var_norm * std_y**2,  # variance in original units
            "stats": stats,
        }

    # update = refit (parity rff_gaussian.py:244-255)

    def update_program(self, conf):
        """Refit is pure jnp -> directly traceable (fused update path)."""
        conf = dict(conf)

        def fn(params, key, parents, x):
            return self.fit(params, key, parents, x, **conf)

        return fn

    # -- pure kernels --------------------------------------------------------
    def _scale(self, params: Params) -> jax.Array:
        return jnp.sqrt(jnp.maximum(params["var"], self.min_scale**2))

    def conditional_params(self, params: Params, parents: Optional[jax.Array]):
        stats = params["stats"]
        if self.input_dim == 0:
            m = 1 if parents is None else parents.shape[0]
            loc = jnp.broadcast_to(stats["mean_y"], (m, self.output_dim))
        else:
            pn = (parents - stats["mean_x"]) / stats["std_x"]
            phi = self._features(params, pn)
            loc_n = phi @ params["coef"] + params["bias"]
            loc = loc_n * stats["std_y"] + stats["mean_y"]
        scale = jnp.broadcast_to(self._scale(params), loc.shape)
        return loc, scale

    def _sample_flat(self, params, key, parents, m):
        loc, scale = self.conditional_params(params, parents)
        loc = jnp.broadcast_to(loc, (m, self.output_dim))
        scale = jnp.broadcast_to(scale, (m, self.output_dim))
        eps = jax.random.normal(key, (m, self.output_dim), dtype=loc.dtype)
        return loc + eps * scale

    def _log_prob_flat(self, params, x, parents):
        loc, scale = self.conditional_params(params, parents)
        loc = jnp.broadcast_to(loc, x.shape)
        scale = jnp.broadcast_to(scale, x.shape)
        return diag_gaussian_log_prob(x, loc, scale)
