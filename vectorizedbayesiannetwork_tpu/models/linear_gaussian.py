"""Linear-Gaussian CPD: ``Y | X ~ N(X W + b, diag(var))``.

Capability parity with ``/root/reference/vbn/cpds/linear_gaussian.py:13-217``
(closed-form ridge fit via augmented least squares, root fast path, update =
refit, ``min_scale`` floor at evaluation time), rebuilt as pure JAX: the fit
is one jitted dense solve; sample/log_prob are a fused GEMM + elementwise
Gaussian kernel that XLA maps straight onto the MXU/VPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ..ops.gauss import diag_gaussian_log_prob


@partial(jax.jit, static_argnums=(3,))
def _ridge_solve(parents: jax.Array, x: jax.Array, ridge: jax.Array, input_dim: int):
    """Augmented ridge least squares: returns (weight [Din,Dout], bias, var)."""
    n = parents.shape[0]
    dout = x.shape[1]
    ones = jnp.ones((n, 1), dtype=x.dtype)
    x_aug = jnp.concatenate([parents, ones], axis=1)
    # Ridge via row augmentation: [X, 1; sqrt(r) I, 0] theta = [y; 0]
    sqrt_r = jnp.sqrt(ridge)
    reg_block = jnp.concatenate(
        [sqrt_r * jnp.eye(input_dim, dtype=x.dtype),
         jnp.zeros((input_dim, 1), dtype=x.dtype)],
        axis=1,
    )
    a = jnp.concatenate([x_aug, reg_block], axis=0)
    b = jnp.concatenate([x, jnp.zeros((input_dim, dout), dtype=x.dtype)], axis=0)
    theta, *_ = jnp.linalg.lstsq(a, b)
    weight = theta[:-1]
    bias = theta[-1]
    residual = x - x_aug @ theta
    var = jnp.maximum(jnp.var(residual, axis=0), 1e-6)
    return weight, bias, var


@register_cpd("linear_gaussian")
class LinearGaussianCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        ridge: float = 1e-6,
        min_scale: float = 1e-3,
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.ridge = float(ridge)
        self.min_scale = float(min_scale)

    def get_init_kwargs(self):
        return {"ridge": self.ridge, "min_scale": self.min_scale}

    def _static_fields(self) -> tuple:
        return (self.ridge, self.min_scale)

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        return {
            "weight": jnp.zeros((self.input_dim, self.output_dim), jnp.float32),
            "bias": jnp.zeros((self.output_dim,), jnp.float32),
            "var": jnp.ones((self.output_dim,), jnp.float32),
        }

    def fit(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        *,
        ridge: Optional[float] = None,
        **_training_kwargs,  # epochs/lr/batch_size accepted & unused (closed form)
    ) -> Params:
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
        r = self.ridge if ridge is None else float(ridge)
        if r < 0:
            raise ValueError("ridge must be >= 0")
        if self.input_dim == 0:
            mean = jnp.mean(x, axis=0)
            var = jnp.maximum(jnp.var(x, axis=0), 1e-12)
            return {
                "weight": jnp.zeros((0, self.output_dim), jnp.float32),
                "bias": mean,
                "var": var,
            }
        parents = jnp.asarray(parents, jnp.float32)
        if parents.ndim == 3:
            parents = parents.reshape(-1, parents.shape[-1])
        if parents.shape[0] != x.shape[0]:
            raise ValueError(
                f"parents rows {parents.shape[0]} != x rows {x.shape[0]}"
            )
        weight, bias, var = _ridge_solve(
            parents, x, jnp.float32(r), self.input_dim
        )
        return {"weight": weight, "bias": bias, "var": var}

    # update = refit on the provided data (parity linear_gaussian.py:149-161)

    def update_program(self, conf):
        """Refit is pure jnp -> directly traceable (fused update path)."""
        conf = dict(conf)

        def fn(params, key, parents, x):
            return self.fit(params, key, parents, x, **conf)

        return fn

    # -- pure kernels --------------------------------------------------------
    def _scale(self, params: Params) -> jax.Array:
        return jnp.sqrt(jnp.maximum(params["var"], self.min_scale**2))

    def _loc(self, params: Params, parents: Optional[jax.Array], m: int):
        if self.input_dim == 0:
            return jnp.broadcast_to(params["bias"], (m, self.output_dim))
        return parents @ params["weight"] + params["bias"]

    def _sample_flat(self, params, key, parents, m):
        loc = self._loc(params, parents, m)
        scale = self._scale(params)
        eps = jax.random.normal(key, (m, self.output_dim), dtype=loc.dtype)
        return loc + eps * scale

    # -- precomputed-noise sampling (MCMC inner loops) -----------------------
    # The reparameterized draw loc + eps*scale separates the (parent-
    # dependent) transform from the (parent-independent) noise, so chain
    # samplers can generate ALL steps' noise in one vectorized RNG call
    # outside their lax.scan instead of hashing tiny counters per step —
    # at gibbs-step sizes (tens of floats) the in-loop threefry chains
    # dominate the step cost (see sampling/gibbs.py).
    def _noise_spec(self, params, m):
        return ((m, self.output_dim), "normal")

    def _sample_flat_noise(self, params, noise, parents, m):
        loc = self._loc(params, parents, m)
        return loc + noise.astype(loc.dtype) * self._scale(params)

    def _log_prob_flat(self, params, x, parents):
        loc = self._loc(params, parents, x.shape[0])
        scale = jnp.broadcast_to(self._scale(params), loc.shape)
        return diag_gaussian_log_prob(x, loc, scale)

    # -- exact-path introspection (for gaussian_exact / RB marginalization) --
    def conditional_params(self, params: Params, parents: Optional[jax.Array]):
        """(loc, scale) of the conditional Gaussian given flat parents [M,Din]."""
        m = 1 if parents is None else parents.shape[0]
        loc = self._loc(params, parents, m)
        scale = jnp.broadcast_to(self._scale(params), loc.shape)
        return loc, scale
