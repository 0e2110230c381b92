"""Damped weight-smoothing iterations ("LBP" in the reference's naming).

Capability parity with ``/root/reference/vbn/inference/lbp.py:11-68``: run
the base method (importance sampling or MC marginalization), then damped
weight-renormalization iterations until tolerance; non-convergence falls
back to a fresh importance-sampling run. (As in the reference, this is a
smoother over particle weights, not real message passing.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.registry import register_inference
from .importance_sampling import ImportanceSampling
from .monte_carlo_marginalization import MonteCarloMarginalization


@register_inference("lbp")
class LoopyBeliefPropagation:
    def __init__(
        self,
        n_samples: int = 200,
        n_iters: int = 10,
        damping: float = 0.5,
        fallback: str = "importance_sampling",
        **_kwargs,
    ) -> None:
        self.n_samples = int(n_samples)
        self.n_iters = int(n_iters)
        self.damping = float(damping)
        self.fallback = str(fallback)
        if not (0.0 <= self.damping <= 1.0):
            raise ValueError("damping must be in [0,1]")
        if self.fallback not in {
            "importance_sampling",
            "monte_carlo_marginalization",
        }:
            raise ValueError(
                "fallback must be 'importance_sampling' or "
                "'monte_carlo_marginalization'"
            )
        self._is = ImportanceSampling(n_samples=self.n_samples)
        self._mcm = MonteCarloMarginalization(n_samples=self.n_samples)

    def infer_posterior(self, vbn, query: Query, **kwargs):
        n_samples = int(kwargs.get("n_samples", self.n_samples))
        n_iters = int(kwargs.get("n_iters", self.n_iters))
        damping = float(kwargs.get("damping", self.damping))
        tol = float(kwargs.get("tol", 1e-4))
        eps = 1e-12

        if self.fallback == "monte_carlo_marginalization":
            pdf, target_samples = self._mcm.infer_posterior(
                vbn, query, n_samples=n_samples
            )
            weights = pdf / (jnp.sum(pdf, axis=-1, keepdims=True) + eps)
        else:
            weights, target_samples = self._is.infer_posterior(
                vbn, query, n_samples=n_samples
            )
        converged = False
        for _ in range(max(n_iters, 0)):
            w_new = jnp.maximum(weights, eps)
            w_new = w_new / (jnp.sum(w_new, axis=-1, keepdims=True) + eps)
            msg = damping * w_new + (1.0 - damping) * weights
            msg = msg / (jnp.sum(msg, axis=-1, keepdims=True) + eps)
            delta = float(np.max(np.abs(np.asarray(msg - weights))))
            weights = msg
            if delta < tol:
                converged = True
                break
        if not converged:
            return self._is.infer_posterior(vbn, query, n_samples=n_samples)
        return weights, target_samples
