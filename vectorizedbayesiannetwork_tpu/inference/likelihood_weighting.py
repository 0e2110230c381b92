"""Likelihood weighting: prior-proposal sweep with evidence log-weights.

Capability parity with
``/root/reference/vbn/inference/likelihood_weighting.py:11-82``: evidence
nodes are clamped (with NaN/inf sanitization) and contribute
``log p(value | parents)`` to the particle weights; option
``normalize=False`` returns max-shifted unnormalized weights. One fused XLA
program; the softmax over the particle axis is the reduction that becomes a
``psum`` when particles are sharded across a mesh (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ._base import CompiledMethod, Program
from ._sweep import node_values, sweep_trace


@register_inference("likelihood_weighting")
class LikelihoodWeighting(CompiledMethod):
    def __init__(
        self,
        n_samples: int = 200,
        eps: float = 1e-12,
        normalize: bool = True,
        **_kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.eps = float(eps)
        self.normalize = bool(normalize)
        self._last_ess = None

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        normalize = bool(kwargs.get("normalize", self.normalize))
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx

        def fn(params_tuple, key, fixed_vals):
            packed, log_w = sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, s, weighted=True
            )
            if normalize:
                weights = jnp.exp(
                    log_w - jnp.max(log_w, axis=1, keepdims=True)
                )
                weights = weights / jnp.maximum(
                    jnp.sum(weights, axis=1, keepdims=True), self.eps
                )
            else:
                weights = jnp.exp(
                    log_w - jnp.max(log_w, axis=1, keepdims=True)
                )
            ess = 1.0 / jnp.maximum(
                jnp.sum(
                    (weights / jnp.maximum(
                        jnp.sum(weights, axis=1, keepdims=True), self.eps
                    ))
                    ** 2,
                    axis=1,
                ),
                self.eps,
            )
            return weights, node_values(plan, packed, t), ess

        def post(outs):
            weights, samples, ess = outs
            self._last_ess = ess
            return weights, samples

        return Program(
            plan,
            ("lw", s, normalize),
            fn,
            self._params_tuple(vbn, plan),
            fixed,
            post,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
