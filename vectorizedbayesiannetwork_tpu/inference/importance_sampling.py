"""Importance sampling with prior proposal and ESS-guarded fallback.

Capability parity with
``/root/reference/vbn/inference/importance_sampling.py:14-93``: topological
prior-proposal sweep, evidence nodes accumulate log-weights, softmax
normalization, and an ESS guard (ESS < 0.1·S on any batch row) that falls
back to full LikelihoodWeighting. The sweep + softmax + ESS is one fused XLA
program; only the scalar fallback decision syncs to host (one bool), matching
the reference's semantics without per-row Python sampling loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ._base import CompiledMethod, Program
from ._sweep import node_values, sweep_trace
from .likelihood_weighting import LikelihoodWeighting


@register_inference("importance_sampling")
class ImportanceSampling(CompiledMethod):
    def __init__(self, n_samples: int = 200, **_kwargs) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.ess_threshold = 0.1
        self._lw = LikelihoodWeighting(n_samples=self.n_samples)
        self._last_fallback = False
        self._last_ess: Optional[jax.Array] = None

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx

        def fn(params_tuple, key, fixed_vals):
            packed, log_w = sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, s, weighted=True
            )
            weights = jax.nn.softmax(log_w, axis=1)
            ess = 1.0 / jnp.sum(weights**2, axis=1)
            return weights, node_values(plan, packed, t), ess

        def post(outs):
            weights, samples, ess = outs
            self._last_ess = ess
            threshold = max(1.0, self.ess_threshold * float(s))
            if bool(np.any(np.asarray(ess) < threshold)):
                # ESS collapse: rerun as full likelihood weighting (one extra
                # dispatch for this query only), parity with the reference's
                # fallback (importance_sampling.py:82-89).
                self._last_fallback = True
                return self._lw.infer_posterior(vbn, query, n_samples=s)
            self._last_fallback = False
            return weights, samples

        return Program(
            plan, ("is", s), fn, self._params_tuple(vbn, plan), fixed, post
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
