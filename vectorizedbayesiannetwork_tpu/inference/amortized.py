"""Amortized posterior inference: one feed-forward pass per query batch.

Serving-path counterpart of ``learning/amortized.py`` (which the reference
only stubs, ``/root/reference/vbn/learning/amortized.py:6-14``): when the
model was fitted with the ``amortized`` learning method, a posterior query
``p(target | evidence)`` is answered by a single batched MLP forward — no
ancestral sweep, no particles, just one GEMM chain on the MXU. Follows the
framework's fallback-chain convention (``gaussian_exact.py``): queries the
amortizer cannot serve (no trained net, do-interventions, observed target)
are delegated to a configurable Monte-Carlo method.

Output contract: continuous targets return ``(pdf [B,S], samples [B,S,D])``
sampled from the predicted Gaussian; categorical targets return the exact
predicted pmf ``(probs [B,K], support [B,K,1])`` like ``categorical_exact``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ..learning.amortized import amortized_forward, node_distribution
from ..ops.gauss import LOG_2PI
from ._base import CompiledMethod, Program
from .gaussian_exact import make_fallback


@register_inference("amortized")
class AmortizedInference(CompiledMethod):
    def __init__(
        self,
        n_samples: int = 200,
        fallback: str = "likelihood_weighting",
        **kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        fb_kwargs = dict(kwargs)
        fb_kwargs.setdefault("n_samples", self.n_samples)
        self._fallback = make_fallback(fallback, "amortized", fb_kwargs)
        self._last_fallback = False
        self._last_reason = None

    def _fall_back(self, vbn, query: Query, s: int, reason: str):
        self._last_fallback = True
        self._last_reason = reason
        if self._fallback is None:
            raise RuntimeError(f"amortized inference unavailable: {reason}")
        return self._fallback.make_program(vbn, query, n_samples=s)

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        plan, b = self._plan_and_batch(vbn, query)
        am = getattr(vbn, "amortized", None)
        if am is None:
            return self._fall_back(
                vbn, query, s,
                "model has no amortized net (fit with the 'amortized' "
                "learning method)",
            )
        spec0 = am["spec"]
        if query.do and not spec0.interventional:
            return self._fall_back(
                vbn, query, s,
                "do-interventions change the joint and this amortizer "
                "was trained observationally (fit with "
                "interventional=True to amortize do-queries)",
            )
        t = plan.target_idx
        if plan.evidence_mask[t] or plan.do_mask[t]:
            return self._fall_back(vbn, query, s, "target is fixed")
        self._last_fallback = False
        self._last_reason = None

        spec, net = am["spec"], am["net"]
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        # Visible-value mask covers evidence AND do'd nodes; the do-mask
        # channel tells the (interventionally trained) net which visible
        # values must not propagate inference upstream.
        mask_row = jnp.asarray(
            [1.0 if plan.is_fixed(i) else 0.0 for i in range(plan.n_nodes)],
            jnp.float32,
        )
        do_row = jnp.asarray(
            [1.0 if plan.do_mask[i] else 0.0 for i in range(plan.n_nodes)],
            jnp.float32,
        )
        d = plan.node_dims[t]
        categorical = spec.kinds[t] == "categorical"

        def fn(net_params, key, fixed_vals):
            bb = fixed_vals.shape[0]
            mask = jnp.broadcast_to(mask_row[None], (bb, plan.n_nodes))
            do_mask = jnp.broadcast_to(do_row[None], (bb, plan.n_nodes))
            heads = amortized_forward(
                spec, net_params, fixed_vals, mask, do_mask
            )
            if categorical:
                probs, values = node_distribution(spec, net_params, heads, t)
                k = spec.n_classes[t]
                samples = jnp.broadcast_to(values[None, :, None], (bb, k, 1))
                return probs, samples
            loc, scale = node_distribution(spec, net_params, heads, t)
            eps = jax.random.normal(key, (bb, s, d), jnp.float32)
            x = loc[:, None, :] + eps * scale[:, None, :]
            z = (x - loc[:, None, :]) / scale[:, None, :]
            lp = -0.5 * jnp.sum(
                z * z + 2.0 * jnp.log(scale)[:, None, :] + LOG_2PI, axis=-1
            )
            return jnp.exp(lp), x

        return Program(
            plan,
            ("amortized", s, spec.signature()),
            fn,
            net,
            fixed,
            lambda outs: outs,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        prog = self.make_program(vbn, query, **kwargs)
        if prog is None:
            # fallback method itself has no expressible program (e.g. exact
            # methods with host-side chains) -> direct dispatch
            s = int(kwargs.get("n_samples", self.n_samples))
            return self._fallback.infer_posterior(vbn, query, n_samples=s)
        return self._run_program(vbn, prog)
