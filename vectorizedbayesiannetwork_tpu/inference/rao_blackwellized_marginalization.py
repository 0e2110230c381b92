"""Rao-Blackwellized marginalization: sample ancestors, marginalize target
analytically.

Capability parity with
``/root/reference/vbn/inference/rao_blackwellized_marginalization.py:15-324``:
  * refuses (-> fallback) when the target has observed/intervened
    descendants, recording ``_last_fallback`` / ``_last_reason``;
  * samples all non-target, non-descendant nodes as evidence-weighted
    particles (skipping the target subtree);
  * categorical target: weighted mixture of conditional pmfs over the class
    support; Gaussian target: moment-matched mixture evaluated on an
    adaptive ``mean ± stddevs·std`` grid;
  * other target families route to the fallback.

The particle sweep + analytic marginalization is one compiled program; the
weighted mixture reductions over the particle axis are psum points when
particles are sharded (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ..ops.gauss import LOG_2PI
from ._base import CompiledMethod
from ._sweep import sweep_trace, target_parents_flat
from .gaussian_exact import is_gaussian_family, make_fallback


def _normalized_weights(log_w: jax.Array, eps: float = 1e-12) -> jax.Array:
    log_w = jnp.nan_to_num(log_w, nan=-1e30, posinf=1e30, neginf=-1e30)
    log_w = log_w - jnp.max(log_w, axis=1, keepdims=True)
    w = jnp.exp(log_w)
    denom = jnp.sum(w, axis=1, keepdims=True)
    uniform = jnp.full_like(w, 1.0 / max(1, w.shape[1]))
    return jnp.where(denom > eps, w / jnp.maximum(denom, eps), uniform)


@register_inference("rao_blackwellized_marginalization")
class RaoBlackwellizedMarginalization(CompiledMethod):
    def __init__(
        self,
        n_samples: int = 200,
        n_particles: Optional[int] = None,
        stddevs: float = 4.0,
        min_scale: float = 1e-6,
        fallback: str = "likelihood_weighting",
        **kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.n_particles = (
            int(n_particles) if n_particles is not None else self.n_samples
        )
        self.stddevs = float(stddevs)
        self.min_scale = float(min_scale)
        fb_kwargs = dict(kwargs)
        fb_kwargs.setdefault("n_samples", self.n_samples)
        self._fallback = make_fallback(
            fallback, "rao_blackwellized_marginalization", fb_kwargs
        )
        self._last_fallback = False
        self._last_reason: Optional[str] = None

    def _fallback_infer(self, vbn, query, *, reason: str, **kwargs):
        self._last_fallback = True
        self._last_reason = reason
        if self._fallback is None:
            raise RuntimeError(
                "rao_blackwellized_marginalization cannot handle this query "
                "and has no fallback"
            )
        return self._fallback.infer_posterior(vbn, query, **kwargs)

    def infer_posterior(self, vbn, query: Query, **kwargs):
        self._last_fallback = False
        self._last_reason = None
        s_out = max(1, int(kwargs.get("n_samples", self.n_samples)))
        s_part = max(1, int(kwargs.get("n_particles", self.n_particles)))
        plan, b = self._plan_and_batch(vbn, query)
        t = plan.target_idx
        target_node = plan.topo_order[t]
        node_to_idx = plan.node_to_idx()
        descendants = {
            node_to_idx[n] for n in vbn.dag.descendants(target_node)
        }
        if any(plan.is_fixed(i) for i in descendants):
            return self._fallback_infer(
                vbn, query,
                reason="target has observed/intervened descendants", **kwargs,
            )
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        t_off = plan.node_offsets[t]
        if plan.is_fixed(t):
            value = fixed[:, None, t_off : t_off + plan.node_dims[t]]
            return jnp.ones((b, 1), jnp.float32), value

        cpds = self._cpds(vbn, plan)
        target_cpd = cpds[t]
        skip = frozenset(descendants | {t})
        is_cat = hasattr(target_cpd, "categorical_probs")
        is_gauss = is_gaussian_family(target_cpd) and plan.node_dims[t] == 1
        if not (is_cat or is_gauss):
            return self._fallback_infer(
                vbn, query,
                reason="unsupported target CPD for RB marginalization",
                **kwargs,
            )

        if is_cat:
            def build():
                def fn(params_tuple, key, fixed_vals):
                    packed, log_w = sweep_trace(
                        plan, cpds, params_tuple, key, fixed_vals, s_part,
                        weighted=True, skip=skip,
                    )
                    bb = fixed_vals.shape[0]
                    weights = _normalized_weights(log_w)
                    pflat = target_parents_flat(plan, packed, t)
                    probs_cond = target_cpd.categorical_probs(
                        params_tuple[t], pflat
                    )  # [B*S_part, C] (scalar target; [1, C] for roots)
                    c = probs_cond.shape[-1]
                    probs_cond = jnp.broadcast_to(
                        probs_cond.reshape(-1, c)[None]
                        if probs_cond.shape[0] == 1
                        else probs_cond.reshape(bb, s_part, c),
                        (bb, s_part, c),
                    )
                    marginal = jnp.sum(weights[..., None] * probs_cond, axis=1)
                    if hasattr(target_cpd, "support_values"):
                        support = target_cpd.support_values(params_tuple[t])[0]
                    else:
                        support = jnp.arange(c, dtype=jnp.float32)
                    samples = jnp.broadcast_to(
                        support[None, :, None], (bb, c, 1)
                    )
                    return marginal, samples

                return fn

            fn = self._compiled(vbn, plan, ("rb_cat", s_part), build)
            return fn(self._params_tuple(vbn, plan), vbn.next_key_spec(), fixed)

        def build():
            def fn(params_tuple, key, fixed_vals):
                packed, log_w = sweep_trace(
                    plan, cpds, params_tuple, key, fixed_vals, s_part,
                    weighted=True, skip=skip,
                )
                bb = fixed_vals.shape[0]
                weights = _normalized_weights(log_w)  # [B, S_part]
                pflat = target_parents_flat(plan, packed, t)
                loc, scale = target_cpd.conditional_params(
                    params_tuple[t], pflat
                )
                loc = jnp.broadcast_to(loc.reshape(-1)[None]
                                       if loc.size == 1
                                       else loc.reshape(bb, s_part),
                                       (bb, s_part))
                scale = jnp.broadcast_to(scale.reshape(-1)[None]
                                         if scale.size == 1
                                         else scale.reshape(bb, s_part),
                                         (bb, s_part))
                scale = jnp.maximum(
                    jnp.abs(
                        jnp.nan_to_num(
                            scale,
                            nan=self.min_scale,
                            posinf=self.min_scale,
                            neginf=self.min_scale,
                        )
                    ),
                    self.min_scale,
                )
                mix_mean = jnp.sum(weights * loc, axis=1)
                second = jnp.sum(weights * (scale**2 + loc**2), axis=1)
                mix_var = jnp.maximum(
                    second - mix_mean**2, self.min_scale**2
                )
                mix_std = jnp.sqrt(mix_var)
                z = jnp.linspace(0.0, 1.0, s_out)[None, :]
                lo = (mix_mean - self.stddevs * mix_std)[:, None]
                hi = (mix_mean + self.stddevs * mix_std)[:, None]
                grid = lo + (hi - lo) * z  # [B, S_out]
                zn = (grid[:, None, :] - loc[..., None]) / scale[..., None]
                log_comp = -0.5 * (zn**2 + LOG_2PI) - jnp.log(scale[..., None])
                pdf = jnp.sum(
                    weights[..., None] * jnp.exp(log_comp), axis=1
                )  # [B, S_out]
                return pdf, grid[..., None]

            return fn

        fn = self._compiled(vbn, plan, ("rb_gauss", s_part, s_out), build)
        return fn(self._params_tuple(vbn, plan), vbn.next_key_spec(), fixed)
