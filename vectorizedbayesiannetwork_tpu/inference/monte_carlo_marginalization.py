"""Monte-Carlo marginalization posterior inference.

Capability parity with
``/root/reference/vbn/inference/monte_carlo_marginalization.py:12-92``:
intervened-target delta fast path, all-parents-observed direct-CPD fast path,
otherwise a full ancestral sweep; pdf = exp(target log-density). Here each
path is a single cached XLA program (see ``_sweep.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ._base import Program
from ._dynamic_base import DynamicMaskMethod
from ._dynamic_sweep import dynamic_sweep_trace, dynamic_target_values
from ._sweep import node_values, sweep_trace, target_log_prob


@register_inference("monte_carlo_marginalization")
class MonteCarloMarginalization(DynamicMaskMethod):
    dynamic_tag = "mcm_dyn"
    pack_clamp_obs = False
    _static_red_src = "lpt"  # fused in-kernel pmf/moments reductions

    def __init__(
        self, n_samples: int = 200, dynamic_masks: bool = False, **_kwargs
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        # dynamic_masks: ONE compiled program per network — evidence/do
        # masks and the target become runtime inputs (_dynamic_sweep.py).
        # Turn on for workloads with many distinct query skeletons, where
        # per-skeleton compiles dominate. The do(target) delta fast path
        # is preserved per row (pdf 1 at the intervened value); the
        # parents-observed direct path runs as the general sweep (same
        # distribution, clamped ancestors make it exact).
        self.dynamic_masks = bool(dynamic_masks)

    def _dynamic_fn(self, plan, cpds, s, opts, vbn=None):
        raw = self._fused_dyn_raw(plan, cpds, s, vbn, ("lpt", "tgt"))

        def fn(params_tuple, key, packed_in):
            fixed_vals, evm, dom, ti = packed_in
            # MCM semantics: evidence AND do both clamp; nothing weights.
            fx = jnp.maximum(evm, dom)
            no_weight = jnp.zeros_like(evm)
            tgt = jax.nn.one_hot(ti, plan.n_nodes, dtype=jnp.float32)
            do_t = jnp.sum(tgt * dom, axis=1)  # [B]
            if raw is not None and raw.fits(fixed_vals.shape[0]):
                # everything clamps via the kernel's do bit (no weights);
                # lp_t is the target's log-density at its final value
                _, tv, lp_t, _ = raw(
                    params_tuple, key, fixed_vals, no_weight, fx, ti
                )
                pdf = jnp.where(do_t[:, None] > 0, 1.0, jnp.exp(lp_t))
                return pdf, tv[:, :, None]
            packed, _, lp_t = dynamic_sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals,
                no_weight, fx, s, tgt_mask=tgt,
            )
            # do(target) rows: degenerate delta at the intervened value
            # (the sweep already clamped the samples; pdf := 1).
            pdf = jnp.where(do_t[:, None] > 0, 1.0, jnp.exp(lp_t))
            return pdf, dynamic_target_values(plan, packed, ti)

        return fn

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        if self._dynamic_enabled(kwargs):
            return self._make_dynamic_program(vbn, query, s, ())
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b)
        t = plan.target_idx
        t_off, t_dim = plan.node_offsets[t], plan.node_dims[t]
        cpds = self._cpds(vbn, plan)
        params = self._params_tuple(vbn, plan)
        post = lambda outs: outs  # noqa: E731

        # do(target) => degenerate delta at the intervened value.
        if plan.do_mask[t]:

            def fn_delta(params_tuple, key, fixed_vals):
                bb = fixed_vals.shape[0]
                value = jnp.broadcast_to(
                    fixed_vals[:, None, t_off : t_off + t_dim], (bb, s, t_dim)
                )
                return jnp.ones((bb, s), jnp.float32), value

            return Program(plan, ("mcm_delta", s), fn_delta, params, fixed, post)

        parents_fixed = all(plan.is_fixed(p) for p in plan.parent_idx[t])
        if parents_fixed:
            # Direct CPD evaluation: no ancestor sampling needed.
            def fn_direct(params_tuple, key, fixed_vals):
                bb = fixed_vals.shape[0]
                pidx = plan.parent_idx[t]
                if pidx:
                    cols = [
                        fixed_vals[
                            :,
                            plan.node_offsets[p] : plan.node_offsets[p]
                            + plan.node_dims[p],
                        ]
                        for p in pidx
                    ]
                    pflat = jnp.repeat(
                        jnp.concatenate(cols, axis=-1), s, axis=0
                    )
                else:
                    pflat = None
                if plan.evidence_mask[t]:
                    x = jnp.broadcast_to(
                        fixed_vals[:, None, t_off : t_off + t_dim],
                        (bb, s, t_dim),
                    )
                else:
                    x = cpds[t]._sample_flat(
                        params_tuple[t], key, pflat, bb * s
                    ).reshape(bb, s, t_dim)
                lp = cpds[t]._log_prob_flat(
                    params_tuple[t], x.reshape(bb * s, t_dim), pflat
                ).reshape(bb, s)
                return jnp.exp(lp), x

            return Program(
                plan, ("mcm_direct", s), fn_direct, params, fixed, post
            )

        from .likelihood_weighting import LikelihoodWeighting

        raw = (
            LikelihoodWeighting._fused_raw_fn(
                plan, cpds, s, vbn, ("lpt",), batch=b
            )
            if LikelihoodWeighting._fused_gate(vbn)
            else None
        )
        if raw is not None:
            # Fused Pallas sweep (ops/sweep_pallas.py): MCM clamps
            # evidence/do without weighting and exponentiates the
            # target's log-density — exactly the kernel's lpt output.
            def fn(params_tuple, key, fixed_vals):
                _logw, tgt, lpt, _red = raw(params_tuple, key, fixed_vals)
                return jnp.exp(lpt), tgt[:, :, None]
        else:
            def fn(params_tuple, key, fixed_vals):
                packed, _ = sweep_trace(
                    plan, cpds, params_tuple, key, fixed_vals, s
                )
                lp = target_log_prob(plan, cpds, params_tuple, packed)
                return jnp.exp(lp), node_values(plan, packed, t)

        return Program(
            plan, ("mcm", s, raw is not None), fn, params, fixed, post
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
