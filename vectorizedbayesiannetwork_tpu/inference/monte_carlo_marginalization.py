"""Monte-Carlo marginalization posterior inference.

Capability parity with
``/root/reference/vbn/inference/monte_carlo_marginalization.py:12-92``:
intervened-target delta fast path, all-parents-observed direct-CPD fast path,
otherwise a full ancestral sweep; pdf = exp(target log-density). Here each
path is a single cached XLA program (see ``_sweep.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ._base import CompiledMethod, Program
from ._sweep import node_values, sweep_trace, target_log_prob


@register_inference("monte_carlo_marginalization")
class MonteCarloMarginalization(CompiledMethod):
    def __init__(self, n_samples: int = 200, **_kwargs) -> None:
        super().__init__()
        self.n_samples = int(n_samples)

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
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

        def fn(params_tuple, key, fixed_vals):
            packed, _ = sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, s
            )
            lp = target_log_prob(plan, cpds, params_tuple, packed)
            return jnp.exp(lp), node_values(plan, packed, t)

        return Program(plan, ("mcm", s), fn, params, fixed, post)

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
