"""Exact Gaussian posterior on a stddev grid (scalar target, parents observed).

Capability parity with ``/root/reference/vbn/inference/gaussian_exact.py:14-183``:
when the target is a scalar Gaussian-family CPD with all parents observed,
evaluate the exact pdf on a ``loc ± stddevs·scale`` linspace grid; anything
else routes to the configurable registry fallback. Duck typing is protocol-
based here: a Gaussian family exposes ``conditional_params(params, parents)``
and neither a mixture nor a categorical head.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.plan import get_plan, pack_fixed_values
from ..core.registry import INFERENCE_REGISTRY, register_inference
from ..ops.gauss import LOG_2PI
from ._base import CompiledMethod


def make_fallback(name: str, self_name: str, kwargs):
    name = str(name).strip().lower() if name is not None else "none"
    if name == "none":
        return None
    if name not in INFERENCE_REGISTRY:
        raise ValueError(
            f"Unknown fallback inference {name!r}. "
            f"Available: {sorted(INFERENCE_REGISTRY)}"
        )
    if name == self_name:
        raise ValueError(f"fallback cannot be {self_name!r}")
    return INFERENCE_REGISTRY[name](**kwargs)


def is_gaussian_family(cpd) -> bool:
    return (
        hasattr(cpd, "conditional_params")
        and not hasattr(cpd, "mixture_params")
        and not hasattr(cpd, "categorical_probs")
    )


@register_inference("gaussian_exact")
class GaussianExact(CompiledMethod):
    def __init__(
        self,
        n_samples: int = 200,
        stddevs: float = 4.0,
        min_scale: float = 1e-6,
        fallback: str = "likelihood_weighting",
        **kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.stddevs = float(stddevs)
        self.min_scale = float(min_scale)
        fb_kwargs = dict(kwargs)
        fb_kwargs.setdefault("n_samples", self.n_samples)
        self._fallback = make_fallback(fallback, "gaussian_exact", fb_kwargs)
        self._last_fallback = False

    def _fallback_infer(self, vbn, query, **kwargs):
        self._last_fallback = True
        if self._fallback is None:
            raise RuntimeError(
                "gaussian_exact cannot handle this query and has no fallback"
            )
        return self._fallback.infer_posterior(vbn, query, **kwargs)

    # Fused moments serving rides the closed-form joint-conditioning
    # program (_lg_exact.py) when the whole network is linear-Gaussian.
    fused_moments_capable = True

    def infer_posterior_moments(
        self, vbn, queries, *, pad_bucket: int = 1, **kwargs
    ) -> Optional[Tuple[np.ndarray, List[Tuple[int, int, int]]]]:
        """Fused EXACT (mean, std) for heterogeneous Gaussian queries.

        One closed-form conditioning program per all-linear-Gaussian
        network (``_lg_exact.py``) answers every evidence/do/target
        skeleton in one dispatch — exactly, with latent parents
        marginalized analytically, a superset of the per-query grid
        path. Returns None when any CPD is not linear-Gaussian.
        """
        from ._dynamic_base import pack_dynamic_inputs
        from ._lg_exact import lg_exact_supported, make_lg_exact_fn

        topo = tuple(vbn.dag.topological_order())
        plan = get_plan(vbn, Query(target=topo[0], evidence={}, do={}))
        cpds = self._cpds(vbn, plan)
        if not lg_exact_supported(plan, cpds):
            return None
        inputs, spans, b_tot, b_pad = pack_dynamic_inputs(
            plan, queries, clamp_obs=True, pad_to=pad_bucket
        )
        prog = self._compiled(
            vbn,
            plan,
            ("lg_exact", b_pad),
            lambda: make_lg_exact_fn(plan, cpds),
        )
        outs = prog(self._params_tuple(vbn, plan), inputs)
        self._last_fallback = False
        return np.asarray(outs[0])[:b_tot], spans

    def infer_posterior(self, vbn, query: Query, **kwargs):
        self._last_fallback = False
        s = max(1, int(kwargs.get("n_samples", self.n_samples)))
        plan, b = self._plan_and_batch(vbn, query)
        t = plan.target_idx
        cpd = self._cpds(vbn, plan)[t]
        if plan.node_dims[t] != 1:
            return self._fallback_infer(vbn, query, **kwargs)
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        t_off = plan.node_offsets[t]
        if plan.is_fixed(t):
            value = fixed[:, None, t_off : t_off + 1]
            return jnp.ones((b, 1), jnp.float32), value
        if not all(plan.is_fixed(p) for p in plan.parent_idx[t]):
            return self._fallback_infer(vbn, query, **kwargs)
        if not is_gaussian_family(cpd):
            return self._fallback_infer(vbn, query, **kwargs)

        def build():
            def fn(params_tuple, fixed_vals):
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
                    pflat = jnp.concatenate(cols, axis=-1)
                else:
                    pflat = None
                loc, scale = cpd.conditional_params(params_tuple[t], pflat)
                loc = jnp.broadcast_to(loc.reshape(-1, 1)[:bb], (bb, 1))
                scale = jnp.broadcast_to(scale.reshape(-1, 1)[:bb], (bb, 1))
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
                z = jnp.linspace(-self.stddevs, self.stddevs, s)[None, :, None]
                samples = loc[:, None, :] + scale[:, None, :] * z
                log_pdf = -0.5 * (
                    z[..., 0] ** 2 + 2.0 * jnp.log(scale) + LOG_2PI
                )
                return jnp.exp(log_pdf), samples

            return fn

        fn = self._compiled(vbn, plan, ("gauss_exact", s, self.stddevs), build)
        return fn(self._params_tuple(vbn, plan), fixed)
