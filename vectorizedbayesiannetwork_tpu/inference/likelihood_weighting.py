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
from ._base import Program
from ._dynamic_base import DynamicMaskMethod
from ._dynamic_sweep import dynamic_sweep_trace, dynamic_target_values
from ._sweep import node_values, sweep_trace


@register_inference("likelihood_weighting")
class LikelihoodWeighting(DynamicMaskMethod):
    dynamic_tag = "lw_dyn"
    pack_clamp_obs = True
    _static_red_src = "logw"  # fused in-kernel pmf/moments reductions

    def __init__(
        self,
        n_samples: int = 200,
        eps: float = 1e-12,
        normalize: bool = True,
        dynamic_masks: bool = False,
        **_kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.eps = float(eps)
        self.normalize = bool(normalize)
        # dynamic_masks: ONE compiled program per network — evidence/do
        # masks and the target become runtime inputs (see
        # _dynamic_sweep.py). Turn on for workloads with many distinct
        # evidence patterns, where per-skeleton compiles dominate.
        self.dynamic_masks = bool(dynamic_masks)
        self._last_ess = None

    def _weights_from_logw(self, log_w, normalize):
        weights = jnp.exp(log_w - jnp.max(log_w, axis=1, keepdims=True))
        if normalize:
            weights = weights / jnp.maximum(
                jnp.sum(weights, axis=1, keepdims=True), self.eps
            )
        ess = 1.0 / jnp.maximum(
            jnp.sum(
                (
                    weights
                    / jnp.maximum(
                        jnp.sum(weights, axis=1, keepdims=True), self.eps
                    )
                )
                ** 2,
                axis=1,
            ),
            self.eps,
        )
        return weights, ess

    def _dynamic_opts(self, kwargs):
        return (bool(kwargs.get("normalize", self.normalize)),)

    @staticmethod
    def _fused_gate(vbn) -> bool:
        """Gate for the fully-fused Pallas sweep (VBN_FUSED_SWEEP=
        auto|never|always; 'always' forces the interpret-mode kernel
        off-TPU for debugging/CI). Sharded vbns are served too: the
        kernel composes with the ('data','particle') mesh via shard_map
        (round-3 VERDICT next #1)."""
        import os

        mode = os.environ.get("VBN_FUSED_SWEEP", "auto").lower()
        if mode == "never":
            return False
        from ..ops.sweep_pallas import sweep_pallas_available

        return sweep_pallas_available() or mode == "always"

    @staticmethod
    def _fused_raw_fn(plan, cpds, s, vbn, want=("logw",), batch=None):
        from ..ops.sweep_pallas import make_fused_sweep_fn

        mesh = getattr(vbn, "_mesh", None)
        raw = make_fused_sweep_fn(
            plan, cpds, s, want=want, mesh=mesh, batch=batch,
        )
        if raw is not None:
            return raw
        # Beyond the unrolled kernel's node budget (compile time grows
        # O(N) in its per-node program text), static plans ride the
        # scan-form kernel with the plan's masks as runtime arrays —
        # same outputs, O(1) compile (ops/sweep_scan_pallas.py).
        from ..ops.sweep_scan_pallas import make_scan_sweep_fn

        scan_raw = make_scan_sweep_fn(plan, cpds, s, want=want, mesh=mesh)
        if scan_raw is None:
            return None
        if batch is not None and not scan_raw.fits(batch):
            return None
        import numpy as _np

        import jax.numpy as jnp

        ev = _np.asarray(plan.evidence_mask, _np.float32)
        do = _np.asarray(plan.do_mask, _np.float32)
        ti = int(plan.target_idx)
        n = plan.n_nodes

        def raw_static(params_tuple, key, fixed_vals):
            b = fixed_vals.shape[0]
            evb = jnp.tile(jnp.asarray(ev)[None], (b, 1))
            dob = jnp.tile(jnp.asarray(do)[None], (b, 1))
            tib = jnp.full((b,), ti, jnp.int32)
            return scan_raw(params_tuple, key, fixed_vals, evb, dob, tib)

        return raw_static

    def _dyn_red_raw(self, plan, cpds, s, opts, vbn, kind):
        """LW's weights are a pure function of the evidence log-weights,
        so the scan kernel's in-kernel reductions (``pmf_logw`` /
        ``mom_logw``) serve infer_posterior_pmf/_moments directly: the
        normalized pmf from exp(logw - max) histogram lanes equals the
        stream path's softmax-weighted histogram, and the moment lanes'
        max shift cancels in the ratios. pmf requires the categorical
        scan kernel (the LG variant reduces moments only)."""
        if kind == "pmf":
            from ..ops.sweep_scan_pallas import scan_sweep_reason
            from ..parallel.mesh import PARTICLE_AXIS

            mesh = getattr(vbn, "_mesh", None)
            npart = int(mesh.shape[PARTICLE_AXIS]) if mesh is not None else 1
            if scan_sweep_reason(plan, cpds, s // max(1, npart)) is not None:
                return None
        return self._fused_dyn_raw(plan, cpds, s, vbn, (f"{kind}_logw",))

    def _dynamic_fn(self, plan, cpds, s, opts, vbn=None):
        """The one mask-dynamic program body (single + row-fused paths).
        All-categorical plans ride the scan-form fused Pallas kernel
        when the packed query rows fit SMEM; otherwise (or for other
        CPD families) the XLA mask-dynamic sweep serves."""
        (normalize,) = opts
        raw = self._fused_dyn_raw(plan, cpds, s, vbn, ("logw", "tgt"))

        def fn(params_tuple, key, packed_in):
            fixed_vals, evm, dom, ti = packed_in
            if raw is not None and raw.fits(fixed_vals.shape[0]):
                log_w, tgt, _, _ = raw(
                    params_tuple, key, fixed_vals, evm, dom, ti
                )
                weights, ess = self._weights_from_logw(log_w, normalize)
                return weights, tgt[:, :, None], ess
            packed, log_w = dynamic_sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, evm, dom, s
            )
            weights, ess = self._weights_from_logw(log_w, normalize)
            return weights, dynamic_target_values(plan, packed, ti), ess

        return fn

    def _note_dynamic_aux(self, aux, sl):
        self._last_ess = aux[0][sl]

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        normalize = bool(kwargs.get("normalize", self.normalize))
        if self._dynamic_enabled(kwargs):
            return self._make_dynamic_program(
                vbn, query, s, self._dynamic_opts(kwargs)
            )
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx

        raw = (
            self._fused_raw_fn(plan, cpds, s, vbn, batch=b)
            if self._fused_gate(vbn)
            else None
        )
        if raw is not None:
            # All-categorical / all-linear-Gaussian static plans take the
            # fully-fused Pallas sweep (ops/sweep_pallas.py): the whole
            # topo sweep runs in VMEM and only log-weights + target
            # values touch HBM — measured 97 ms -> 7.9 ms on the asia
            # 1M-particle headline (HBM-bound XLA sweep vs VPU-bound
            # kernel).
            def fn(params_tuple, key, fixed_vals):
                log_w, tgt, _lpt, _red = raw(params_tuple, key, fixed_vals)
                weights, ess = self._weights_from_logw(log_w, normalize)
                return weights, tgt[:, :, None], ess
        else:
            def fn(params_tuple, key, fixed_vals):
                packed, log_w = sweep_trace(
                    plan, cpds, params_tuple, key, fixed_vals, s,
                    weighted=True,
                )
                weights, ess = self._weights_from_logw(log_w, normalize)
                return weights, node_values(plan, packed, t), ess

        def post(outs):
            weights, samples, ess = outs
            self._last_ess = ess
            return weights, samples

        return Program(
            plan,
            ("lw", s, normalize, raw is not None),
            fn,
            self._params_tuple(vbn, plan),
            fixed,
            post,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
