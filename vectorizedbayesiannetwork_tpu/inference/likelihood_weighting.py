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

import numpy as np

import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import get_plan, pack_fixed_values
from ..core.registry import register_inference
from ..core.utils import infer_batch_size
from ._base import CompiledMethod, Program
from ._dynamic_sweep import dynamic_sweep_trace, dynamic_target_values
from ._sweep import node_values, sweep_trace


@register_inference("likelihood_weighting")
class LikelihoodWeighting(CompiledMethod):
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

    def _pack_dynamic_inputs(self, plan, queries):
        """Concat queries' rows + per-row masks/targets, pow2-padded.

        Returns (inputs_tuple, spans, b_tot, b_pad) where spans is
        [(lo, hi, target_idx)] per query. Shared by the single-query
        dynamic program and the heterogeneous row-fused dispatch so the
        two paths can never drift.
        """
        node_to_idx = plan.node_to_idx()
        rows, evs, dos, tgts, spans = [], [], [], [], []
        at = 0
        for q in queries:
            b = infer_batch_size(q.evidence, q.do)
            rows.append(pack_fixed_values(q, plan, b, clamp_obs=True))
            ev = np.zeros((b, plan.n_nodes), np.float32)
            for n in q.evidence:
                ev[:, node_to_idx[n]] = 1.0
            do = np.zeros((b, plan.n_nodes), np.float32)
            for n in q.do:
                do[:, node_to_idx[n]] = 1.0
            evs.append(ev)
            dos.append(do)
            tgts.append(np.full((b,), node_to_idx[q.target], np.int32))
            spans.append((at, at + b, node_to_idx[q.target]))
            at += b
        b_tot = at
        b_pad = 1 << max(0, (b_tot - 1)).bit_length()
        pad = b_pad - b_tot
        if pad:
            rows.append(np.zeros((pad, plan.total_dim), np.float32))
            evs.append(np.zeros((pad, plan.n_nodes), np.float32))
            dos.append(np.zeros((pad, plan.n_nodes), np.float32))
            tgts.append(np.zeros((pad,), np.int32))
        inputs = (
            np.concatenate(rows, axis=0),
            np.concatenate(evs, axis=0),
            np.concatenate(dos, axis=0),
            np.concatenate(tgts, axis=0),
        )
        return inputs, spans, b_tot, b_pad

    def _dynamic_fn(self, plan, cpds, s, normalize):
        """The one mask-dynamic program body (single + row-fused paths)."""

        def fn(params_tuple, key, packed_in):
            fixed_vals, evm, dom, ti = packed_in
            packed, log_w = dynamic_sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, evm, dom, s
            )
            weights, ess = self._weights_from_logw(log_w, normalize)
            return weights, dynamic_target_values(plan, packed, ti), ess

        return fn

    def _canonical_plan(self, vbn):
        topo = tuple(vbn.dag.topological_order())
        return get_plan(vbn, Query(target=topo[0], evidence={}, do={}))

    def _make_dynamic_program(self, vbn, query: Query, s, normalize):
        """Query structure as runtime inputs; one compile per network.

        Programs are keyed by (S, normalize, padded batch bucket) only —
        the evidence/do masks, their values, and the target index cross
        as arrays. Latent draws match the static program bit-for-bit at
        equal (B, S) (same per-node key folds).
        """
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b, b_pad = self._pack_dynamic_inputs(plan, [query])
        t_dim = plan.node_dims[spans[0][2]]

        def post(outs):
            weights, samples, ess = outs
            self._last_ess = ess[:b]
            return weights[:b], samples[:b, :, :t_dim]

        return Program(
            plan,
            ("lw_dyn", s, normalize, b_pad),
            self._dynamic_fn(plan, cpds, s, normalize),
            self._params_tuple(vbn, plan),
            inputs,
            post,
        )

    def infer_posterior_many(self, vbn, queries, **kwargs):
        """Heterogeneous row-fused dispatch (dynamic mode): ANY mix of
        targets/evidence patterns rides ONE sweep — queries' rows are
        concatenated, per-row masks and target indices cross as arrays,
        and outputs are split back per query. Falls back to the generic
        program-tuple fusion otherwise."""
        if not bool(kwargs.get("dynamic_masks", self.dynamic_masks)):
            return super().infer_posterior_many(vbn, queries, **kwargs)
        s = int(kwargs.get("n_samples", self.n_samples))
        normalize = bool(kwargs.get("normalize", self.normalize))
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b_tot, b_pad = self._pack_dynamic_inputs(
            plan, queries
        )
        prog_fn = self._compiled(
            vbn,
            plan,
            ("lw_dyn", s, normalize, b_pad),
            lambda: self._dynamic_fn(plan, cpds, s, normalize),
        )
        weights, samples, ess = prog_fn(
            self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
        )
        self._last_ess = ess[:b_tot]
        out = []
        for lo, hi, t_idx in spans:
            d = plan.node_dims[t_idx]
            out.append((weights[lo:hi], samples[lo:hi, :, :d]))
        return out

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        normalize = bool(kwargs.get("normalize", self.normalize))
        if bool(kwargs.get("dynamic_masks", self.dynamic_masks)):
            return self._make_dynamic_program(vbn, query, s, normalize)
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b, clamp_obs=True)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx

        def fn(params_tuple, key, fixed_vals):
            packed, log_w = sweep_trace(
                plan, cpds, params_tuple, key, fixed_vals, s, weighted=True
            )
            weights, ess = self._weights_from_logw(log_w, normalize)
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
