"""Ancestral (forward) sampling.

Capability parity with ``/root/reference/vbn/sampling/ancestral.py:13-65``:
topological sweep with evidence/do clamped, returning target-node draws (and
a joint per-node dict). The sweep is the same compiled program used by the
inference family (``_sweep.py``) — one fused XLA ancestral kernel.
"""

from __future__ import annotations

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_sampling
from ..inference._base import CompiledMethod
from ..inference._sweep import node_values, sweep_trace


@register_sampling("ancestral")
class AncestralSampler(CompiledMethod):
    def __init__(self, n_samples: int = 512, **_kwargs) -> None:
        super().__init__()
        self.n_samples = int(n_samples)

    def _packed(self, vbn, query: Query, s: int):
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b)
        cpds = self._cpds(vbn, plan)

        def build():
            def fn(params_tuple, key, fixed_vals):
                packed, _ = sweep_trace(
                    plan, cpds, params_tuple, key, fixed_vals, s
                )
                return packed

            return fn

        fn = self._compiled(vbn, plan, ("ancestral", s), build)
        packed = fn(self._params_tuple(vbn, plan), vbn.next_key_spec(), fixed)
        return plan, packed

    def sample(self, vbn, query: Query, n_samples: int = None, **kwargs):
        s = int(n_samples or kwargs.get("n_samples", self.n_samples))
        plan, packed = self._packed(vbn, query, s)
        return node_values(plan, packed, plan.target_idx)

    def sample_joint(self, vbn, query: Query, n_samples: int = None, **kwargs):
        s = int(n_samples or kwargs.get("n_samples", self.n_samples))
        plan, packed = self._packed(vbn, query, s)
        return {
            node: node_values(plan, packed, idx)
            for idx, node in enumerate(plan.topo_order)
        }
