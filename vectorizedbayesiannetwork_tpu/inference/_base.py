"""Shared infrastructure for inference methods: compiled-program caching.

Plays the role of the reference's per-method ``self._cache`` of
InferenceStates (``vbn/inference/importance_sampling.py:22``), but what we
cache is the *jitted program* for a (plan, CPD-signatures, n_samples, flags)
key — the XLA analogue of the reference's precompiled query plan.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

from ..core.base import Query
from ..core.plan import InferencePlan, get_plan
from ..core.utils import infer_batch_size
from ..parallel.mesh import active_mesh, mesh_signature


class CompiledMethod:
    def __init__(self) -> None:
        self._fn_cache: Dict[Tuple, Callable] = {}

    def _plan_and_batch(self, vbn, query: Query):
        b = infer_batch_size(query.evidence, query.do)
        plan = get_plan(vbn, query)
        return plan, b

    def _compiled(
        self,
        vbn,
        plan: InferencePlan,
        tag: Tuple,
        build: Callable[[], Callable],
    ) -> Callable:
        cpd_sigs = tuple(
            vbn.cpd_spec(n).static_signature() for n in plan.topo_order
        )
        mesh = getattr(vbn, "_mesh", None)
        key = (plan, cpd_sigs, mesh_signature(mesh)) + tag
        fn = self._fn_cache.get(key)
        if fn is None:
            inner = build()

            def with_mesh(*args, _inner=inner, _mesh=mesh):
                # Active-mesh context at TRACE time so sweep kernels place
                # their sharding constraints for this vbn's mesh.
                with active_mesh(_mesh):
                    return _inner(*args)

            fn = jax.jit(with_mesh)
            self._fn_cache[key] = fn
        return fn

    @staticmethod
    def _params_tuple(vbn, plan: InferencePlan) -> Tuple:
        return tuple(vbn.params[n] for n in plan.topo_order)

    @staticmethod
    def _cpds(vbn, plan: InferencePlan) -> Tuple:
        return tuple(vbn.cpd_spec(n) for n in plan.topo_order)
