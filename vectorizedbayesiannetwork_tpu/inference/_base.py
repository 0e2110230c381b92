"""Shared infrastructure for inference methods: compiled-program caching.

Plays the role of the reference's per-method ``self._cache`` of
InferenceStates (``vbn/inference/importance_sampling.py:22``), but what we
cache is the *jitted program* for a (plan, CPD-signatures, n_samples, flags)
key — the XLA analogue of the reference's precompiled query plan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax

from ..core.base import Query
from ..core.plan import InferencePlan, get_plan
from ..core.utils import infer_batch_size
from ..parallel.mesh import active_mesh, mesh_signature


@dataclass
class Program:
    """A query's traceable inference program, before jit.

    ``fn(params_tuple, key, fixed) -> outs`` is the pure program;
    ``post(outs) -> (pdf, samples)`` is the host-side epilogue (ESS
    bookkeeping, fallback decisions). Methods that expose programs can be
    fused: ``infer_posterior_many`` traces several programs into ONE XLA
    computation, amortizing dispatch overhead across queries — the TPU
    analogue of the reference's skeleton-grouped query batching
    (``benchmarking/IIII_run_benchmark/base.py:69-110``), but across
    *heterogeneous* plans rather than only same-skeleton queries.
    """

    plan: InferencePlan
    tag: Tuple
    fn: Callable
    params: Tuple
    fixed: jax.Array
    post: Callable


class CompiledMethod:
    def __init__(self) -> None:
        self._fn_cache: Dict[Tuple, Callable] = {}
        self._fused_cache: Dict[Tuple, Callable] = {}

    def make_program(self, vbn, query: Query, **kwargs) -> Optional[Program]:
        """Return this query's Program, or None if the method has host-side
        control flow that cannot be expressed as one pure program."""
        return None

    def _program_key(self, vbn, plan: InferencePlan, tag: Tuple) -> Tuple:
        cpd_sigs = tuple(
            vbn.cpd_spec(n).static_signature() for n in plan.topo_order
        )
        return (plan, cpd_sigs, mesh_signature(getattr(vbn, "_mesh", None))) + tag

    def infer_posterior_many(
        self, vbn, queries: Sequence[Query], **kwargs
    ) -> Optional[List[Tuple[jax.Array, jax.Array]]]:
        """Answer several queries in ONE device dispatch, or None to signal
        the caller to fall back to sequential per-query dispatch."""
        progs = [self.make_program(vbn, q, **kwargs) for q in queries]
        if not progs or any(p is None for p in progs):
            return None
        # Programs of one model nearly always share the same params pytree
        # (the plan's topo order is the full DAG for every query). Dedupe by
        # leaf identity so the dispatch flattens each param leaf ONCE, not
        # once per query — at many queries the host-side flatten is the
        # fixed cost fusion exists to amortize.
        unique_params: List = []
        param_idx: List[int] = []
        for p in progs:
            for j, u in enumerate(unique_params):
                if u is p.params or (
                    isinstance(u, tuple)
                    and isinstance(p.params, tuple)
                    and len(u) == len(p.params)
                    and all(a is b for a, b in zip(u, p.params))
                ):
                    param_idx.append(j)
                    break
            else:
                unique_params.append(p.params)
                param_idx.append(len(unique_params) - 1)
        cache_key = tuple(
            self._program_key(vbn, p.plan, p.tag) for p in progs
        ) + (tuple(param_idx),)
        fused = self._fused_cache.get(cache_key)
        if fused is None:
            fns = tuple(p.fn for p in progs)
            mesh = getattr(vbn, "_mesh", None)
            idx = tuple(param_idx)

            def fused_fn(uparams, key_specs, fixed_list, _fns=fns, _mesh=mesh):
                with active_mesh(_mesh):
                    return tuple(
                        f(
                            uparams[idx[i]],
                            jax.random.fold_in(*key_specs[i]),
                            fixed_list[i],
                        )
                        for i, f in enumerate(_fns)
                    )

            fused = jax.jit(fused_fn)
            self._fused_cache[cache_key] = fused
        outs = fused(
            tuple(unique_params),
            tuple(vbn.next_key_spec() for _ in progs),
            tuple(p.fixed for p in progs),
        )
        return [p.post(o) for p, o in zip(progs, outs)]

    def _run_program(self, vbn, prog: Program):
        fn = self._compiled(vbn, prog.plan, prog.tag, lambda: prog.fn)
        outs = fn(prog.params, vbn.next_key_spec(), prog.fixed)
        return prog.post(outs)

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
                # their sharding constraints for this vbn's mesh. Stochastic
                # programs are called as (params, (root, counter), fixed);
                # the key is folded HERE, in-graph, so advancing the key
                # stream costs no eager device ops on the host (same bits as
                # KeyStream.next()). Keyless programs (exact methods) call
                # with (params, fixed) and skip the fold.
                if len(args) == 3:
                    params, key_spec, fixed = args
                    args = (params, jax.random.fold_in(*key_spec), fixed)
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
