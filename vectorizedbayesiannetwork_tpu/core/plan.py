"""Static inference plan: the compile-time description of a query program.

TPU-first redesign of the reference's ``InferenceState``
(``vbn/inference/_core.py:12-109``): the plan is built once per
(DAG, CPD specs, target, evidence-keys, do-keys) signature and becomes the
*trace-time constant* around which one fused XLA program is built — topo
order, packed-tensor slices, parent indices, evidence/do masks, children
tables for Markov-blanket scoring, and topological levels for batched
same-family evaluation. All fields are hashable Python ints/tuples.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Query
from .utils import ensure_2d_np


@dataclass(frozen=True)
class InferencePlan:
    topo_order: Tuple[str, ...]
    node_dims: Tuple[int, ...]
    node_offsets: Tuple[int, ...]  # start offset of each node in packed tensor
    total_dim: int
    parent_idx: Tuple[Tuple[int, ...], ...]
    evidence_mask: Tuple[bool, ...]
    do_mask: Tuple[bool, ...]
    target_idx: int
    children_idx: Tuple[Tuple[int, ...], ...]
    levels: Tuple[Tuple[int, ...], ...]

    @property
    def n_nodes(self) -> int:
        return len(self.topo_order)

    def node_slice(self, idx: int) -> slice:
        start = self.node_offsets[idx]
        return slice(start, start + self.node_dims[idx])

    def node_to_idx(self) -> Dict[str, int]:
        return {n: i for i, n in enumerate(self.topo_order)}

    def is_fixed(self, idx: int) -> bool:
        return self.evidence_mask[idx] or self.do_mask[idx]

    def parent_dim(self, idx: int) -> int:
        return sum(self.node_dims[p] for p in self.parent_idx[idx])


def plan_signature(vbn, query: Query) -> tuple:
    """Cache key: structural identity of the compiled program."""
    return (
        vbn.structure_fingerprint(),
        query.target,
        tuple(sorted(query.evidence.keys())),
        tuple(sorted(query.do.keys())),
    )


def build_plan(vbn, query: Query) -> InferencePlan:
    dag = vbn.dag
    topo = tuple(dag.topological_order())
    node_to_idx = {n: i for i, n in enumerate(topo)}
    dims = tuple(int(vbn.cpd_spec(n).output_dim) for n in topo)
    offsets: List[int] = []
    total = 0
    for d in dims:
        offsets.append(total)
        total += d
    parent_idx = tuple(
        tuple(node_to_idx[p] for p in dag.parents(n)) for n in topo
    )
    ev = set(query.evidence.keys())
    do = set(query.do.keys())
    children_idx = tuple(
        tuple(node_to_idx[c] for c in dag.children(n)) for n in topo
    )
    levels = tuple(
        tuple(node_to_idx[n] for n in lv) for lv in dag.topological_levels()
    )
    return InferencePlan(
        topo_order=topo,
        node_dims=dims,
        node_offsets=tuple(offsets),
        total_dim=total,
        parent_idx=parent_idx,
        evidence_mask=tuple(n in ev for n in topo),
        do_mask=tuple(n in do for n in topo),
        target_idx=node_to_idx[query.target],
        children_idx=children_idx,
        levels=levels,
    )


def get_plan(vbn, query: Query) -> InferencePlan:
    """Build-or-fetch the plan from the vbn-level cache."""
    sig = plan_signature(vbn, query)
    cache = vbn._plan_cache
    if sig not in cache:
        cache[sig] = build_plan(vbn, query)
    return cache[sig]


_CLAMP = 1e6


def clamp_evidence(x: jax.Array) -> jax.Array:
    """NaN/inf sanitization (parity: ``vbn/inference/_core.py:112-114``)."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=_CLAMP, neginf=-_CLAMP)
    return jnp.clip(x, -_CLAMP, _CLAMP)


def pack_fixed_values(
    query: Query,
    plan: InferencePlan,
    batch_size: int,
    *,
    clamp_obs: bool = False,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Pack evidence/do values into one [B, total_dim] array (zeros elsewhere).

    The sweep reads slices of this array for nodes whose evidence/do mask is
    set; untouched slices are never read. Packing into a single array keeps
    the jitted sweep's signature fixed regardless of which nodes are observed.

    Built HOST-SIDE (numpy): the packed array crosses to the device once at
    the jit call boundary instead of as a chain of eager device ops — on the
    serving path this is the difference between ~0.05 ms and ~0.8 ms per
    query batch (BENCH_NOTES.md "host-sync elimination").
    """
    node_to_idx = plan.node_to_idx()
    if out is None:
        out = np.zeros((batch_size, plan.total_dim), dtype=np.float32)
    # else: caller provides a zeroed [batch_size, total_dim] view —
    # row-fused packers preallocate ONE buffer for the whole dispatch
    # (per-query [1, total_dim] allocations were ~15% of a 96-query
    # link-scale flush).
    for mapping, do_clamp in ((query.do, False), (query.evidence, clamp_obs)):
        for node, value in mapping.items():
            idx = node_to_idx[node]
            v = ensure_2d_np(value)
            if v.shape[0] == 1 and batch_size > 1:
                v = np.broadcast_to(v, (batch_size, v.shape[1]))
            if v.shape != (batch_size, plan.node_dims[idx]):
                raise ValueError(
                    f"Evidence/do for {node!r} has shape {v.shape}; expected "
                    f"({batch_size}, {plan.node_dims[idx]})"
                )
            if do_clamp:
                v = np.clip(
                    np.nan_to_num(v, nan=0.0, posinf=_CLAMP, neginf=-_CLAMP),
                    -_CLAMP,
                    _CLAMP,
                )
            off = plan.node_offsets[idx]
            out[:, off : off + v.shape[1]] = v
    return out
