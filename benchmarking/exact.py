"""Exact inference & sampling on DiscreteBN: the ground-truth engine.

Capability parity with the reference's ground-truth computation
(``benchmarking/II_query_generation/bnlearn.py:1201-1327`` — exact
enumeration / pgmpy VariableElimination) and exact ancestral data
generation (``III_data_generation/bnlearn.py``), self-contained: a small
factor-based variable-elimination engine over numpy plus a vectorized
ancestral sampler.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .bif import DiscreteBN


class Factor:
    """Dense factor over a list of discrete variables."""

    def __init__(self, variables: List[str], table: np.ndarray) -> None:
        self.variables = list(variables)
        self.table = np.asarray(table, np.float64)

    def reduce(self, var: str, idx: int) -> "Factor":
        axis = self.variables.index(var)
        table = np.take(self.table, idx, axis=axis)
        vs = [v for v in self.variables if v != var]
        return Factor(vs, table)

    def multiply(self, other: "Factor") -> "Factor":
        vs = list(self.variables)
        for v in other.variables:
            if v not in vs:
                vs.append(v)
        a = _broadcast_to(self, vs)
        b = _broadcast_to(other, vs)
        return Factor(vs, a * b)

    def marginalize(self, var: str) -> "Factor":
        axis = self.variables.index(var)
        vs = [v for v in self.variables if v != var]
        return Factor(vs, self.table.sum(axis=axis))


def _broadcast_to(factor: Factor, variables: List[str]) -> np.ndarray:
    shape = [1] * len(variables)
    src_axes = []
    for v in factor.variables:
        src_axes.append(variables.index(v))
    perm_table = factor.table
    # move factor axes into the target ordering
    order = np.argsort(src_axes)
    perm_table = np.transpose(factor.table, axes=order)
    sorted_axes = sorted(src_axes)
    for ax, v_idx in enumerate(sorted_axes):
        shape[v_idx] = perm_table.shape[ax]
    return perm_table.reshape(shape)


def bn_factors(bn: DiscreteBN) -> List[Factor]:
    factors = []
    for node in bn.nodes:
        vs = bn.parents[node] + [node]
        factors.append(Factor(vs, bn.cpts[node]))
    return factors


_MAX_FACTOR_SIZE = 50_000_000  # ~400MB float64: refuse instead of hanging


def min_fill_order(bn: DiscreteBN) -> List[str]:
    """Greedy min-fill elimination order on the moralized graph.

    Pure graph computation, independent of evidence, so ONE order per
    network serves every query (the per-query greedy min-weight search
    inside ``exact_posterior`` scans all factors per candidate per step —
    O(n^3) — which is minutes/query at link scale; this is the standard
    triangulation heuristic the reference gets for free from pgmpy's
    VariableElimination). Ties break on elimination weight (product of
    cards over the closed neighborhood), then on name for determinism.
    """
    adj: Dict[str, set] = {n: set() for n in bn.nodes}
    for c in bn.nodes:
        ps = bn.parents[c]
        for p in ps:
            adj[c].add(p)
            adj[p].add(c)
        for i in range(len(ps)):  # moralization
            for j in range(i + 1, len(ps)):
                adj[ps[i]].add(ps[j])
                adj[ps[j]].add(ps[i])
    cards = {n: bn.card(n) for n in bn.nodes}
    remaining = set(bn.nodes)
    order: List[str] = []

    def fill_and_weight(v):
        nb = adj[v] & remaining
        nb_list = list(nb)
        fill = 0
        for i in range(len(nb_list)):
            for j in range(i + 1, len(nb_list)):
                if nb_list[j] not in adj[nb_list[i]]:
                    fill += 1
        w = cards[v]
        for u in nb:
            w *= cards[u]
        return fill, w

    while remaining:
        best = min(
            remaining, key=lambda v: fill_and_weight(v) + (v,)
        )
        nb = adj[best] & remaining
        nb_list = list(nb)
        for i in range(len(nb_list)):
            for j in range(i + 1, len(nb_list)):
                adj[nb_list[i]].add(nb_list[j])
                adj[nb_list[j]].add(nb_list[i])
        remaining.discard(best)
        order.append(best)
    return order


def exact_posterior(
    bn: DiscreteBN,
    target: str,
    evidence: Optional[Dict[str, int]] = None,
    elim_order: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """p(target | evidence) via variable elimination. evidence: node->state idx.

    ``elim_order`` (e.g. from ``min_fill_order``) skips the per-query
    greedy search — at link scale (724/1041 nodes) the greedy's
    all-factor scan per candidate is O(n^3) per query while an indexed
    elimination along a precomputed order is O(n * w). Raises instead of
    hanging when the induced factor size explodes (high treewidth) —
    callers (query-gen ground truth) record the failure.
    """
    evidence = evidence or {}
    # Indexed factor store: id -> Factor, var -> set of live factor ids.
    store: Dict[int, Factor] = {}
    by_var: Dict[str, set] = {n: set() for n in bn.nodes}
    next_id = 0
    for f in bn_factors(bn):
        for var, idx in evidence.items():
            if var in f.variables:
                f = f.reduce(var, idx)
        store[next_id] = f
        for v in f.variables:
            by_var[v].add(next_id)
        next_id += 1
    cards = {n: bn.card(n) for n in bn.nodes}

    def eliminate(var):
        nonlocal next_id
        related = sorted(by_var[var])
        if not related:
            return
        prod = store[related[0]]
        for fid in related[1:]:
            prod = prod.multiply(store[fid])
            if prod.table.size > _MAX_FACTOR_SIZE:
                raise MemoryError(
                    f"Variable elimination factor over {len(prod.variables)} "
                    f"variables exceeds {_MAX_FACTOR_SIZE} entries "
                    "(high treewidth); exact ground truth unavailable."
                )
        for fid in related:
            for v in store[fid].variables:
                by_var[v].discard(fid)
            del store[fid]
        marg = prod.marginalize(var)
        store[next_id] = marg
        for v in marg.variables:
            by_var[v].add(next_id)
        next_id += 1

    elim = {n for n in bn.nodes if n != target and n not in evidence}
    if elim_order is not None:
        for var in elim_order:
            if var in elim:
                elim.discard(var)
                eliminate(var)
    # Greedy min-weight elimination for whatever remains: at each step
    # eliminate the variable whose product factor is smallest. (The
    # round-2 topological-order elimination blew past _MAX_FACTOR_SIZE on
    # 54/96 insurance queries; min-weight answers all of them.)

    def _elim_weight(var):
        union = {var}
        for fid in by_var[var]:
            union.update(store[fid].variables)
        w = 1
        for v in union:
            w *= cards[v]
        return w

    while elim:
        var = min(elim, key=_elim_weight)
        elim.discard(var)
        eliminate(var)
    live = [store[fid] for fid in sorted(store)]
    result = live[0]
    for f in live[1:]:
        result = result.multiply(f)
    # squeeze any stray singleton vars (fully-reduced factors)
    while len(result.variables) > 1:
        extra = next(v for v in result.variables if v != target)
        result = result.marginalize(extra)
    probs = result.table
    total = probs.sum()
    if total <= 0:
        raise ValueError("Evidence has zero probability under the network")
    return probs / total


def exact_do_posterior(
    bn: DiscreteBN,
    target: str,
    do: Dict[str, int],
    evidence: Optional[Dict[str, int]] = None,
) -> np.ndarray:
    """Interventional p(target | do(...), evidence) via graph surgery."""
    mutilated = DiscreteBN(
        name=bn.name + "_do",
        nodes=list(bn.nodes),
        states=dict(bn.states),
        parents={
            n: ([] if n in do else list(bn.parents[n])) for n in bn.nodes
        },
        cpts={},
    )
    for n in bn.nodes:
        if n in do:
            delta = np.zeros(bn.card(n))
            delta[do[n]] = 1.0
            mutilated.cpts[n] = delta
        else:
            mutilated.cpts[n] = bn.cpts[n]
    return exact_posterior(mutilated, target, evidence)


def ancestral_sample(
    bn: DiscreteBN, n: int, seed: int = 0
) -> Dict[str, np.ndarray]:
    """n i.i.d. joint samples (state indices) via vectorized ancestral sweep."""
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for node in bn.topological_order():
        parents = bn.parents[node]
        cpt = bn.cpts[node]
        card = bn.card(node)
        if not parents:
            probs = np.broadcast_to(cpt, (n, card))
        else:
            idx = tuple(out[p] for p in parents)
            probs = cpt[idx]  # [n, card]
        u = rng.random((n, 1))
        out[node] = (probs.cumsum(axis=1) < u).sum(axis=1).clip(0, card - 1)
    return out


def joint_log_prob(
    bn: DiscreteBN, assignment: Dict[str, np.ndarray]
) -> np.ndarray:
    """Vectorized log p(x) of full assignments (state indices)."""
    total = None
    for node in bn.nodes:
        cpt = bn.cpts[node]
        idx = tuple(assignment[p] for p in bn.parents[node]) + (
            assignment[node],
        )
        lp = np.log(np.maximum(cpt[idx], 1e-300))
        total = lp if total is None else total + lp
    return total
