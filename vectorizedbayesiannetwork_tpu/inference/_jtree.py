"""Compiled junction-tree calibration: exact discrete posteriors beyond
joint-support enumeration range.

``_exact_enum.py`` enumerates the joint state space — exact and fast for
small networks, hopeless past ~2^16 states (insurance's joint support is
~10^13). This module compiles the classical clique-tree sum-product
algorithm into ONE mask-dynamic XLA program per network:

- Host side (trace time): moralize the DAG, triangulate by greedy
  min-weight elimination (the same heuristic that fixed the insurance
  oracle in round 3, ``benchmarking/exact.py:91-109``), collect maximal
  cliques, build a max-spanning junction tree on separator sizes, assign
  each CPT family and each evidence message to a home clique, and lay
  out a two-pass (collect/distribute) message schedule. All static.
- Device side: clique potentials are products of in-graph CPTs
  (``categorical_probs`` on enumerated parent combos, so fitted params
  never retrace) times per-node evidence messages
  ``onehot(class) if clamped else ones`` — evidence/do VALUES and masks
  are runtime inputs, so one compiled program answers every query
  skeleton AND every target (calibration yields all-node marginals).
  ``do`` drops the intervened node's own CPT factor per batch row
  (graph surgery), exactly the ``_exact_enum`` semantics.
- Numerics: linear space with per-message/per-belief normalization (the
  posterior is conditional, so normalizers cancel); messages guard
  against zero-probability evidence with a floor.

Complexity is O(sum_cliques B * states(clique)) instead of
O(B * prod_nodes card) — insurance (27 nodes) and alarm (37) calibrate
in well under a millisecond per query batch where enumeration is
impossible. This supersedes the reference's parents-observed-only exact
path (``/root/reference/vbn/inference/categorical_exact.py:38-87``) and
serves the ground-truth role its pgmpy VariableElimination plays in the
benchmark suite (``/root/reference/benchmarking/II_query_generation/
bnlearn.py:1201-1326``) — on device, batched, compiled.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan
from ._exact_enum import _mixed_radix_digits, _node_cards

_EPS = 1e-30


# ---------------------------------------------------------------------------
# Host-side structure build
# ---------------------------------------------------------------------------

class JTree:
    """Static junction-tree structure for a plan (host-side, hashable id)."""

    def __init__(
        self,
        cards: Tuple[int, ...],
        cliques: List[Tuple[int, ...]],
        parent: List[int],
        order: List[int],
        factor_home: List[int],
        message_home: List[int],
        node_home: List[int],
        max_states: int,
    ) -> None:
        self.cards = cards
        self.cliques = cliques  # sorted var tuples
        self.parent = parent  # parent clique index (-1 = root of its tree)
        self.order = order  # upward (children-first) traversal order
        self.factor_home = factor_home  # node i's CPT lives in clique[...]
        self.message_home = message_home  # node i's evidence msg clique
        self.node_home = node_home  # smallest clique containing node i
        self.max_states = max_states


def build_jtree(
    plan: InferencePlan, cards: Sequence[int], max_clique_states: int
) -> Optional[JTree]:
    """Moralize + min-weight triangulate + junction tree, or None when the
    largest clique exceeds ``max_clique_states``."""
    n = plan.n_nodes
    adj = [set() for _ in range(n)]

    def connect(a: int, b: int) -> None:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)

    for i in range(n):
        for p in plan.parent_idx[i]:
            connect(i, p)
        for a in plan.parent_idx[i]:
            for b in plan.parent_idx[i]:
                connect(a, b)  # moralization: marry parents

    # Greedy min-weight elimination over the moralized graph.
    work = [set(s) for s in adj]
    alive = set(range(n))
    cliques: List[Tuple[int, ...]] = []
    max_states = 1
    while alive:
        best, best_w = None, None
        for v in alive:
            w = cards[v]
            for u in work[v]:
                w *= cards[u]
            if best_w is None or w < best_w:
                best, best_w = v, w
        if best_w > max_clique_states:
            return None
        v = best
        clique = tuple(sorted({v} | work[v]))
        max_states = max(max_states, best_w)
        # connect v's neighbors (fill-in), remove v
        nbrs = list(work[v])
        for a in nbrs:
            for b in nbrs:
                if a != b:
                    work[a].add(b)
        for u in nbrs:
            work[u].discard(v)
        alive.discard(v)
        work[v] = set()
        cliques.append(clique)

    # Keep maximal cliques only.
    maximal: List[Tuple[int, ...]] = []
    for c in cliques:
        cs = set(c)
        if not any(cs < set(m) or cs == set(m) for m in maximal):
            maximal = [m for m in maximal if not set(m) < cs]
            maximal.append(c)
    cliques = maximal
    m = len(cliques)
    csets = [set(c) for c in cliques]

    # Max-spanning forest on separator sizes (Prim per component) — the
    # running-intersection property holds for max-weight trees over
    # elimination cliques.
    parent = [-1] * m
    in_tree = [False] * m
    for root in range(m):
        if in_tree[root]:
            continue
        in_tree[root] = True
        frontier = [root]
        while True:
            best_edge, best_w = None, 0
            for t in range(m):
                if in_tree[t]:
                    continue
                for s in frontier:
                    w = len(csets[s] & csets[t])
                    if w > best_w:
                        best_edge, best_w = (s, t), w
            if best_edge is None:
                break
            s, t = best_edge
            parent[t] = s
            in_tree[t] = True
            frontier.append(t)

    # Children-first traversal order (upward pass).
    children = [[] for _ in range(m)]
    roots = []
    for c, p in enumerate(parent):
        if p >= 0:
            children[p].append(c)
        else:
            roots.append(c)
    order: List[int] = []

    def post(c: int) -> None:
        for ch in children[c]:
            post(ch)
        order.append(c)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * m + 100))
    try:
        for r in roots:
            post(r)
    finally:
        sys.setrecursionlimit(old_limit)

    # Factor / message / marginal homes.
    def home_for(vars_needed: set) -> int:
        best, best_states = None, None
        for ci, cs in enumerate(csets):
            if vars_needed <= cs:
                st = 1
                for v in cliques[ci]:
                    st *= cards[v]
                if best_states is None or st < best_states:
                    best, best_states = ci, st
        assert best is not None, "triangulation must cover every family"
        return best

    factor_home = [
        home_for({i} | set(plan.parent_idx[i])) for i in range(n)
    ]
    message_home = [home_for({i}) for i in range(n)]
    node_home = message_home
    return JTree(
        tuple(int(c) for c in cards),
        cliques,
        parent,
        order,
        factor_home,
        message_home,
        node_home,
        max_states,
    )


def jtree_supported(
    plan: InferencePlan, cpds: Sequence, max_clique_states: int
) -> bool:
    cards = _node_cards(plan, cpds)
    if cards is None:
        return False
    return build_jtree(plan, cards, max_clique_states) is not None


# ---------------------------------------------------------------------------
# Compiled calibration program
# ---------------------------------------------------------------------------

def _expand(
    arr: jax.Array, vars_: Tuple[int, ...], clique: Tuple[int, ...], cards
) -> jax.Array:
    """[B, *vars_ shape] -> [B, *clique shape] by inserting size-1 axes."""
    shape = [arr.shape[0]] + [
        cards[v] if v in vars_ else 1 for v in clique
    ]
    # permute arr's var axes into clique order
    pos = {v: k for k, v in enumerate(vars_)}
    perm = [0] + [1 + pos[v] for v in clique if v in pos]
    return jnp.transpose(arr, perm).reshape(shape)


def _marginalize_to(
    pot: jax.Array, clique: Tuple[int, ...], keep: Tuple[int, ...]
) -> jax.Array:
    """Sum a [B, *clique] potential onto the ``keep`` vars (clique order)."""
    axes = tuple(
        1 + k for k, v in enumerate(clique) if v not in keep
    )
    out = jnp.sum(pot, axis=axes) if axes else pot
    return out  # [B, *keep-in-clique-order]


def make_jtree_fn(plan: InferencePlan, cpds: Sequence, k_out: int,
                  tree: JTree):
    """Pure ``fn(params_tuple, packed_in) -> (pmf [B, k_out],)``.

    Same contract as ``make_exact_enum_fn``: ``packed_in`` is the
    (fixed, ev_mask, do_mask, target_idx) tuple from
    ``pack_dynamic_inputs``; pmf rows are unnormalized (caller divides).
    """
    cards = tree.cards
    n = plan.n_nodes
    k_enc = max(k_out, max(cards))

    # Enumerated parent combos per node (for in-graph CPT evaluation).
    combo_digits = []
    for i in range(n):
        pidx = plan.parent_idx[i]
        combo_digits.append(
            _mixed_radix_digits(
                int(np.prod([cards[p] for p in pidx], dtype=np.int64)),
                [cards[p] for p in pidx],
            )
            if pidx
            else None
        )

    m = len(tree.cliques)
    children: List[List[int]] = [[] for _ in range(m)]
    for c, p in enumerate(tree.parent):
        if p >= 0:
            children[p].append(c)

    def fn(params_tuple, packed_in):
        fixed, ev_mask, do_mask, target_idx = packed_in
        b = fixed.shape[0]
        clamped = jnp.maximum(ev_mask, do_mask)  # [B, n]

        # Per-node CPT tables [B, *family] (do() drops the factor per
        # row: replaced by ones) and evidence messages [B, card].
        cpts, msgs = [], []
        for i in range(n):
            cpd, k, pidx = cpds[i], cards[i], plan.parent_idx[i]
            support = cpd.support_values(params_tuple[i])[0][:k]
            if pidx:
                pmat = jnp.stack(
                    [
                        jnp.take(
                            cpds[p].support_values(params_tuple[p])[0][
                                : cards[p]
                            ],
                            jnp.asarray(combo_digits[i][:, j]),
                        )
                        for j, p in enumerate(pidx)
                    ],
                    axis=-1,
                )
            else:
                pmat = None
            probs = cpd.categorical_probs(params_tuple[i], pmat)[..., :k]
            fam_shape = tuple(cards[p] for p in pidx) + (k,)
            probs = jnp.maximum(probs, _EPS).reshape(fam_shape)
            do_col = do_mask[:, i].reshape((b,) + (1,) * len(fam_shape))
            cpts.append(
                jnp.where(do_col > 0.5, 1.0, probs[None])
            )  # [B, *fam_shape]

            col = fixed[:, plan.node_offsets[i]]  # [B]
            cls = jnp.argmin(
                jnp.abs(col[:, None] - support[None, :]), axis=1
            )
            onehot = jax.nn.one_hot(cls, k, dtype=jnp.float32)
            msgs.append(
                jnp.where(
                    clamped[:, i : i + 1] > 0.5, onehot, jnp.ones((b, k))
                )
            )  # [B, k]

        # Clique potentials: assigned CPTs x assigned evidence messages.
        pots = []
        for ci, clique in enumerate(tree.cliques):
            shape = (b,) + tuple(cards[v] for v in clique)
            pot = jnp.ones(shape, jnp.float32)
            for i in range(n):
                if tree.factor_home[i] == ci:
                    fam = tuple(plan.parent_idx[i]) + (i,)
                    pot = pot * _expand(cpts[i], fam, clique, cards)
                if tree.message_home[i] == ci:
                    pot = pot * _expand(msgs[i], (i,), clique, cards)
            pots.append(pot)

        def norm(x):
            axes = tuple(range(1, x.ndim))
            z = jnp.sum(x, axis=axes, keepdims=True)
            return x / jnp.maximum(z, _EPS)

        # Upward (collect) pass: children-first.
        up = [None] * m  # message c -> parent[c], over the separator
        seps = [None] * m
        for c in tree.order:
            p = tree.parent[c]
            if p < 0:
                continue
            sep = tuple(
                v for v in tree.cliques[c] if v in set(tree.cliques[p])
            )
            seps[c] = sep
            pot = pots[c]
            for ch in children[c]:
                pot = pot * _expand(
                    up[ch], seps[ch], tree.cliques[c], cards
                )
            up[c] = norm(_marginalize_to(pot, tree.cliques[c], sep))

        # Downward (distribute) pass: parents-first (reverse order).
        down = [None] * m  # message parent[c] -> c, over seps[c]
        for c in reversed(tree.order):
            p = tree.parent[c]
            if p < 0:
                continue
            pot = pots[p]
            if tree.parent[p] >= 0:
                pot = pot * _expand(
                    down[p], seps[p], tree.cliques[p], cards
                )
            for ch in children[p]:
                if ch != c:
                    pot = pot * _expand(
                        up[ch], seps[ch], tree.cliques[p], cards
                    )
            down[c] = norm(
                _marginalize_to(pot, tree.cliques[p], seps[c])
            )

        # Calibrated beliefs -> per-node marginals [B, n, k_enc].
        beliefs = [None] * m
        for c in range(m):
            pot = pots[c]
            for ch in children[c]:
                pot = pot * _expand(up[ch], seps[ch], tree.cliques[c], cards)
            if tree.parent[c] >= 0:
                pot = pot * _expand(down[c], seps[c], tree.cliques[c], cards)
            beliefs[c] = pot

        node_marg = []
        for i in range(n):
            ci = tree.node_home[i]
            marg = _marginalize_to(beliefs[ci], tree.cliques[ci], (i,))
            marg = marg / jnp.maximum(
                jnp.sum(marg, axis=1, keepdims=True), _EPS
            )
            if cards[i] < k_enc:
                marg = jnp.pad(marg, ((0, 0), (0, k_enc - cards[i])))
            node_marg.append(marg)
        stacked = jnp.stack(node_marg, axis=1)  # [B, n, k_enc]
        tgt = jax.nn.one_hot(target_idx, n, dtype=jnp.float32)
        pmf = jnp.einsum("bnc,bn->bc", stacked, tgt)
        return (pmf[:, :k_out],)

    return fn
