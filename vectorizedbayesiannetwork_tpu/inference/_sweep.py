"""The compiled topological sweep — core primitive of inference & sampling.

TPU-first replacement for the reference's per-node Python loops
(``vbn/inference/importance_sampling.py:56-80``,
``vbn/inference/monte_carlo_marginalization.py:60-92``,
``vbn/sampling/ancestral.py:13-41``): the whole topo-order ancestral sweep —
per-node conditional sampling, evidence clamping, and likelihood-weight
accumulation — is traced once per (plan, n_samples) into a single XLA
program. Node values are kept as a list of ``[B, S, D]`` arrays and
concatenated at the end, so XLA sees a pure dataflow graph (no in-place
scatter), fuses each CPD's GEMM+elementwise chain, and shards everything over
the ``(batch, particle)`` mesh axes declared on the inputs.

All structure (topo order, masks, parent wiring) is trace-time constant from
the InferencePlan; batch size B is a traced dimension; particle count S is
static.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.plan import InferencePlan
from ..core.rng import fold
from ..parallel.mesh import constrain_bs, constrain_bsd

_SCAN_THRESHOLD = 64  # nodes; with one-hot table contraction the scan
# matches/beats the unrolled sweep in steady state at >=~150 nodes and
# compiles orders of magnitude faster (BENCH_NOTES.md)


def _use_discrete_scan(n_nodes: int) -> bool:
    import os

    mode = os.environ.get("VBN_DISCRETE_SCAN", "auto").lower()
    if mode == "always":
        return True
    if mode == "never":
        return False
    return n_nodes >= _SCAN_THRESHOLD


def _use_level_grouping() -> bool:
    import os

    return os.environ.get("VBN_LEVEL_GROUP", "auto").lower() != "never"


def _group_sig(cpd) -> tuple:
    """Nodes are stackable when class, dims, and static config all match."""
    return (
        type(cpd),
        cpd.input_dim,
        cpd.output_dim,
        cpd._static_fields(),
    )


def _stack_eval_params(cpds, params_tuple, idxs):
    """Stack the eval-params pytrees of ``idxs`` leaf-by-leaf, or None.

    Returns None when tree structures or leaf shapes/dtypes differ (e.g.
    KDE nodes holding different numbers of support points) — the caller
    then falls back to per-node evaluation.
    """
    trees = [cpds[i]._eval_params(params_tuple[i]) for i in idxs]
    struct0 = jax.tree_util.tree_structure(trees[0])
    if any(
        jax.tree_util.tree_structure(t) != struct0 for t in trees[1:]
    ):
        return None
    leaf_rows = [jax.tree_util.tree_leaves(t) for t in trees]
    for leaves in zip(*leaf_rows):
        a0 = jnp.asarray(leaves[0])
        if any(
            jnp.asarray(a).shape != a0.shape
            or jnp.asarray(a).dtype != a0.dtype
            for a in leaves[1:]
        ):
            return None
    return jax.tree_util.tree_map(
        lambda *ls: jnp.stack([jnp.asarray(a) for a in ls]), *trees
    )


def _parents_flat_from_vals(plan, vals, idx, m):
    pidx = plan.parent_idx[idx]
    if not pidx:
        return None
    parents = jnp.concatenate([vals[p] for p in pidx], axis=-1)
    return parents.reshape(m, -1)


def sweep_trace(
    plan: InferencePlan,
    cpds: Sequence,
    params_tuple: Tuple,
    key: jax.Array,
    fixed: jax.Array,  # [B, total_dim] packed evidence/do values
    n_samples: int,
    *,
    weighted: bool = False,
    skip: frozenset = frozenset(),
) -> Tuple[jax.Array, jax.Array]:
    """Ancestral sweep. Returns (packed [B,S,total_dim], log_weights [B,S]).

    ``log_weights`` accumulates evidence log-likelihoods when ``weighted``
    (likelihood weighting); do-interventions clamp without weight.
    ``skip`` nodes are left at zero (used by Rao-Blackwellization, which
    skips the target and its descendants; skipped nodes are never parents
    of swept nodes by construction).
    """
    if not skip and _use_discrete_scan(plan.n_nodes):
        # All-categorical networks can take the scan-form sweep: one
        # lax.scan over nodes with stacked CPTs -> O(1) compile time in
        # node count (see _discrete_sweep.py). Measured on TPU v5e at 400
        # nodes: ~20x faster compilation AND 1.5x faster steady state than
        # the unrolled sweep (BENCH_NOTES.md). VBN_DISCRETE_SCAN=
        # always|never overrides the node-count heuristic.
        from ._discrete_sweep import (
            discrete_sweep_supported,
            discrete_sweep_trace,
        )

        if discrete_sweep_supported(plan, cpds):
            return discrete_sweep_trace(
                plan, cpds, params_tuple, key, fixed, n_samples,
                weighted=weighted,
            )
        # ... and the linear-Gaussian analogue (bnlearn's "gaussian" class).
        from ._gaussian_sweep import (
            gaussian_sweep_supported,
            gaussian_sweep_trace,
        )

        if gaussian_sweep_supported(plan, cpds):
            return gaussian_sweep_trace(
                plan, cpds, params_tuple, key, fixed, n_samples,
                weighted=weighted,
            )

    b = fixed.shape[0]
    s = n_samples
    m = b * s
    vals: List[Optional[jax.Array]] = [None] * plan.n_nodes
    log_w = jnp.zeros((b, s), dtype=jnp.float32)
    grouping = _use_level_grouping()

    # Level-grouped traversal: nodes within a topological level are
    # conditionally independent given earlier levels, so same-signature
    # nodes (same CPD class / dims / static config) evaluate as ONE
    # vmapped call over stacked params — N small GEMMs become one batched
    # GEMM on the MXU and the trace stays compact on wide levels.
    for level in plan.levels:
        latent_groups: dict = {}
        ev_groups: dict = {}
        for idx in level:
            d = plan.node_dims[idx]
            off = plan.node_offsets[idx]
            if idx in skip:
                vals[idx] = jnp.zeros((b, s, d), jnp.float32)
                continue
            if plan.is_fixed(idx):
                v = jnp.broadcast_to(
                    fixed[:, None, off : off + d], (b, s, d)
                )
                vals[idx] = constrain_bsd(v)
                if weighted and plan.evidence_mask[idx]:
                    ev_groups.setdefault(_group_sig(cpds[idx]), []).append(idx)
            else:
                latent_groups.setdefault(_group_sig(cpds[idx]), []).append(idx)

        for g in latent_groups.values():
            # CPDs whose sample path runs a Pallas kernel with in-kernel
            # PRNG (KDE) opt out of the vmapped group: vmap would alias the
            # per-tile seeding (and SMEM scalar blocks don't batch).
            groupable = getattr(cpds[g[0]], "sample_groupable", True)
            stacked = (
                _stack_eval_params(cpds, params_tuple, g)
                if grouping and groupable and len(g) > 1
                else None
            )
            if stacked is None:
                for idx in g:
                    sub = fold(key, idx)
                    pflat = _parents_flat_from_vals(plan, vals, idx, m)
                    v = cpds[idx]._sample_flat(
                        params_tuple[idx], sub, pflat, m
                    )
                    vals[idx] = constrain_bsd(
                        v.reshape(b, s, plan.node_dims[idx])
                    )
            else:
                cpd0 = cpds[g[0]]
                keys = jnp.stack([fold(key, i) for i in g])
                if cpd0.input_dim > 0:
                    pstack = jnp.stack(
                        [_parents_flat_from_vals(plan, vals, i, m) for i in g]
                    )
                    vstack = jax.vmap(
                        lambda p, k, pf: cpd0._sample_flat(p, k, pf, m)
                    )(stacked, keys, pstack)
                else:
                    vstack = jax.vmap(
                        lambda p, k: cpd0._sample_flat(p, k, None, m)
                    )(stacked, keys)
                for j, idx in enumerate(g):
                    vals[idx] = constrain_bsd(
                        vstack[j].reshape(b, s, plan.node_dims[idx])
                    )

        for g in ev_groups.values():
            stacked = (
                _stack_eval_params(cpds, params_tuple, g)
                if grouping and len(g) > 1
                else None
            )
            if stacked is None:
                for idx in g:
                    pflat = _parents_flat_from_vals(plan, vals, idx, m)
                    x = vals[idx].reshape(m, plan.node_dims[idx])
                    lp = cpds[idx]._log_prob_flat(
                        params_tuple[idx], x, pflat
                    )
                    log_w = constrain_bs(log_w + lp.reshape(b, s))
            else:
                cpd0 = cpds[g[0]]
                xstack = jnp.stack(
                    [vals[i].reshape(m, plan.node_dims[i]) for i in g]
                )
                if cpd0.input_dim > 0:
                    pstack = jnp.stack(
                        [_parents_flat_from_vals(plan, vals, i, m) for i in g]
                    )
                    lp = jax.vmap(cpd0._log_prob_flat)(
                        stacked, xstack, pstack
                    )
                else:
                    lp = jax.vmap(
                        lambda p, x: cpd0._log_prob_flat(p, x, None)
                    )(stacked, xstack)
                log_w = constrain_bs(log_w + lp.sum(axis=0).reshape(b, s))

    packed = jnp.concatenate(vals, axis=-1)
    return constrain_bsd(packed), log_w


def target_parents_flat(
    plan: InferencePlan, packed: jax.Array, idx: int
) -> Optional[jax.Array]:
    """Extract node ``idx``'s parent tensor [B*S, Din] from the packed sweep."""
    pidx = plan.parent_idx[idx]
    if not pidx:
        return None
    b, s, _ = packed.shape
    cols = [
        packed[..., plan.node_offsets[p] : plan.node_offsets[p] + plan.node_dims[p]]
        for p in pidx
    ]
    return jnp.concatenate(cols, axis=-1).reshape(b * s, -1)


def node_values(plan: InferencePlan, packed: jax.Array, idx: int) -> jax.Array:
    off = plan.node_offsets[idx]
    return packed[..., off : off + plan.node_dims[idx]]


def target_log_prob(
    plan: InferencePlan,
    cpds: Sequence,
    params_tuple: Tuple,
    packed: jax.Array,
) -> jax.Array:
    """log p(target_value | parents) over the packed sweep -> [B, S]."""
    t = plan.target_idx
    b, s, _ = packed.shape
    x_flat = node_values(plan, packed, t).reshape(b * s, plan.node_dims[t])
    pflat = target_parents_flat(plan, packed, t)
    lp = cpds[t]._log_prob_flat(params_tuple[t], x_flat, pflat)
    return lp.reshape(b, s)
