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
    vals: List[Optional[jax.Array]] = [None] * plan.n_nodes
    log_w = jnp.zeros((b, s), dtype=jnp.float32)

    for idx in range(plan.n_nodes):
        d = plan.node_dims[idx]
        off = plan.node_offsets[idx]
        if idx in skip:
            vals[idx] = jnp.zeros((b, s, d), jnp.float32)
            continue
        pidx = plan.parent_idx[idx]
        if pidx:
            parents = jnp.concatenate([vals[p] for p in pidx], axis=-1)
            pflat = parents.reshape(b * s, -1)
        else:
            pflat = None

        if plan.is_fixed(idx):
            v = jnp.broadcast_to(fixed[:, None, off : off + d], (b, s, d))
            vals[idx] = constrain_bsd(v)
            if weighted and plan.evidence_mask[idx]:
                lp = cpds[idx]._log_prob_flat(
                    params_tuple[idx], v.reshape(b * s, d), pflat
                )
                log_w = constrain_bs(log_w + lp.reshape(b, s))
        else:
            sub = fold(key, idx)
            v = cpds[idx]._sample_flat(params_tuple[idx], sub, pflat, b * s)
            vals[idx] = constrain_bsd(v.reshape(b, s, d))

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
