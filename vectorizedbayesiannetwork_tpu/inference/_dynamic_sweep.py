"""Mask-dynamic ancestral sweep: ONE compiled program per network.

The static sweep (``_sweep.py``) specializes each program on the query's
evidence/do masks and target — ideal when query shapes repeat (serving),
but a benchmark-style workload with PAC-diverse evidence sets compiles a
fresh program per skeleton (measured 2-4 s/query through the remote-compile
tunnel, ``benchmarking/`` report). This variant moves ALL query structure
to runtime inputs:

- ``ev_mask``/``do_mask`` [n_nodes] f32: every node computes BOTH its
  conditional sample and its log-density at the packed fixed value, then
  selects by mask — branchless, ~1.5-2x the static sweep's FLOPs, one
  compile for every evidence pattern.
- ``target_idx`` scalar: the target block is pulled out of the packed
  [B, S, total_dim] tensor with a one-hot contraction built from the
  plan's static offset/dim tables.

Draw parity: latent nodes fold the same per-node subkeys as the static
sweep, so for matching (B, S) the latent draws are bit-identical to the
static program's.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan
from ..core.rng import fold
from ..parallel.mesh import constrain_bs, constrain_bsd


def dynamic_sweep_trace(
    plan: InferencePlan,
    cpds: Sequence,
    params_tuple: Tuple,
    key: jax.Array,
    fixed: jax.Array,  # [B, total_dim] packed evidence/do values
    ev_mask: jax.Array,  # [B, n_nodes] f32 (1 = evidence: clamp + weight)
    do_mask: jax.Array,  # [B, n_nodes] f32 (1 = do: clamp, no weight)
    n_samples: int,
    *,
    tgt_mask: jax.Array = None,  # [B, n_nodes] f32 one-hot of target
) -> Tuple[jax.Array, ...]:
    """Returns (packed [B,S,total_dim], log_weights [B,S]).

    Masks are PER ROW, so one dispatch can mix arbitrary query skeletons
    (heterogeneous fused batches). With ``tgt_mask`` a third output is
    appended: the per-row TARGET node's log-density at its final
    (sampled-or-clamped) value, [B, S] — what Monte-Carlo marginalization
    exponentiates as its pdf.
    """
    from ._sweep import _use_discrete_scan

    if _use_discrete_scan(plan.n_nodes):
        # Scan-form sweeps index their mask tables dynamically already, so
        # the mask-dynamic variants are the SAME compiled structure — one
        # O(1)-compile program covering a 1000-node network AND every
        # evidence pattern on it.
        from ._discrete_sweep import (
            discrete_sweep_supported,
            discrete_sweep_trace,
        )

        fx = jnp.maximum(ev_mask, do_mask)
        if discrete_sweep_supported(plan, cpds):
            return discrete_sweep_trace(
                plan, cpds, params_tuple, key, fixed, n_samples,
                weighted=True, ev_mask_arr=ev_mask, fx_mask_arr=fx,
                tgt_mask_arr=tgt_mask,
            )
        from ._gaussian_sweep import (
            gaussian_sweep_supported,
            gaussian_sweep_trace,
        )

        if gaussian_sweep_supported(plan, cpds):
            return gaussian_sweep_trace(
                plan, cpds, params_tuple, key, fixed, n_samples,
                weighted=True, ev_mask_arr=ev_mask, fx_mask_arr=fx,
                tgt_mask_arr=tgt_mask,
            )
    b = fixed.shape[0]
    s = n_samples
    m = b * s
    vals = [None] * plan.n_nodes
    log_w = jnp.zeros((b, s), jnp.float32)
    lp_tgt = jnp.zeros((b, s), jnp.float32)
    for idx in range(plan.n_nodes):
        d = plan.node_dims[idx]
        off = plan.node_offsets[idx]
        pidx = plan.parent_idx[idx]
        if pidx:
            parents = jnp.concatenate([vals[p] for p in pidx], axis=-1)
            pflat = parents.reshape(m, -1)
        else:
            pflat = None
        sampled = cpds[idx]._sample_flat(
            params_tuple[idx], fold(key, idx), pflat, m
        ).reshape(b, s, d)
        fixed_b = jnp.broadcast_to(fixed[:, None, off : off + d], (b, s, d))
        m_fix = jnp.maximum(ev_mask[:, idx], do_mask[:, idx])  # [B]
        v = jnp.where(m_fix[:, None, None] > 0, fixed_b, sampled)
        vals[idx] = constrain_bsd(v)
        lp = cpds[idx]._log_prob_flat(
            params_tuple[idx], v.reshape(m, d), pflat
        ).reshape(b, s)
        # where, not multiply: 0 * (-inf) would poison the weights.
        log_w = log_w + jnp.where(ev_mask[:, idx][:, None] > 0, lp, 0.0)
        if tgt_mask is not None:
            lp_tgt = lp_tgt + jnp.where(tgt_mask[:, idx][:, None] > 0, lp, 0.0)
    packed = jnp.concatenate(vals, axis=-1)
    if tgt_mask is not None:
        return packed, constrain_bs(log_w), constrain_bs(lp_tgt)
    return packed, constrain_bs(log_w)


def dynamic_target_values(
    plan: InferencePlan, packed: jax.Array, target_idx: jax.Array
) -> jax.Array:
    """packed [B,S,total] -> each row's target block, [B, S, max_dim].

    ``target_idx`` is PER ROW [B] (heterogeneous fused batches). One-hot
    contraction from the plan's static offset/dim tables; columns beyond
    a row's true target dim are zero (the caller slices host-side).
    """
    offs = jnp.asarray(np.array(plan.node_offsets, np.int32))
    dims = jnp.asarray(np.array(plan.node_dims, np.int32))
    t_off = offs[target_idx]  # [B]
    t_dim = dims[target_idx]  # [B]
    max_d = int(max(plan.node_dims))
    total = plan.total_dim
    iota_t = jnp.arange(total, dtype=jnp.int32)[None, :, None]
    iota_m = jnp.arange(max_d, dtype=jnp.int32)[None, None, :]
    sel = jnp.logical_and(
        iota_t == t_off[:, None, None] + iota_m,
        iota_m < t_dim[:, None, None],
    ).astype(packed.dtype)  # [B, total, max_d]
    return jnp.einsum(
        "bst,btm->bsm", packed, sel,
        precision=jax.lax.Precision.HIGHEST,
    )
