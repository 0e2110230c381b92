"""Scan-form ancestral sweep for all-linear-Gaussian networks.

The Gaussian counterpart of ``_discrete_sweep.py``: when every node is a
``linear_gaussian`` with output_dim 1 (the bnlearn "gaussian" network
class — magic-niab, arth150, ecoli70, ...), the whole DAG becomes ONE
``lax.scan`` over topological order with stacked padded weights:

  * per-node weights padded to ``[N, Pmax]`` (absent parents weighted 0);
  * the scan step gathers parent states, computes ``loc = w·parents + b``,
    draws the Gaussian, clamps evidence/do, accumulates log-weights.

Compile time is O(1) in node count; the state matrix [B, S, N] shards over
the ('data','particle') mesh like everything else.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan
from ..ops.gauss import LOG_2PI
from ..parallel.mesh import constrain_bs, constrain_bsd


def gaussian_sweep_supported(plan: InferencePlan, cpds: Sequence) -> bool:
    from ..models.linear_gaussian import LinearGaussianCPD

    return all(
        isinstance(cpd, LinearGaussianCPD) and cpd.output_dim == 1
        for cpd in cpds
    )


def gaussian_sweep_trace(
    plan: InferencePlan,
    cpds: Sequence,
    params_tuple: Tuple,
    key: jax.Array,
    fixed: jax.Array,  # [B, total_dim]
    n_samples: int,
    *,
    weighted: bool = False,
    ev_mask_arr=None,  # [B, N] f32 runtime evidence mask (overrides plan)
    fx_mask_arr=None,  # [B, N] f32 runtime evidence|do mask
    tgt_mask_arr=None,  # [B, N] f32 one-hot target -> extra lp_tgt output
) -> Tuple[jax.Array, ...]:
    """Drop-in scan-form replacement for ``sweep_trace`` (same contract).

    With ``ev_mask_arr``/``fx_mask_arr`` the masks become runtime inputs
    (mask-dynamic programs). With ``tgt_mask_arr`` a third output
    accumulates the per-row target node's log-density at its final value
    (mask-dynamic MCM).
    """
    n = plan.n_nodes
    b = fixed.shape[0]
    s = n_samples
    pmax = max((len(plan.parent_idx[i]) for i in range(n)), default=0)
    pmax = max(pmax, 1)

    parent_ids = np.zeros((n, pmax), np.int32)
    pmask = np.zeros((n, pmax), np.float32)
    for i in range(n):
        pidx = plan.parent_idx[i]
        parent_ids[i, : len(pidx)] = pidx
        pmask[i, : len(pidx)] = 1.0
    parent_ids = jnp.asarray(parent_ids)
    pmask = jnp.asarray(pmask)
    if ev_mask_arr is not None:
        ev_mask = (ev_mask_arr > 0).T  # [N, B] node-major for the scan
    else:
        ev_mask = jnp.asarray(np.asarray(plan.evidence_mask))[:, None]
    if fx_mask_arr is not None:
        fx_mask = (fx_mask_arr > 0).T
    else:
        fx_mask = jnp.asarray(
            np.asarray([plan.is_fixed(i) for i in range(n)], bool)
        )[:, None]
    tg_mask = None if tgt_mask_arr is None else (tgt_mask_arr > 0).T

    # Stacked padded parameters (trace-time pytree ops on device).
    w_rows = []
    biases = []
    scales = []
    for i, cpd in enumerate(cpds):
        w = params_tuple[i]["weight"][:, 0]  # [Din]
        w_rows.append(
            jnp.concatenate(
                [w, jnp.zeros((pmax - w.shape[0],), w.dtype)]
            )
        )
        biases.append(params_tuple[i]["bias"][0])
        scales.append(
            jnp.sqrt(
                jnp.maximum(params_tuple[i]["var"][0], cpd.min_scale**2)
            )
        )
    weights = jnp.stack(w_rows)  # [N, Pmax]
    bias = jnp.stack(biases)  # [N]
    scale = jnp.stack(scales)  # [N]

    states0 = jnp.zeros((b, s, n), jnp.float32)
    logw0 = jnp.zeros((b, s), jnp.float32)
    eps = jax.random.normal(key, (b, s, n), jnp.float32)

    def step(carry, inp):
        states, logw, lpt = carry
        i, eps_i = inp  # eps_i [B, S]
        pids = jax.lax.dynamic_index_in_dim(parent_ids, i, 0, False)
        w_i = jax.lax.dynamic_index_in_dim(weights, i, 0, False)  # [Pmax]
        pm_i = jax.lax.dynamic_index_in_dim(pmask, i, 0, False)
        pvals = jnp.take(states, pids, axis=-1)  # [B, S, Pmax]
        loc = jnp.sum(pvals * (w_i * pm_i)[None, None, :], axis=-1) + bias[i]
        sampled = loc + scale[i] * eps_i
        fixed_i = fixed[:, i][:, None]  # [B, 1] (node offsets == index)
        value = jnp.where(fx_mask[i][:, None], fixed_i, sampled)
        value = constrain_bs(value)
        states = jax.lax.dynamic_update_index_in_dim(
            states, value, i, axis=-1
        )
        if weighted or tg_mask is not None:
            z = (value - loc) / scale[i]
            lp = -0.5 * (z * z + LOG_2PI) - jnp.log(scale[i])
            if weighted:
                logw = constrain_bs(
                    logw + jnp.where(ev_mask[i][:, None], lp, 0.0)
                )
            if tg_mask is not None:
                tg_i = jax.lax.dynamic_index_in_dim(tg_mask, i, 0, False)
                lpt = constrain_bs(
                    lpt + jnp.where(tg_i[:, None], lp, 0.0)
                )
        return (states, logw, lpt), None

    (states, logw, lpt), _ = jax.lax.scan(
        step,
        (states0, logw0, logw0),
        (jnp.arange(n, dtype=jnp.int32), jnp.moveaxis(eps, -1, 0)),
    )
    if tg_mask is not None:
        return constrain_bsd(states), logw, lpt
    return constrain_bsd(states), logw
