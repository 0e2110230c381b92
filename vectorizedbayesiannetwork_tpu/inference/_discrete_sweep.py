"""Scan-form ancestral sweep for all-categorical networks.

The generic sweep (``_sweep.py``) unrolls one program region per node —
fine to ~400 nodes, but XLA compile time grows linearly and large bnlearn
networks (link: 724 nodes, munin: 1041) pay minutes of compilation. When
every node is a ``categorical_table`` with declared integer supports
(``n_classes`` > 0 and ``parent_n_classes`` declared or root — exactly what
the benchmark backend constructs), the whole DAG collapses into ONE
``lax.scan`` over topological order with stacked, padded CPTs:

  * all node tables concatenated into one ``[total_rows, Cmax]`` log-prob
    matrix with per-node row offsets (padded classes at -inf);
  * per-node parent wiring as ``[N, Pmax]`` index/stride tables;
  * the scan step gathers parent states, computes the mixed-radix row,
    Gumbel-argmax samples, clamps evidence/do, accumulates log-weights.

Compile time becomes O(1) in node count; runtime per step is a handful of
[B, S]-shaped gathers that shard over the ('data','particle') mesh like
everything else. Values stay in class-index space during the scan (the
declared-support precondition makes parent/child index spaces identical)
and are mapped back to float class values at the end, so the function is a
drop-in replacement for ``sweep_trace``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan
from ..parallel.mesh import constrain_bs, constrain_bsd


def discrete_sweep_supported(plan: InferencePlan, cpds: Sequence) -> bool:
    from ..models.categorical_table import CategoricalTableCPD

    for idx, cpd in enumerate(cpds):
        if not isinstance(cpd, CategoricalTableCPD):
            return False
        if cpd.output_dim != 1 or cpd.resolved_classes <= 0:
            return False
        if cpd.n_classes <= 0:
            return False  # inferred class support: index spaces may differ
        if cpd.input_dim > 0 and cpd.parent_n_classes is None:
            return False
        if cpd.parent_cards is None and cpd.input_dim > 0:
            return False
    return True


def _static_tables(plan: InferencePlan, cpds: Sequence):
    """Host-side padded wiring tables (trace-time constants)."""
    n = plan.n_nodes
    cmax = max(cpd.resolved_classes for cpd in cpds)
    pmax = max((len(plan.parent_idx[i]) for i in range(n)), default=0)
    pmax = max(pmax, 1)
    parent_ids = np.zeros((n, pmax), np.int32)
    strides = np.zeros((n, pmax), np.int32)
    row_offset = np.zeros((n,), np.int32)
    cards = np.zeros((n,), np.int32)
    offset = 0
    for i, cpd in enumerate(cpds):
        pidx = plan.parent_idx[i]
        parent_ids[i, : len(pidx)] = pidx
        node_strides = cpd._strides  # mixed-radix strides, parent order
        strides[i, : len(node_strides)] = node_strides
        row_offset[i] = offset
        offset += cpd._parent_states
        cards[i] = cpd.resolved_classes
    return {
        "parent_ids": jnp.asarray(parent_ids),
        "strides": jnp.asarray(strides),
        "row_offset": jnp.asarray(row_offset),
        "cards": jnp.asarray(cards),
        "evidence_mask": jnp.asarray(np.asarray(plan.evidence_mask)),
        "fixed_mask": jnp.asarray(
            np.asarray(
                [plan.is_fixed(i) for i in range(n)], bool
            )
        ),
        "total_rows": offset,
        "cmax": cmax,
    }


def _stacked_log_cpt(cpds: Sequence, params_tuple: Tuple, cmax: int):
    """Concatenate per-node conditional log-prob tables -> [R, Cmax]."""
    blocks = []
    for cpd, params in zip(cpds, params_tuple):
        counts = params["counts"]  # [1, P, C]
        probs = counts[0]
        probs = probs / jnp.maximum(
            jnp.sum(probs, axis=-1, keepdims=True), 1e-12
        )
        lp = jnp.log(jnp.maximum(probs, 1e-12))
        mask = params["class_mask"][0]  # [C]
        lp = jnp.where(mask > 0, lp, -1e30)
        c = lp.shape[-1]
        if c < cmax:
            lp = jnp.concatenate(
                [lp, jnp.full((lp.shape[0], cmax - c), -1e30, lp.dtype)],
                axis=-1,
            )
        blocks.append(lp)
    return jnp.concatenate(blocks, axis=0)


def discrete_sweep_trace(
    plan: InferencePlan,
    cpds: Sequence,
    params_tuple: Tuple,
    key: jax.Array,
    fixed: jax.Array,  # [B, total_dim] float class values
    n_samples: int,
    *,
    weighted: bool = False,
    ev_mask_arr=None,  # [B, N] f32 runtime evidence mask (overrides plan)
    fx_mask_arr=None,  # [B, N] f32 runtime evidence|do mask
    tgt_mask_arr=None,  # [B, N] f32 one-hot target -> extra lp_tgt output
) -> Tuple[jax.Array, ...]:
    """Drop-in scan-form replacement for ``sweep_trace`` (same contract).

    With ``ev_mask_arr``/``fx_mask_arr`` the masks become runtime inputs
    (mask-dynamic programs): the scan step already indexes them
    dynamically, so the compiled program is identical in structure. With
    ``tgt_mask_arr`` a third output accumulates the per-row target node's
    log-density at its final value (mask-dynamic MCM).
    """
    tables = _static_tables(plan, cpds)
    log_cpt = _stacked_log_cpt(cpds, params_tuple, tables["cmax"])
    b = fixed.shape[0]
    s = n_samples
    n = plan.n_nodes
    cmax = tables["cmax"]

    # total_dim == n (all dims are 1); evidence/do values are class indices.
    fixed_idx = jnp.clip(
        jnp.rint(fixed).astype(jnp.int32), 0, tables["cards"][None, :] - 1
    )  # [B, N]

    states0 = jnp.zeros((b, s, n), jnp.int32)
    logw0 = jnp.zeros((b, s), jnp.float32)
    step_keys = jax.random.split(key, n)

    parent_ids = tables["parent_ids"]
    strides = tables["strides"]
    row_offset = tables["row_offset"]
    # Runtime masks are per row ([B, N], heterogeneous fused batches);
    # transpose to [N, B] so the scan step indexes node-major. Plan masks
    # broadcast as [N, 1].
    if ev_mask_arr is None:
        ev_mask = tables["evidence_mask"][:, None]
        fx_mask = tables["fixed_mask"][:, None]
    else:
        ev_mask = (ev_mask_arr > 0).T
        fx_mask = (fx_mask_arr > 0).T
    tg_mask = None if tgt_mask_arr is None else (tgt_mask_arr > 0).T

    # Per-node table lookup strategy: when every node's parent-state count
    # is small, slice the node's table block and contract with a one-hot of
    # the mixed-radix parent index (MXU matmul) instead of a row gather —
    # TPU gathers dominated the scan's steady-state cost.
    pstates_max = max(int(cpd._parent_states) for cpd in cpds)
    use_onehot = pstates_max <= 512
    if use_onehot:
        pad_rows = jnp.full((pstates_max, cmax), -1e30, log_cpt.dtype)
        log_cpt = jnp.concatenate([log_cpt, pad_rows], axis=0)
    # Lane-padding guard (round-2 OOM class, VERDICT.md): any materialized
    # [B, S, cmax] with cmax < 128 tile-pads cmax -> 128 lanes, and the
    # RNG / dot / gather ops below are materialization points. When the
    # padded projection is large, restructure the step as a STATIC loop
    # over classes with [B, S]-shaped operands only (inverse-CDF sampling
    # replaces Gumbel-argmax; per-class selects replace the one-hot dots).
    # VBN_SCAN_CLASS_LOOP=never|always overrides. Measured on v5e at
    # 128 nodes, B=8 x 1M: dense runs 2.0 s/sweep and does NOT
    # materialize the padded intermediates (XLA keeps the scan body
    # fused), while the loop form is select/gather-bound at 5.6 s — so
    # auto prefers dense up to an 8 GiB padded projection and only
    # switches to the loop form beyond the empirically verified regime.
    import os

    _mode = os.environ.get("VBN_SCAN_CLASS_LOOP", "auto").lower()
    class_loop = cmax < 128 and (
        _mode == "always"
        or (_mode != "never" and b * s * 128 * 4 > (8 << 30))
    )
    # Within the class loop the per-row table lookup is a select chain
    # (P ops/class); past this budget, fall back to one gather per class.
    select_rows = class_loop and pstates_max * cmax <= 2048

    def step(carry, inp):
        states, logw, lpt = carry
        i, skey = inp
        pids = jax.lax.dynamic_index_in_dim(parent_ids, i, 0, False)  # [Pmax]
        strd = jax.lax.dynamic_index_in_dim(strides, i, 0, False)
        pmax = parent_ids.shape[1]
        if class_loop:
            # [B, S, Pmax] with Pmax < 128 lane-pads; per-slot [B, S] loop
            pidx = jnp.zeros((b, s), jnp.int32)
            for pslot in range(pmax):
                col = jnp.take(states, pids[pslot], axis=-1)  # [B, S]
                pidx = pidx + col * strd[pslot]
        else:
            pvals = jnp.take(states, pids, axis=-1)  # [B, S, Pmax]
            pidx = jnp.sum(pvals * strd[None, None, :], axis=-1)  # [B, S]
        if class_loop:
            if use_onehot:
                table_i = jax.lax.dynamic_slice(
                    log_cpt, (row_offset[i], 0), (pstates_max, cmax)
                )  # [Pstates, Cmax]

                if select_rows:
                    def lp_col(j):
                        acc = jnp.where(pidx == 0, table_i[0, j], -1e30)
                        for r in range(1, pstates_max):
                            acc = jnp.where(pidx == r, table_i[r, j], acc)
                        return acc  # [B, S]
                else:
                    def lp_col(j):
                        return jnp.take(table_i[:, j], pidx)  # [B, S]
            else:
                rows = row_offset[i] + pidx  # [B, S]

                def lp_col(j):
                    return jnp.take(log_cpt[:, j], rows)  # [B, S]

            lps = [lp_col(j) for j in range(cmax)]
            probs = [jnp.exp(lp) for lp in lps]
            total = probs[0]
            for j in range(1, cmax):
                total = total + probs[j]
            u = jax.random.uniform(skey, (b, s), dtype=jnp.float32)
            thresh = u * total
            cum = probs[0]
            sampled = jnp.zeros((b, s), jnp.int32)
            for j in range(1, cmax):
                sampled = sampled + (cum <= thresh).astype(jnp.int32)
                cum = cum + probs[j]
        else:
            if use_onehot:
                table_i = jax.lax.dynamic_slice(
                    log_cpt, (row_offset[i], 0), (pstates_max, cmax)
                )  # [Pstates, Cmax]
                sel = jax.nn.one_hot(pidx, pstates_max, dtype=log_cpt.dtype)
                logits = jnp.einsum(
                    "bsp,pc->bsc", sel, table_i,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                logits = log_cpt[row_offset[i] + pidx]  # [B, S, Cmax] gather
            g = jax.random.gumbel(skey, (b, s, cmax), dtype=jnp.float32)
            sampled = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
        fixed_i = fixed_idx[:, i][:, None]  # [B, 1]
        fx_i = jax.lax.dynamic_index_in_dim(fx_mask, i, 0, False)  # [B]|[1]
        value = jnp.where(fx_i[:, None], fixed_i, sampled)  # [B, S]
        value = constrain_bs(value)
        states = jax.lax.dynamic_update_index_in_dim(
            states, value, i, axis=-1
        )
        if weighted or tg_mask is not None:
            if class_loop:
                lp_val = jnp.where(value == 0, lps[0], 0.0)
                for j in range(1, cmax):
                    lp_val = lp_val + jnp.where(value == j, lps[j], 0.0)
            else:
                vsel = jax.nn.one_hot(value, cmax, dtype=logits.dtype)
                lp_val = jnp.sum(vsel * logits, axis=-1)
            if weighted:
                ev_i = jax.lax.dynamic_index_in_dim(ev_mask, i, 0, False)
                logw = constrain_bs(
                    logw + jnp.where(ev_i[:, None], lp_val, 0.0)
                )
            if tg_mask is not None:
                tg_i = jax.lax.dynamic_index_in_dim(tg_mask, i, 0, False)
                lpt = constrain_bs(
                    lpt + jnp.where(tg_i[:, None], lp_val, 0.0)
                )
        return (states, logw, lpt), None

    (states, logw, lpt), _ = jax.lax.scan(
        step,
        (states0, logw0, logw0),
        (jnp.arange(n, dtype=jnp.int32), step_keys),
    )
    # index space == value space under the declared-arange-support
    # precondition (class_values[k] == k), so the float cast is the map back.
    packed = constrain_bsd(states.astype(jnp.float32))
    if tg_mask is not None:
        return packed, logw, lpt
    return packed, logw
