"""Scan-form fused categorical sweep: mask-dynamic, O(1) compile in N.

The unrolled fused kernel (``sweep_pallas.py``) emits one program region
per node, so Mosaic compile time grows linearly with the network —
measured ~70 s at 76 nodes — which is why its gate stops at
``_MAX_NODES = 80`` and link/munin-scale networks (724/1041 nodes) fall
back to the XLA ``lax.scan`` sweep (``inference/_discrete_sweep.py``).
That scan path is correct but pays per-step HBM traffic on the packed
[B, S, N] state and per-step gather/dynamic-slice overhead: 36.5 /
71.6 ms per query at 724 / 1041 nodes (BENCH_NOTES r4).

This kernel drives the SAME topological sweep from per-node metadata
arrays instead of unrolled program text, so ONE ``lax.fori_loop`` body
serves any network:

- the flat CPT table (all nodes' counts, row-major ``[rows_i, card_i]``
  blocks concatenated) rides in SMEM — counts are read as SCALARS on the
  scalar core while the VPU does the per-particle masked selects, so the
  per-row class walk costs ~one vector op per CPT entry;
- node metadata (entry offsets, row/class counts, parent ids, mixed-radix
  strides) are SMEM scalar-prefetch arrays indexed by the loop counter;
- per-node values live in a VMEM scratch ``[N, TM, 128]`` indexed
  dynamically (parents read back by node id);
- evidence/do masks, clamped values, and the per-row target index are
  RUNTIME inputs packed into one ``[B, N]`` i32 prefetch array — the
  kernel is mask-dynamic: one compile per network serves every evidence
  pattern, the Pallas analogue of ``_dynamic_sweep.dynamic_sweep_trace``;
- outputs follow the unrolled kernel's ``want`` contract exactly
  (streamed log-weights / target values / target log-density, or
  in-kernel pmf/moment reductions with the flash-softmax tile combine),
  and the inverse-CDF class walk reproduces the unrolled kernel's draws
  BIT-EXACTLY given the same uniforms (pinned in
  ``tests/test_sweep_scan_pallas.py``).

Reference semantics served: the mask-dynamic likelihood-weighting /
Monte-Carlo-marginalization sweeps
(``/root/reference/vbn/inference/likelihood_weighting.py:11-82``,
``/root/reference/vbn/inference/monte_carlo_marginalization.py:60-92``)
over ``categorical_table`` CPDs
(``/root/reference/vbn/cpds/categorical_table.py:23-417``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep_pallas import (
    _LANE,
    _combine_reduction,
    _gate_log,
    _parse_want,
    _reduction_tile,
    _uniform_from_bits,
    sweep_pallas_available,
)

# Class walk budget per row. The walk itself is a fori_loop (O(card)
# scalar-core work, any card), so the binding limits are (a) the pmf
# reduction histogram, one lane per class (128 lanes), and (b) compile
# time of the _reduction_tile unroll. 128 admits the reference corpus's
# high-cardinality class — barley (card 67), pathfinder (63), mildew
# (100, table-size-gated to the XLA path instead: 540k CPT entries
# cannot fit SMEM; see scan_sweep_reason's budget check).
_MAX_C = 128
_MAX_NODES = 1500  # VMEM value scratch: N * 8 * 128 * 4 B <= ~6 MB
# v5e SMEM is 1.00 MB; all prefetch operands are 1D (2D SMEM arrays
# pad the minor dim to 128 words), so usage is the exact byte sum —
# budget leaves ~124 KB for the compiler's own scalar state
_SMEM_BUDGET = 900 * 1024  # bytes
_EV_BIT = 1 << 16
_DO_BIT = 1 << 17

import os as _os_mod

# Trace-time probe flag (see the branchless block in _scan_kernel).
_BRANCHLESS = _os_mod.environ.get("VBN_SCAN_BRANCHLESS", "0") == "1"

# Gather-form inner loop (VBN_SCAN_GATHER=1 enables; default OFF).
# Probe result (round 5, v5e, 724n/4096 particles): 0.299 ms/query vs
# the row loop's 0.259 — the hypothesis that per-particle lane gathers
# (O(card) vector ops via the merge kernel's take_along_axis pattern,
# VMEM-resident 128-aligned table) beat the masked row walk FAILED at
# link-scale fan-ins: average parent-state counts are small (~6 rows),
# so ~8 gathers x ~15 cycles + the per-node window slice cost as much
# as the walk they replace. Kept behind the flag (bit-identical draws,
# covered by the kernel test suite under both settings) for nets with
# genuinely large parent-state counts.
_GATHER = _os_mod.environ.get("VBN_SCAN_GATHER", "0") == "1"
_GATHER_ENTRIES = 2 * 128  # two-vreg window per node


def scan_sweep_reason(plan, cpds, n_samples: int):
    """None when the scan-form kernel applies, else the failing condition."""
    from ..models.categorical_table import CategoricalTableCPD

    if plan.n_nodes > _MAX_NODES:
        return f"n_nodes {plan.n_nodes} > {_MAX_NODES}"
    if n_samples % 1024 != 0:
        return f"n_samples {n_samples} not a multiple of 1024"
    total_entries = 0
    for i, cpd in enumerate(cpds):
        name = plan.topo_order[i]
        if not isinstance(cpd, CategoricalTableCPD):
            return f"node {name!r} is {type(cpd).__name__}, not categorical_table"
        if cpd.output_dim != 1:
            return f"node {name!r} has output_dim {cpd.output_dim} != 1"
        if cpd.n_classes <= 0:
            return f"node {name!r} lacks a declared class support"
        if cpd.input_dim > 0 and cpd.parent_n_classes is None:
            return f"node {name!r} lacks declared parent_n_classes"
        if cpd.input_dim > 0 and cpd.parent_cards is None:
            return f"node {name!r} is not fitted yet"
        c = cpd.resolved_classes
        if not 1 <= c <= _MAX_C:
            return f"node {name!r} has {c} classes > {_MAX_C}"
        total_entries += int(cpd._parent_states) * c
    # flat table + per-node meta must fit the SMEM prefetch budget
    # alongside the [B, N] packed query rows (checked per batch at trace
    # time by scan_batch_fits).
    meta_bytes = _meta_bytes(plan)
    if total_entries * 4 + meta_bytes > _SMEM_BUDGET // 2:
        return (
            f"flat CPT table {total_entries} entries exceeds the SMEM "
            f"budget ({_SMEM_BUDGET // 2} B for table+meta)"
        )
    return None


def scan_sweep_supported(plan, cpds, n_samples: int) -> bool:
    return scan_sweep_reason(plan, cpds, n_samples) is None


def _meta_bytes(plan) -> int:
    """Exact per-node SMEM metadata footprint: eoff/rows/cards (3 words)
    plus pids/strides (2*pmax words each node), 4 B words — matching the
    prefetch operands `_scan_structure` actually builds (a fixed 16-word
    estimate under-counted whenever max in-degree > 6)."""
    pmax = max(max((len(p) for p in plan.parent_idx), default=0), 1)
    return (3 + 2 * pmax) * plan.n_nodes * 4


def _table_bytes(plan, cpds) -> int:
    entries = sum(
        int(c._parent_states) * int(c.resolved_classes) for c in cpds
    )
    return entries * 4 + _meta_bytes(plan)


def scan_batch_fits(plan, batch: int, cpds=None) -> bool:
    """Trace-time check that the per-row query prefetch fits SMEM
    alongside the network tables (family-aware: categorical packs one
    [N*B] i32 row table; LG packs f32 values + i32 flags). Without
    ``cpds``, half the budget is assumed spoken for."""
    n = plan.n_nodes
    if cpds is None:
        return n * batch * 4 + batch * 4 + _SMEM_BUDGET // 2 <= _SMEM_BUDGET
    from ..models.linear_gaussian import LinearGaussianCPD

    if all(isinstance(c, LinearGaussianCPD) for c in cpds):
        dmax = max((len(p) for p in plan.parent_idx), default=0)
        return lg_scan_batch_fits(plan, batch, max(dmax, 1))
    from ..models.categorical_table import CategoricalTableCPD

    if not all(isinstance(c, CategoricalTableCPD) for c in cpds):
        return False
    used = _table_bytes(plan, cpds)
    return n * batch * 4 + batch * 4 + used <= _SMEM_BUDGET


def _scan_structure(plan, cpds):
    """Host-side metadata arrays (numpy; become SMEM prefetch operands)."""
    n = plan.n_nodes
    pmax = max((len(p) for p in plan.parent_idx), default=0)
    pmax = max(pmax, 1)
    eoff = np.zeros((n,), np.int32)
    rows = np.zeros((n,), np.int32)
    cards = np.zeros((n,), np.int32)
    pids = np.zeros((n, pmax), np.int32)
    strides = np.zeros((n, pmax), np.int32)
    at = 0
    for i, cpd in enumerate(cpds):
        eoff[i] = at
        rows[i] = int(cpd._parent_states)
        cards[i] = int(cpd.resolved_classes)
        at += rows[i] * cards[i]
        p = plan.parent_idx[i]
        pids[i, : len(p)] = p
        strides[i, : len(p)] = [int(s) for s in cpd._strides]
    return eoff, rows, cards, pids, strides, int(at), int(pmax)


def _flat_counts(cpds, params_tuple):
    """All nodes' count tables, row-major, concatenated flat [E + 8].

    The trailing zero pad keeps the kernel's statically-unrolled class
    loops (masked reads up to ``cmax`` per row) inside the buffer on the
    last row of the last node."""
    return jnp.concatenate(
        [p["counts"][0].reshape(-1) for p in params_tuple]
        + [jnp.zeros((8,), jnp.float32)]
    ).astype(jnp.float32)


def _scan_kernel(
    seed_ref,  # SMEM [1] i32
    packed_ref,  # SMEM [N * B] i32: fixed value | ev<<16 | do<<17
    #            (flat: SMEM pads a 2D array's minor dim to 128 words,
    #             which inflated [N, pmax] wiring tables 40x — measured
    #             'Used 1.12M of 1.00M smem' at 724 nodes. 1D arrays
    #             allocate exactly.)
    tgt_ref,  # SMEM [B] i32 per-row target node index
    eoff_ref,  # SMEM [N] i32 flat-table entry offsets
    rows_ref,  # SMEM [N] i32 parent-state counts
    card_ref,  # SMEM [N] i32 class counts
    pids_ref,  # SMEM [N * pmax] i32 parent node ids (0-padded)
    strides_ref,  # SMEM [N * pmax] i32 mixed-radix strides (0-padded)
    tbl_ref,  # SMEM [E] f32 flat CPT counts
    aoff_ref,  # SMEM [N] i32 128-aligned table row offsets (gather mode)
    smap_ref,  # SMEM [N] i32 value-scratch slot per node (leaves -> trash
    #            slot: nodes never read back do not consume VMEM scratch,
    #            which is what caps the particle tile TM)
    u_ref,  # VMEM [1, N * TM, 128] f32 external uniforms, or dummy
    tblv_ref,  # VMEM [R, 128] f32 128-aligned CPT table (gather mode)
    *rest,  # [logw?] + [tgt?] + [lpt?] [1, TM, 128] + [red?] [1,1,8,128]
    #        + the [N, TM, 128] i32 VMEM value scratch (always last)
    n_nodes: int,
    n_rows_b: int,
    pmax: int,
    cmax: int,
    tm: int,
    external_u: bool,
    want_logw: bool,
    want_tgt: bool,
    want_lpt: bool,
    red_kind,
    red_src,
    gather: bool = False,
):
    *out_refs, vals_ref = rest
    b = pl.program_id(0)
    st = pl.program_id(1)
    if not external_u:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + st)
    ti = tgt_ref[b]
    need_logw = want_logw or red_src == "logw"
    need_lpt = want_lpt or red_src == "lpt"

    def node_body(i, carry):
        logw, lpt, tval = carry
        packed = packed_ref[i * n_rows_b + b]
        fixed_v = packed & 0xFFFF
        evm = (packed >> 16) & 1
        fxm = (packed >> 16) & 3  # ev | do, nonzero when clamped
        card = card_ref[i]
        rows = rows_ref[i]
        eoff = eoff_ref[i]

        # mixed-radix parent row index; padded slots have stride 0 (and
        # pid 0 — a garbage read times 0 is 0, so roots cost nothing)
        pidx = jnp.zeros((tm, _LANE), jnp.int32)
        for k in range(pmax):
            pidx = pidx + (
                vals_ref[pids_ref[i * pmax + k]]
                * strides_ref[i * pmax + k]
            )

        # one uniform field per node regardless of masks: the PRNG
        # stream stays mask-independent, so a given (seed, b, st) yields
        # the same draws under every evidence pattern
        if external_u:
            u = u_ref[0, pl.ds(i * tm, tm), :]
        else:
            u = _uniform_from_bits((tm, _LANE))

        if gather:
            # Gather-form inner loop (see the _GATHER note): each
            # particle reads ITS row's entries from a two-vreg window of
            # the 128-aligned VMEM table — no parent-state row loop.
            win = tblv_ref[pl.ds(aoff_ref[i], 2), :]  # [2, 128]
            w0 = jnp.broadcast_to(win[0:1], (tm, _LANE))
            w1 = jnp.broadcast_to(win[1:2], (tm, _LANE))

            def entry(eidx):
                """table[eidx] per particle, eidx [TM, 128] i32 < 256."""
                i0 = jnp.minimum(eidx, _LANE - 1)
                i1 = jnp.clip(eidx - _LANE, 0, _LANE - 1)
                g0 = jnp.take_along_axis(
                    w0, i0, axis=1, mode="promise_in_bounds"
                )
                g1 = jnp.take_along_axis(
                    w1, i1, axis=1, mode="promise_in_bounds"
                )
                return jnp.where(eidx < _LANE, g0, g1)

            base_v = pidx * card
            cnts = []
            total_v = jnp.zeros((tm, _LANE), jnp.float32)
            for j in range(cmax):
                c_j = jnp.where(j < card, entry(base_v + j), 0.0)
                cnts.append(c_j)
                total_v = total_v + c_j

            def g_fixed():
                cnt_f = entry(base_v + fixed_v)
                ratio = cnt_f / jnp.maximum(total_v, 1e-12)
                return (
                    jnp.full((tm, _LANE), fixed_v, jnp.int32),
                    jnp.log(jnp.maximum(ratio, 1e-12)),
                )

            def g_latent():
                thresh = u * total_v
                cum = jnp.zeros((tm, _LANE), jnp.float32)
                val_r = jnp.zeros((tm, _LANE), jnp.int32)
                for j in range(cmax - 1):
                    cum = cum + cnts[j]
                    val_r = val_r + jnp.where(
                        j < card - 1,
                        (cum <= thresh).astype(jnp.int32),
                        0,
                    )
                return val_r, jnp.zeros((tm, _LANE), jnp.float32)

            val, lp = jax.lax.cond(fxm > 0, g_fixed, g_latent)
            vals_ref[smap_ref[i]] = val
            tval = jnp.where(i == ti, val, tval)
            if need_logw:
                logw = logw + evm.astype(jnp.float32) * lp
            if need_lpt:

                def g_lp_sampled():
                    cnt_v = entry(base_v + val)
                    ratio = cnt_v / jnp.maximum(total_v, 1e-12)
                    return jnp.log(jnp.maximum(ratio, 1e-12))

                lp_t = jax.lax.cond(
                    (i == ti) & (fxm == 0), g_lp_sampled, lambda: lp
                )
                lpt = jnp.where(i == ti, lp_t, lpt)
            return logw, lpt, tval

        # class loops unroll statically up to cmax (masked scalar
        # reads ride the table's zero pad) when the net's class counts
        # are small — killing the inner fori overhead, which dominates
        # at 2-4 classes; larger supports keep the dynamic loops
        unroll = cmax <= 8

        def _row_total(base):
            if unroll:
                t = 0.0
                for j in range(cmax):
                    t = t + jnp.where(j < card, tbl_ref[base + j], 0.0)
                return t
            return jax.lax.fori_loop(
                0, card, lambda j, t: t + tbl_ref[base + j], 0.0
            )

        def fixed_branch():
            # per-row SCALAR total + count at the clamped class; one
            # masked vector select per row
            def row_body(r, lp_acc):
                m = pidx == r
                base = eoff + r * card
                total_s = _row_total(base)
                cnt_s = tbl_ref[base + fixed_v]
                ratio = cnt_s / jnp.maximum(total_s, 1e-12)
                lp_r = jnp.log(
                    jnp.maximum(jnp.full((tm, _LANE), ratio), 1e-12)
                )
                return jnp.where(m, lp_r, lp_acc)

            lp = jax.lax.fori_loop(
                0, rows, row_body, jnp.zeros((tm, _LANE), jnp.float32)
            )
            return jnp.full((tm, _LANE), fixed_v, jnp.int32), lp

        def latent_branch():
            # inverse-CDF class walk with SCALAR row totals/cums: the
            # scalar core streams the row's counts while the VPU does one
            # compare+add per class — ~1 vector op per CPT entry, the
            # same draw semantics (and bits) as the unrolled kernel
            def row_body(r, val):
                m = pidx == r
                base = eoff + r * card
                total_s = _row_total(base)
                thresh = u * total_s

                if unroll:
                    val_r = jnp.zeros((tm, _LANE), jnp.int32)
                    cum_s = 0.0
                    for j in range(cmax - 1):
                        cum_s = cum_s + jnp.where(
                            j < card, tbl_ref[base + j], 0.0
                        )
                        val_r = val_r + jnp.where(
                            j < card - 1,
                            (cum_s <= thresh).astype(jnp.int32),
                            0,
                        )
                else:
                    def cls_walk(j, c):
                        v, cum = c
                        cum = cum + tbl_ref[base + j]
                        v = v + (cum <= thresh).astype(jnp.int32)
                        return v, cum

                    val_r, _ = jax.lax.fori_loop(
                        0, card - 1, cls_walk,
                        (jnp.zeros((tm, _LANE), jnp.int32), 0.0),
                    )
                return jnp.where(m, val_r, val)

            val = jax.lax.fori_loop(
                0, rows, row_body, jnp.zeros((tm, _LANE), jnp.int32)
            )
            return val, jnp.zeros((tm, _LANE), jnp.float32)

        if _BRANCHLESS:
            # ONE shared row loop (VBN_SCAN_BRANCHLESS=1): the fixed and
            # latent paths share the dominant per-entry cost
            # (_row_total) and a handful of selects replace the per-node
            # lax.cond — probing whether Mosaic's branch overhead is
            # part of the kernel's ~150-scalar-ops/node floor (round-5
            # roofline). Draw bits are IDENTICAL to the branched form
            # (same uniforms, same walk arithmetic). Read at trace time;
            # use a fresh process per setting.
            fmask = jnp.full((tm, _LANE), fxm > 0)

            def row_both(r, carry):
                val, lp = carry
                m = pidx == r
                base = eoff + r * card
                total_s = _row_total(base)
                cnt_s = tbl_ref[base + fixed_v]
                ratio = cnt_s / jnp.maximum(total_s, 1e-12)
                lp_r = jnp.log(
                    jnp.maximum(jnp.full((tm, _LANE), ratio), 1e-12)
                )
                lp = jnp.where(m & fmask, lp_r, lp)
                thresh = u * total_s
                if unroll:
                    val_r = jnp.zeros((tm, _LANE), jnp.int32)
                    cum_s = 0.0
                    for j in range(cmax - 1):
                        cum_s = cum_s + jnp.where(
                            j < card, tbl_ref[base + j], 0.0
                        )
                        val_r = val_r + jnp.where(
                            j < card - 1,
                            (cum_s <= thresh).astype(jnp.int32),
                            0,
                        )
                else:
                    def cls_walk(j, c):
                        v, cum = c
                        cum = cum + tbl_ref[base + j]
                        v = v + (cum <= thresh).astype(jnp.int32)
                        return v, cum

                    val_r, _ = jax.lax.fori_loop(
                        0, card - 1, cls_walk,
                        (jnp.zeros((tm, _LANE), jnp.int32), 0.0),
                    )
                val_sel = jnp.where(
                    fmask,
                    jnp.full((tm, _LANE), fixed_v, jnp.int32),
                    val_r,
                )
                val = jnp.where(m, val_sel, val)
                return val, lp

            val, lp = jax.lax.fori_loop(
                0, rows, row_both,
                (
                    jnp.zeros((tm, _LANE), jnp.int32),
                    jnp.zeros((tm, _LANE), jnp.float32),
                ),
            )
        else:
            val, lp = jax.lax.cond(fxm > 0, fixed_branch, latent_branch)
        vals_ref[smap_ref[i]] = val
        tval = jnp.where(i == ti, val, tval)

        if need_logw:
            logw = logw + evm.astype(jnp.float32) * lp
        if need_lpt:
            # target log-density at the FINAL value: the fixed branch's
            # lp already is that; a latent target needs one extra pass
            # over its entries (one node per row — negligible)
            def lp_sampled():
                def row_body(r, lp_acc):
                    m = pidx == r
                    base = eoff + r * card
                    total_s = _row_total(base)

                    def cls_sel(j, acc):
                        ratio = tbl_ref[base + j] / jnp.maximum(
                            total_s, 1e-12
                        )
                        lp_j = jnp.log(
                            jnp.maximum(
                                jnp.full((tm, _LANE), ratio), 1e-12
                            )
                        )
                        return acc + jnp.where(m & (val == j), lp_j, 0.0)

                    return jax.lax.fori_loop(0, card, cls_sel, lp_acc)

                return jax.lax.fori_loop(
                    0, rows, row_body,
                    jnp.zeros((tm, _LANE), jnp.float32),
                )

            lp_t = jax.lax.cond(
                (i == ti) & (fxm == 0), lp_sampled, lambda: lp
            )
            lpt = jnp.where(i == ti, lp_t, lpt)
        return logw, lpt, tval

    logw, lpt, val_t = jax.lax.fori_loop(
        0,
        n_nodes,
        node_body,
        (
            jnp.zeros((tm, _LANE), jnp.float32),
            jnp.zeros((tm, _LANE), jnp.float32),
            jnp.zeros((tm, _LANE), jnp.int32),
        ),
    )

    oi = 0
    if want_logw:
        out_refs[oi][0] = logw
        oi += 1
    if want_tgt:
        out_refs[oi][0] = val_t.astype(jnp.float32)
        oi += 1
    if want_lpt:
        out_refs[oi][0] = lpt
        oi += 1
    if red_kind is not None:
        src = logw if red_src == "logw" else lpt
        out_refs[oi][0, 0] = _reduction_tile(red_kind, src, val_t, cmax, tm)


import os as _os


def _pick_tm(b: int, s: int, n: int) -> int:
    # The scan kernel's cost has a large per-(node x instance) SCALAR
    # component (metadata loads, loop control, the per-row CDF walk's
    # scalar cums), so bigger particle tiles amortize it — grow TM as
    # far as the VMEM value scratch and the particle count allow.
    cap = int(_os.environ.get("VBN_SCAN_TM_CAP", "0")) or 1024
    tm = 8
    while (
        tm < cap
        and s % (tm * 2 * _LANE) == 0
        and n * tm * 2 * _LANE * 4 <= (10 << 20)
    ):
        tm *= 2
    while s % (tm * _LANE) != 0:
        tm //= 2
    return tm


@functools.partial(
    jax.jit,
    static_argnames=("struct", "n_samples", "interpret", "want"),
)
def categorical_sweep_scan(
    key: jax.Array,
    packed: jax.Array,  # [B, N] i32: clipped value | ev<<16 | do<<17
    tgt_idx: jax.Array,  # [B] i32
    flat_counts: jax.Array,  # [E] f32
    struct,  # static: (eoff, rows, cards, pids, strides as nested tuples,
    #          total_entries, pmax, cmax)
    n_samples: int,
    interpret: bool = False,
    u_ext=None,  # [B, N, S] f32 external uniforms (interpret mode)
    want=("logw",),
):
    """Mask-dynamic scan-form fused sweep; returns
    ``(log_w, target_vals, lp_tgt, red)`` per the ``want`` contract of
    ``sweep_pallas.categorical_sweep_fused``."""
    eoff, rows, cards, pids, strides, total_e, pmax, cmax = struct
    b, n = packed.shape
    s = n_samples
    # Value-scratch COMPACTION: only nodes some other node reads back
    # (i.e. parents) need a VMEM slot; leaves write to one shared trash
    # slot and the runtime target's values are tracked in-register. The
    # scratch is what caps the particle tile TM, and the kernel's
    # scalar-bound cost is nodes x instances = nodes x B x S/(TM*128) —
    # at link scale the leaf fraction buys TM 8 -> 16/32, dividing the
    # dominant cost by 2-4x (round-5 roofline: the row loop's
    # arithmetic IS the kernel; fewer instances is the lever both
    # rewrite probes missed).
    referenced = sorted(
        {int(p) for row_p in pids for p in row_p} | set()
    )
    slot_of = {nid: k for k, nid in enumerate(referenced)}
    n_eff = len(referenced) + 1  # +1 trash slot for leaves
    smap_np = np.full((n,), len(referenced), np.int32)
    for nid, k in slot_of.items():
        smap_np[nid] = k
    pids_slots = np.asarray(
        [[slot_of.get(int(p), 0) for p in row_p] for row_p in pids],
        np.int32,
    )
    tm = _pick_tm(b, s, n_eff)
    s_tiles = s // (tm * _LANE)
    seed = jax.random.bits(key, (1,), "uint32").astype(jnp.int32)

    external_u = u_ext is not None
    want_logw, want_tgt, want_lpt, red_kind, red_src = _parse_want(want)
    n_stream = int(want_logw) + int(want_tgt) + int(want_lpt)

    # Gather mode: every node's table fits a two-vreg window AND classes
    # unroll (see _GATHER). aoff = running 128-aligned row offset.
    entries = [int(r) * int(c) for r, c in zip(rows, cards)]
    gather = (
        _GATHER
        and cmax <= 8
        and max(entries) <= _GATHER_ENTRIES
    )
    aoff_np = np.zeros((n,), np.int32)
    if gather:
        at_rows = 0
        src = []
        for i, e in enumerate(entries):
            aoff_np[i] = at_rows
            nrows = -(-e // _LANE)
            idx = np.arange(nrows * _LANE)
            src.append(
                np.where(idx < e, int(eoff[i]) + np.minimum(idx, e - 1), 0)
            )
            at_rows += nrows
        # trailing pad row: the fixed two-row window of the LAST node may
        # read one row past its block
        src.append(np.zeros((_LANE,), np.int64))
        src_idx = np.concatenate(src).reshape(-1, _LANE)
        tblv = jnp.take(flat_counts, jnp.asarray(src_idx, np.int32))
    else:
        tblv = jnp.zeros((2, _LANE), jnp.float32)  # unused dummy

    kernel = functools.partial(
        _scan_kernel,
        n_nodes=n, n_rows_b=b, pmax=pmax, cmax=cmax, tm=tm,
        external_u=external_u,
        want_logw=want_logw, want_tgt=want_tgt, want_lpt=want_lpt,
        red_kind=red_kind, red_src=red_src, gather=gather,
    )

    meta = [
        jnp.asarray(np.asarray(eoff, np.int32)),
        jnp.asarray(np.asarray(rows, np.int32)),
        jnp.asarray(np.asarray(cards, np.int32)),
        jnp.asarray(pids_slots.reshape(-1)),  # parent ids AS SLOTS
        jnp.asarray(np.asarray(strides, np.int32).reshape(-1)),
    ]
    in_specs = []
    operands = []
    if external_u:
        u_r = u_ext.reshape(b, n, s_tiles, tm, _LANE)
        u_r = jnp.transpose(u_r, (0, 2, 1, 3, 4)).reshape(
            b, s_tiles * n * tm, _LANE
        )
        in_specs.append(
            pl.BlockSpec((1, n * tm, _LANE), lambda bb, st, *_: (bb, st, 0))
        )
        operands.append(u_r)
    else:
        in_specs.append(pl.BlockSpec((8, _LANE), lambda bb, st, *_: (0, 0)))
        operands.append(jnp.zeros((8, _LANE), jnp.float32))  # unused
    # 128-aligned table (whole array resident; constant block index ->
    # copied into VMEM once, not per grid instance)
    in_specs.append(
        pl.BlockSpec(tblv.shape, lambda bb, st, *_: (0, 0))
    )
    operands.append(tblv)

    out_specs = [
        pl.BlockSpec((1, tm, _LANE), lambda bb, st, *_: (bb, st, 0))
        for _ in range(n_stream)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, s_tiles * tm, _LANE), jnp.float32)
        for _ in range(n_stream)
    ]
    if red_kind is not None:
        out_specs.append(
            pl.BlockSpec((1, 1, 8, _LANE), lambda bb, st, *_: (bb, st, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, s_tiles, 8, _LANE), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(b, s_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_eff, tm, _LANE), jnp.int32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        seed, packed.T.reshape(-1), tgt_idx, *meta, flat_counts,
        jnp.asarray(aoff_np), jnp.asarray(smap_np), *operands,
    )
    oi = 0
    logw = tgt = lpt = red = None
    if want_logw:
        logw, oi = outs[oi].reshape(b, s), oi + 1
    if want_tgt:
        tgt, oi = outs[oi].reshape(b, s), oi + 1
    if want_lpt:
        lpt, oi = outs[oi].reshape(b, s), oi + 1
    if red_kind is not None:
        red = _combine_reduction(outs[oi], b)
    return logw, tgt, lpt, red


def scan_struct_for(plan, cpds):
    """Hashable static structure for ``categorical_sweep_scan``."""
    eoff, rows, cards, pids, strides, total_e, pmax = _scan_structure(
        plan, cpds
    )
    return (
        tuple(eoff.tolist()),
        tuple(rows.tolist()),
        tuple(cards.tolist()),
        tuple(map(tuple, pids.tolist())),
        tuple(map(tuple, strides.tolist())),
        total_e,
        pmax,
        int(max(cards.tolist())),
    )


def _shard_scan_sweep(mesh, call_local, key, packed, tgt_idx, counts, *,
                      n, s_loc, want, interpret):
    """Run the scan sweep under a ('data','particle') mesh via shard_map.

    Query rows shard over 'data', particles over 'particle' (per-shard
    seed folds); reductions combine with the pmax/psum pair at the
    SURVEY.md §5.8 weight-normalization reduction point, exactly as in
    ``sweep_pallas._shard_sweep``.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, PARTICLE_AXIS

    npart = mesh.shape[PARTICLE_AXIS]
    want_logw, want_tgt, want_lpt, red_kind, _src = _parse_want(want)

    def local(key, packed, tgt_idx, counts):
        di = jax.lax.axis_index(DATA_AXIS)
        pi = jax.lax.axis_index(PARTICLE_AXIS)
        k = jax.random.fold_in(key, di * npart + pi)
        u = None
        if interpret:
            u = jax.random.uniform(
                jax.random.fold_in(k, 1),
                (packed.shape[0], n, s_loc),
                minval=1e-6,
                maxval=1.0 - 1e-6,
            )
        logw, tgt, lpt, red = call_local(k, packed, tgt_idx, counts, u)
        out = {}
        if logw is not None:
            out["logw"] = logw
        if tgt is not None:
            out["tgt"] = tgt
        if lpt is not None:
            out["lpt"] = lpt
        if red is not None:
            sums, m = red
            mg = jax.lax.pmax(m, PARTICLE_AXIS)
            out["red_sums"] = jax.lax.psum(
                sums * jnp.exp(m - mg)[:, None], PARTICLE_AXIS
            )
            out["red_m"] = mg
        return out

    stream_spec = P(DATA_AXIS, PARTICLE_AXIS)
    out_specs = {}
    if want_logw:
        out_specs["logw"] = stream_spec
    if want_tgt:
        out_specs["tgt"] = stream_spec
    if want_lpt:
        out_specs["lpt"] = stream_spec
    if red_kind is not None:
        out_specs["red_sums"] = P(DATA_AXIS, None)
        out_specs["red_m"] = P(DATA_AXIS)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS), P()),
        out_specs=out_specs,
        check_vma=False,
    )(key, packed, tgt_idx, counts)
    red = (out["red_sums"], out["red_m"]) if red_kind is not None else None
    return out.get("logw"), out.get("tgt"), out.get("lpt"), red


def _chunk_cap(fits, b: int) -> int:
    """Largest row count <= b passing ``fits`` (halving search)."""
    cap = b
    while cap > 1 and not fits(cap):
        cap = (cap + 1) // 2
    return cap


def _run_chunked(run_one, key, b: int, cap: int, row_args):
    """Split the batch into SMEM-sized fused dispatches (the [N*B]
    query-row prefetch shares SMEM with the network tables, so a large
    serving bucket cannot ride one kernel launch at link/munin node
    counts). Per-chunk key folds keep draws independent; outputs
    concatenate back along the row axis."""
    if b <= cap:
        return run_one(key, *row_args)
    parts = []
    for ci, lo in enumerate(range(0, b, cap)):
        hi = min(lo + cap, b)
        parts.append(
            run_one(
                jax.random.fold_in(key, ci),
                *(a[lo:hi] for a in row_args),
            )
        )
    merged = []
    for j in range(4):
        vals = [p[j] for p in parts]
        if vals[0] is None:
            merged.append(None)
        elif j == 3:  # reduction: (sums [B,128], m [B]) pair
            merged.append(
                (
                    jnp.concatenate([v[0] for v in vals], axis=0),
                    jnp.concatenate([v[1] for v in vals], axis=0),
                )
            )
        else:
            merged.append(jnp.concatenate(vals, axis=0))
    return tuple(merged)


def make_scan_sweep_fn(plan, cpds, n_samples: int, want=("logw",),
                       mesh=None):
    """Return ``raw(params_tuple, key, fixed [B,N] f32, ev [B,N] f32,
    do [B,N] f32, tgt [B] i32) -> (logw, tgt, lpt, red)`` using the
    mask-dynamic scan-form kernel, or None when unsupported. Oversized
    batches self-chunk into SMEM-sized fused dispatches (single-device
    path); under a mesh the per-shard rows must fit — check
    ``raw.fits(B)`` at trace time."""
    interpret = not sweep_pallas_available()
    npart = 1
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, PARTICLE_AXIS

        npart = mesh.shape.get(PARTICLE_AXIS, 1)
        if n_samples % npart != 0:
            _gate_log(
                plan, n_samples, mesh, "xla-scan",
                f"n_samples {n_samples} not divisible by particle axis "
                f"{npart}",
            )
            return None
    s_loc = n_samples // npart

    reason = scan_sweep_reason(plan, cpds, s_loc)
    if reason is not None:
        lg = _make_lg_scan_fn(
            plan, cpds, n_samples, s_loc, want, mesh, interpret
        )
        if lg is not None:
            return lg
        _gate_log(plan, n_samples, mesh, "xla-scan", reason)
        return None
    struct = scan_struct_for(plan, cpds)
    cards = jnp.asarray([c.resolved_classes for c in cpds], jnp.int32)
    n = plan.n_nodes

    def call_local(k, packed, tgt_idx, counts, u):
        return categorical_sweep_scan(
            k, packed, tgt_idx, counts, struct, s_loc,
            interpret=interpret, u_ext=u, want=want,
        )

    def raw(params_tuple, key, fixed_vals, ev_mask, do_mask, tgt_idx):
        fixed_i = jnp.clip(
            jnp.rint(jnp.nan_to_num(fixed_vals)).astype(jnp.int32),
            0,
            cards[None, :] - 1,
        )
        packed = (
            fixed_i
            | jnp.where(ev_mask > 0, _EV_BIT, 0)
            | jnp.where(do_mask > 0, _DO_BIT, 0)
        )
        tgt_i = tgt_idx.astype(jnp.int32)
        counts = _flat_counts(cpds, params_tuple)
        if mesh is not None:
            return _shard_scan_sweep(
                mesh, call_local, key, packed, tgt_i, counts,
                n=n, s_loc=s_loc, want=want, interpret=interpret,
            )

        def run_one(k, packed_c, tgt_c):
            u = None
            if interpret:
                u = jax.random.uniform(
                    jax.random.fold_in(k, 1),
                    (packed_c.shape[0], n, s_loc),
                    minval=1e-6,
                    maxval=1.0 - 1e-6,
                )
            return call_local(k, packed_c, tgt_c, counts, u)

        b = packed.shape[0]
        cap = _chunk_cap(lambda bb: scan_batch_fits(plan, bb, cpds), b)
        return _run_chunked(run_one, key, b, cap, (packed, tgt_i))

    def fits(b: int) -> bool:
        if mesh is None:
            return True  # raw self-chunks
        from ..parallel.mesh import DATA_AXIS

        ndata = mesh.shape.get(DATA_AXIS, 1)
        return b % ndata == 0 and scan_batch_fits(plan, b // ndata, cpds)

    raw.fits = fits
    _gate_log(plan, n_samples, mesh, "pallas-scan-categorical")
    return raw


# ---------------------------------------------------------------------------
# Linear-Gaussian scan-form sweep (mask-dynamic; the gaussian-class
# analogue — same metadata-driven O(1)-compile structure, no CPT table)
# ---------------------------------------------------------------------------


def lg_scan_reason(plan, cpds, n_samples: int):
    from ..models.linear_gaussian import LinearGaussianCPD

    if plan.n_nodes > _MAX_NODES:
        return f"n_nodes {plan.n_nodes} > {_MAX_NODES}"
    if n_samples % 1024 != 0:
        return f"n_samples {n_samples} not a multiple of 1024"
    for i, cpd in enumerate(cpds):
        name = plan.topo_order[i]
        if not isinstance(cpd, LinearGaussianCPD):
            return f"node {name!r} is {type(cpd).__name__}, not linear_gaussian"
        if cpd.output_dim != 1:
            return f"node {name!r} has output_dim {cpd.output_dim} != 1"
        if cpd.input_dim != len(plan.parent_idx[i]):
            return f"node {name!r} has multi-dim parents (w table misaligns)"
    return None


def lg_scan_batch_fits(plan, batch: int, dmax: int) -> bool:
    """fixed f32 + flags i32 ([N*B] each) + the flat param table in SMEM."""
    n = plan.n_nodes
    ptab = n * (dmax + 2) * 4
    return 2 * n * batch * 4 + batch * 4 + ptab <= _SMEM_BUDGET


def _lg_scan_kernel(
    seed_ref,  # SMEM [1] i32
    fixed_ref,  # SMEM [N * B] f32 clamped values (node-major)
    flags_ref,  # SMEM [N * B] i32: ev | do<<1
    tgt_ref,  # SMEM [B] i32
    pids_ref,  # SMEM [N * pmax] i32 parent SLOT ids (0-padded)
    smap_ref,  # SMEM [N] i32 value-scratch slot per node (leaves -> trash)
    ptab_ref,  # SMEM [N * (dmax + 2)] f32: w_0..w_{dmax-1}, bias, sigma
    u_ref,  # VMEM [1, 2N * TM, 128] f32 external uniforms, or dummy
    *rest,  # [logw?] + [tgt?] + [lpt?] [1, TM, 128] + [red?] [1,1,8,128]
    #        + the [N, TM, 128] f32 VMEM value scratch (always last)
    n_nodes: int,
    pmax: int,
    dmax: int,
    tm: int,
    external_u: bool,
    want_logw: bool,
    want_tgt: bool,
    want_lpt: bool,
    red_kind,
    red_src,
):
    *out_refs, vals_ref = rest
    b = pl.program_id(0)
    st = pl.program_id(1)
    if not external_u:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + st)
    ti = tgt_ref[b]
    two_pi = jnp.float32(2.0 * np.pi)
    half_log_2pi = jnp.float32(0.9189385332046727)
    stride = dmax + 2

    def node_body(i, carry):
        logw, lpt, tval = carry
        flags = flags_ref[i * n_nodes_b + b]
        fixed_v = fixed_ref[i * n_nodes_b + b]
        evm = flags & 1

        loc = jnp.full((tm, _LANE), ptab_ref[i * stride + dmax], jnp.float32)
        for k in range(pmax):
            # padded slots carry weight 0.0 and point at node 0, whose
            # scratch may be UNINITIALIZED f32 (NaN * 0 == NaN) — gate
            # the product on the weight being exactly zero
            w_k = ptab_ref[i * stride + k]
            loc = loc + jnp.where(
                w_k != 0.0,
                vals_ref[pids_ref[i * pmax + k]] * w_k,
                0.0,
            )
        sigma = ptab_ref[i * stride + dmax + 1]

        # mask-independent PRNG stream: both uniforms always drawn
        if external_u:
            u1 = u_ref[0, pl.ds((2 * i) * tm, tm), :]
            u2 = u_ref[0, pl.ds((2 * i + 1) * tm, tm), :]
        else:
            u1 = _uniform_from_bits((tm, _LANE))
            u2 = _uniform_from_bits((tm, _LANE))
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(two_pi * u2)
        sampled = loc + sigma * z
        val = jnp.where(flags > 0, jnp.full((tm, _LANE), fixed_v), sampled)
        vals_ref[smap_ref[i]] = val
        tval = jnp.where(i == ti, val, tval)

        # lp at the FINAL value — cheap for LG, so always computed and
        # mask-selected (no per-node lax.cond)
        zz = (val - loc) / sigma
        lp = -0.5 * zz * zz - jnp.log(sigma) - half_log_2pi
        logw = logw + evm.astype(jnp.float32) * lp
        lpt = jnp.where(i == ti, lp, lpt)
        return logw, lpt, tval

    # closure constant: per-node row stride of the [N * B] SMEM arrays
    n_nodes_b = pl.num_programs(0)

    logw, lpt, val_t = jax.lax.fori_loop(
        0,
        n_nodes,
        node_body,
        (
            jnp.zeros((tm, _LANE), jnp.float32),
            jnp.zeros((tm, _LANE), jnp.float32),
            jnp.zeros((tm, _LANE), jnp.float32),
        ),
    )

    oi = 0
    if want_logw:
        out_refs[oi][0] = logw
        oi += 1
    if want_tgt:
        out_refs[oi][0] = val_t
        oi += 1
    if want_lpt:
        out_refs[oi][0] = lpt
        oi += 1
    if red_kind is not None:
        src = logw if red_src == "logw" else lpt
        out_refs[oi][0, 0] = _reduction_tile(red_kind, src, val_t, 0, tm)


@functools.partial(
    jax.jit,
    static_argnames=("struct", "n_samples", "interpret", "want"),
)
def lg_sweep_scan(
    key: jax.Array,
    fixed_vals: jax.Array,  # [B, N] f32 clamped values
    flags: jax.Array,  # [B, N] i32: ev | do<<1
    tgt_idx: jax.Array,  # [B] i32
    ptab_flat: jax.Array,  # [N * (dmax + 2)] f32
    struct,  # static: (pids nested tuple, pmax, dmax)
    n_samples: int,
    interpret: bool = False,
    u_ext=None,  # [B, 2N, S] f32 external uniforms (interpret mode)
    want=("logw",),
):
    pids, pmax, dmax = struct
    b, n = fixed_vals.shape
    s = n_samples
    # value-scratch compaction (see the categorical kernel's note)
    referenced = sorted({int(p) for row_p in pids for p in row_p})
    slot_of = {nid: k for k, nid in enumerate(referenced)}
    n_eff = len(referenced) + 1
    smap_np = np.full((n,), len(referenced), np.int32)
    for nid, k in slot_of.items():
        smap_np[nid] = k
    pids_slots = np.asarray(
        [[slot_of.get(int(p), 0) for p in row_p] for row_p in pids],
        np.int32,
    )
    tm = _pick_tm(b, s, n_eff)
    s_tiles = s // (tm * _LANE)
    seed = jax.random.bits(key, (1,), "uint32").astype(jnp.int32)

    external_u = u_ext is not None
    want_logw, want_tgt, want_lpt, red_kind, red_src = _parse_want(want)
    n_stream = int(want_logw) + int(want_tgt) + int(want_lpt)

    kernel = functools.partial(
        _lg_scan_kernel,
        n_nodes=n, pmax=pmax, dmax=dmax, tm=tm, external_u=external_u,
        want_logw=want_logw, want_tgt=want_tgt, want_lpt=want_lpt,
        red_kind=red_kind, red_src=red_src,
    )
    pids_flat = jnp.asarray(pids_slots.reshape(-1))  # parent ids AS SLOTS
    in_specs = []
    operands = []
    if external_u:
        u_r = u_ext.reshape(b, 2 * n, s_tiles, tm, _LANE)
        u_r = jnp.transpose(u_r, (0, 2, 1, 3, 4)).reshape(
            b, s_tiles * 2 * n * tm, _LANE
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 2 * n * tm, _LANE), lambda bb, st, *_: (bb, st, 0)
            )
        )
        operands.append(u_r)
    else:
        in_specs.append(pl.BlockSpec((8, _LANE), lambda bb, st, *_: (0, 0)))
        operands.append(jnp.zeros((8, _LANE), jnp.float32))  # unused

    out_specs = [
        pl.BlockSpec((1, tm, _LANE), lambda bb, st, *_: (bb, st, 0))
        for _ in range(n_stream)
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, s_tiles * tm, _LANE), jnp.float32)
        for _ in range(n_stream)
    ]
    if red_kind is not None:
        out_specs.append(
            pl.BlockSpec((1, 1, 8, _LANE), lambda bb, st, *_: (bb, st, 0, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b, s_tiles, 8, _LANE), jnp.float32)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(b, s_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_eff, tm, _LANE), jnp.float32)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        seed,
        fixed_vals.T.reshape(-1),
        flags.T.reshape(-1),
        tgt_idx,
        pids_flat,
        jnp.asarray(smap_np),
        ptab_flat,
        *operands,
    )
    oi = 0
    logw = tgt = lpt = red = None
    if want_logw:
        logw, oi = outs[oi].reshape(b, s), oi + 1
    if want_tgt:
        tgt, oi = outs[oi].reshape(b, s), oi + 1
    if want_lpt:
        lpt, oi = outs[oi].reshape(b, s), oi + 1
    if red_kind is not None:
        red = _combine_reduction(outs[oi], b)
    return logw, tgt, lpt, red


def lg_scan_struct_for(plan, cpds):
    pmax = max((len(p) for p in plan.parent_idx), default=0)
    pmax = max(pmax, 1)
    n = plan.n_nodes
    pids = np.zeros((n, pmax), np.int32)
    for i in range(n):
        pids[i, : len(plan.parent_idx[i])] = plan.parent_idx[i]
    dmax = max((len(p) for p in plan.parent_idx), default=0)
    dmax = max(dmax, 1)
    return (tuple(map(tuple, pids.tolist())), pmax, dmax)


def lg_ptab_flat(cpds, params_tuple, dmax: int):
    """[N * (dmax + 2)] flat rows: w_0..w_{dmax-1}, bias, sigma."""
    rows = []
    for cpd, params in zip(cpds, params_tuple):
        w = params["weight"][:, 0]
        pad = jnp.zeros((dmax - w.shape[0],), jnp.float32)
        sigma = jnp.sqrt(
            jnp.maximum(params["var"][0], float(cpd.min_scale) ** 2)
        )
        rows.append(
            jnp.concatenate([w, pad, params["bias"], sigma[None]])
        )
    return jnp.concatenate(rows).astype(jnp.float32)


def _shard_lg_scan(mesh, call_local, key, fixed, flags, tgt_idx, ptab, *,
                   n, s_loc, want, interpret):
    """LG scan sweep under the ('data','particle') mesh (same reduction
    scheme as ``_shard_scan_sweep``)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, PARTICLE_AXIS

    npart = mesh.shape[PARTICLE_AXIS]
    want_logw, want_tgt, want_lpt, red_kind, _src = _parse_want(want)

    def local(key, fixed, flags, tgt_idx, ptab):
        di = jax.lax.axis_index(DATA_AXIS)
        pi = jax.lax.axis_index(PARTICLE_AXIS)
        k = jax.random.fold_in(key, di * npart + pi)
        u = None
        if interpret:
            u = jax.random.uniform(
                jax.random.fold_in(k, 1),
                (fixed.shape[0], 2 * n, s_loc),
                minval=1e-6,
                maxval=1.0 - 1e-6,
            )
        logw, tgt, lpt, red = call_local(k, fixed, flags, tgt_idx, ptab, u)
        out = {}
        if logw is not None:
            out["logw"] = logw
        if tgt is not None:
            out["tgt"] = tgt
        if lpt is not None:
            out["lpt"] = lpt
        if red is not None:
            sums, m = red
            mg = jax.lax.pmax(m, PARTICLE_AXIS)
            out["red_sums"] = jax.lax.psum(
                sums * jnp.exp(m - mg)[:, None], PARTICLE_AXIS
            )
            out["red_m"] = mg
        return out

    stream_spec = P(DATA_AXIS, PARTICLE_AXIS)
    out_specs = {}
    if want_logw:
        out_specs["logw"] = stream_spec
    if want_tgt:
        out_specs["tgt"] = stream_spec
    if want_lpt:
        out_specs["lpt"] = stream_spec
    if red_kind is not None:
        out_specs["red_sums"] = P(DATA_AXIS, None)
        out_specs["red_m"] = P(DATA_AXIS)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS), P()
        ),
        out_specs=out_specs,
        check_vma=False,
    )(key, fixed, flags, tgt_idx, ptab)
    red = (out["red_sums"], out["red_m"]) if red_kind is not None else None
    return out.get("logw"), out.get("tgt"), out.get("lpt"), red


def _make_lg_scan_fn(plan, cpds, n_samples, s_loc, want, mesh, interpret):
    reason = lg_scan_reason(plan, cpds, s_loc)
    if reason is None and any(w.startswith("pmf_") for w in want):
        # a class histogram over a continuous LG target is a binning
        # question, not a kernel reduction (same refusal as the unrolled
        # kernel, sweep_pallas.make_fused_sweep_fn)
        reason = "pmf reduction undefined for continuous LG targets"
    if reason is not None:
        return None
    struct = lg_scan_struct_for(plan, cpds)
    dmax = struct[2]
    n = plan.n_nodes

    def call_local(k, fixed, flags, tgt_idx, ptab, u):
        return lg_sweep_scan(
            k, fixed, flags, tgt_idx, ptab, struct, s_loc,
            interpret=interpret, u_ext=u, want=want,
        )

    def raw(params_tuple, key, fixed_vals, ev_mask, do_mask, tgt_idx):
        fixed = jnp.nan_to_num(fixed_vals.astype(jnp.float32))
        flags = (
            jnp.where(ev_mask > 0, 1, 0) | jnp.where(do_mask > 0, 2, 0)
        ).astype(jnp.int32)
        tgt_i = tgt_idx.astype(jnp.int32)
        ptab = lg_ptab_flat(cpds, params_tuple, dmax)
        if mesh is not None:
            return _shard_lg_scan(
                mesh, call_local, key, fixed, flags, tgt_i, ptab,
                n=n, s_loc=s_loc, want=want, interpret=interpret,
            )

        def run_one(k, fixed_c, flags_c, tgt_c):
            u = None
            if interpret:
                u = jax.random.uniform(
                    jax.random.fold_in(k, 1),
                    (fixed_c.shape[0], 2 * n, s_loc),
                    minval=1e-6,
                    maxval=1.0 - 1e-6,
                )
            return call_local(k, fixed_c, flags_c, tgt_c, ptab, u)

        b = fixed.shape[0]
        cap = _chunk_cap(
            lambda bb: lg_scan_batch_fits(plan, bb, dmax), b
        )
        return _run_chunked(run_one, key, b, cap, (fixed, flags, tgt_i))

    def fits(b: int) -> bool:
        if mesh is None:
            return True  # raw self-chunks
        from ..parallel.mesh import DATA_AXIS

        ndata = mesh.shape.get(DATA_AXIS, 1)
        return b % ndata == 0 and lg_scan_batch_fits(
            plan, b // ndata, dmax
        )

    raw.fits = fits
    _gate_log(plan, n_samples, mesh, "pallas-scan-linear-gaussian")
    return raw
