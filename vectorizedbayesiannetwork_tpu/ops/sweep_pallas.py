"""Fully-fused categorical ancestral sweep: one Pallas kernel, zero
intermediate HBM traffic.

The XLA sweep (``inference/_sweep.py``) is HBM-bound: every node's value
array and the RNG outputs materialize at fusion boundaries, so an 8-node
LW sweep at B=64 x 1M particles streams ~80 GB and runs ~97 ms on v5e —
~50x over the speed of light set by its true data volume (CPTs are
kilobytes; only the weights and target values need to leave the chip).

This kernel keeps the ENTIRE topological sweep in VMEM/registers:

- all CPT count tables ride in one small VMEM block ([total_rows, Cpad]);
- each program instance owns one (batch row, particle block) pair and
  unrolls the topo order in Python — per node, the mixed-radix parent
  index, the inverse-CDF class walk (static per-class loop, the same
  select-chain formulation as ``models/categorical_table.py``), and the
  evidence log-weight accumulate are pure [TM, 128] vector ops;
- randomness is the in-kernel TPU PRNG (one seed fold per instance,
  one draw field per latent node), so nothing is materialized;
- only ``log_w`` and the target's class values are written out.

Evidence/do structure is trace-time static (the static inference plan),
matching ``sweep_trace``'s specialization; evidence VALUES cross as a
scalar-prefetch [B, N] int table. Draws differ from the XLA path's
(different generator), with identical distributions — pinned by
statistical tests, and the exact-match contract stays with the XLA path.

Reference semantics served by this kernel: the likelihood-weighting
topo sweep (``/root/reference/vbn/inference/likelihood_weighting.py:11-82``
— evidence clamps and contributes log p(value|parents) to the particle
weights) and Monte-Carlo marginalization
(``/root/reference/vbn/inference/monte_carlo_marginalization.py:60-92``
— evidence/do clamp unweighted, pdf = exp(target log-density)), over
``categorical_table`` CPDs
(``/root/reference/vbn/cpds/categorical_table.py:23-417``) and
``linear_gaussian`` CPDs
(``/root/reference/vbn/cpds/linear_gaussian.py:13-217``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAX_C = 32  # per-class static loop budget
_MAX_ROWS_X_C = 2048  # select-chain ops per node budget
_MAX_NODES = 64


def sweep_pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def categorical_sweep_supported(plan, cpds, n_samples: int) -> bool:
    """Static gate for the fused kernel (see module docstring)."""
    from ..models.categorical_table import CategoricalTableCPD

    if plan.n_nodes > _MAX_NODES or n_samples % 1024 != 0:
        return False
    for cpd in cpds:
        if not isinstance(cpd, CategoricalTableCPD):
            return False
        if cpd.output_dim != 1 or cpd.n_classes <= 0:
            return False
        if cpd.input_dim > 0 and cpd.parent_n_classes is None:
            return False
        if cpd.input_dim > 0 and cpd.parent_cards is None:
            return False  # not fitted yet
        c = cpd.resolved_classes
        if not 1 <= c <= _MAX_C:
            return False
        if cpd._parent_states * c > _MAX_ROWS_X_C:
            return False
    return True


def _structure(plan, cpds):
    """Trace-time constants: row offsets, strides, cards, masks."""
    offs, cards, strides = [], [], []
    at = 0
    for i, cpd in enumerate(cpds):
        offs.append(at)
        at += cpd._parent_states
        cards.append(int(cpd.resolved_classes))
        strides.append(tuple(int(s) for s in cpd._strides))
    return offs, cards, strides, at


def _stacked_counts(cpds, params_tuple, total_rows: int, cmax: int):
    blocks = []
    for cpd, params in zip(cpds, params_tuple):
        cnt = params["counts"][0]  # [P, C]
        c = cnt.shape[1]
        if c < cmax:
            cnt = jnp.concatenate(
                [cnt, jnp.zeros((cnt.shape[0], cmax - c), cnt.dtype)], axis=1
            )
        blocks.append(cnt)
    return jnp.concatenate(blocks, axis=0)  # [total_rows, cmax]


def _uniform_from_bits(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    # (2^-25, 1 - 2^-25): never exactly 0 or 1
    return (bits24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))


def _sweep_kernel(
    seed_ref,  # SMEM [1] i32 (scalar prefetch)
    fixed_ref,  # SMEM [B, N] i32 evidence/do class values (scalar prefetch)
    tbl_ref,  # VMEM [total_rows, Cpad] f32 stacked counts
    u_ref,  # VMEM [1, N * TM, 128] f32 external uniforms, or None
    *out_refs,  # [logw?] + [tgt] + [lpt?] blocks [1, TM, 128] f32 — the
    #            want flags drop unneeded outputs AND their compute (LW
    #            never reads lpt; MCM never reads logw)
    plan_tuple,
    tm: int,
    external_u: bool,
    want_logw: bool,
    want_lpt: bool,
):
    (
        n_nodes,
        parent_idx,
        ev_mask,
        do_mask,
        target_idx,
        offs,
        pstates,
        cards,
        strides,
    ) = plan_tuple
    b = pl.program_id(0)
    st = pl.program_id(1)
    if not external_u:
        # Mosaic's prng_seed takes at most 2 values: fold (b, st) into one
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + st)

    vals = [None] * n_nodes
    logw = jnp.zeros((tm, _LANE), jnp.float32)
    lpt = jnp.zeros((tm, _LANE), jnp.float32)

    for i in range(n_nodes):
        rows = pstates[i]
        c = cards[i]
        pids = parent_idx[i]
        fixed_i = fixed_ref[b, i]  # scalar i32

        # mixed-radix parent row index, [TM, 128] i32 (0 for roots)
        if pids:
            pidx = vals[pids[0]] * strides[i][0]
            for k in range(1, len(pids)):
                pidx = pidx + vals[pids[k]] * strides[i][k]
        else:
            pidx = None

        def col(j, _pidx=pidx, _off=offs[i], _rows=rows):
            """class-j count column for this node: [TM, 128] or scalar."""
            if _pidx is None:
                return tbl_ref[_off, j]
            acc = jnp.where(
                _pidx == 0, tbl_ref[_off, j], 0.0
            )
            for r in range(1, _rows):
                acc = acc + jnp.where(_pidx == r, tbl_ref[_off + r, j], 0.0)
            return acc

        total = col(0)
        for j in range(1, c):
            total = total + col(j)

        is_fixed = bool(ev_mask[i] or do_mask[i])
        if is_fixed:
            val = jnp.full((tm, _LANE), fixed_i, jnp.int32)
        else:
            if external_u:
                u = u_ref[0, i * tm : (i + 1) * tm, :]
            else:
                u = _uniform_from_bits((tm, _LANE))
            thresh = u * total
            cum = col(0)
            val = jnp.zeros((tm, _LANE), jnp.int32)
            for j in range(1, c):
                val = val + (cum <= thresh).astype(jnp.int32)
                cum = cum + col(j)
        vals[i] = val

        if (ev_mask[i] and want_logw) or (i == target_idx and want_lpt):
            cnt_sel = jnp.where(val == 0, col(0), 0.0)
            for j in range(1, c):
                cnt_sel = cnt_sel + jnp.where(val == j, col(j), 0.0)
            prob = cnt_sel / jnp.maximum(total, 1e-12)
            lp = jnp.log(jnp.maximum(prob, 1e-12))
            if ev_mask[i] and want_logw:
                logw = logw + lp
            if i == target_idx and want_lpt:
                lpt = lp

    oi = 0
    if want_logw:
        out_refs[oi][0] = logw
        oi += 1
    out_refs[oi][0] = vals[target_idx].astype(jnp.float32)
    oi += 1
    if want_lpt:
        out_refs[oi][0] = lpt


@functools.partial(
    jax.jit,
    static_argnames=("plan_tuple", "n_samples", "interpret", "want"),
)
def categorical_sweep_fused(
    key: jax.Array,
    fixed_idx: jax.Array,  # [B, N] i32 evidence/do class values
    stacked_counts: jax.Array,  # [total_rows, Cmax]
    plan_tuple,  # static structure (see _plan_tuple)
    n_samples: int,
    interpret: bool = False,
    u_ext=None,  # [B, N, S] f32 external uniforms (interpret tests only)
    want=("logw", "lpt"),  # which side outputs to compute+stream
):
    """Returns (log_w [B, S] | None, target_vals [B, S],
    lp_tgt [B, S] | None) — unwanted outputs cost neither compute nor
    HBM writes (each is a full [B, S] stream)."""
    b, n = fixed_idx.shape
    s = n_samples
    tm = 8
    # scale the particle block so the grid stays coarse (instance count
    # ~ B * S / (TM * 128)); cap VMEM at ~2 MB of per-node value blocks
    while tm < 1024 and (s // (_LANE * tm)) * b > 4096 and (
        n * tm * 2 * _LANE * 4 <= (6 << 20)
    ):
        tm *= 2
    while s % (tm * _LANE) != 0:
        tm //= 2
    s_tiles = s // (tm * _LANE)
    cmax = stacked_counts.shape[1]
    cpad = -(-cmax // _LANE) * _LANE
    if cpad != cmax:
        stacked_counts = jnp.concatenate(
            [
                stacked_counts,
                jnp.zeros(
                    (stacked_counts.shape[0], cpad - cmax),
                    stacked_counts.dtype,
                ),
            ],
            axis=1,
        )
    seed = jax.random.bits(key, (1,), "uint32").astype(jnp.int32)

    external_u = u_ext is not None
    want_logw = "logw" in want
    want_lpt = "lpt" in want
    n_out = 1 + int(want_logw) + int(want_lpt)
    kernel = functools.partial(
        _sweep_kernel, plan_tuple=plan_tuple, tm=tm, external_u=external_u,
        want_logw=want_logw, want_lpt=want_lpt,
    )
    in_specs = [
        pl.BlockSpec(stacked_counts.shape, lambda bb, st, *_: (0, 0)),
    ]
    operands = [stacked_counts]
    if external_u:
        # tests: u_ext [B, N, S] -> [B, ST*N*TM, 128] node-major per tile
        u_r = u_ext.reshape(b, n, s_tiles, tm, _LANE)
        u_r = jnp.transpose(u_r, (0, 2, 1, 3, 4)).reshape(
            b, s_tiles * n * tm, _LANE
        )
        in_specs.append(
            pl.BlockSpec((1, n * tm, _LANE), lambda bb, st, *_: (bb, st, 0))
        )
        operands.append(u_r)
    else:
        in_specs.append(
            pl.BlockSpec((8, _LANE), lambda bb, st, *_: (0, 0))
        )
        operands.append(jnp.zeros((8, _LANE), jnp.float32))  # unused

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tm, _LANE), lambda bb, st, *_: (bb, st, 0))
            for _ in range(n_out)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, s_tiles * tm, _LANE), jnp.float32)
        for _ in range(n_out)
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, fixed_idx, *operands)
    outs = [o.reshape(b, s) for o in outs]
    oi = 0
    logw = lpt = None
    if want_logw:
        logw, oi = outs[oi], oi + 1
    tgt, oi = outs[oi], oi + 1
    if want_lpt:
        lpt = outs[oi]
    return logw, tgt, lpt


def plan_tuple_for(plan, cpds):
    """Hashable static structure passed into the kernel trace."""
    offs, cards, strides, total_rows = _structure(plan, cpds)
    return (
        (
            plan.n_nodes,
            tuple(tuple(p) for p in plan.parent_idx),
            tuple(bool(m) for m in plan.evidence_mask),
            tuple(bool(m) for m in plan.do_mask),
            plan.target_idx,
            tuple(offs),
            tuple(int(c._parent_states) for c in cpds),
            tuple(cards),
            tuple(strides),
        ),
        total_rows,
        max(cards),
    )


# ---------------------------------------------------------------------------
# Linear-Gaussian fused sweep (the bnlearn "gaussian" class / LG flagship)
# ---------------------------------------------------------------------------

def lg_sweep_supported(plan, cpds, n_samples: int) -> bool:
    from ..models.linear_gaussian import LinearGaussianCPD

    if plan.n_nodes > _MAX_NODES or n_samples % 1024 != 0:
        return False
    for i, cpd in enumerate(cpds):
        if not isinstance(cpd, LinearGaussianCPD):
            return False
        if cpd.output_dim != 1:
            return False
        if cpd.input_dim != len(plan.parent_idx[i]):
            return False  # multi-dim parents would misalign the w table
    return True


def lg_plan_tuple_for(plan, cpds):
    dmax = max((len(p) for p in plan.parent_idx), default=0)
    return (
        (
            plan.n_nodes,
            tuple(tuple(p) for p in plan.parent_idx),
            tuple(bool(m) for m in plan.evidence_mask),
            tuple(bool(m) for m in plan.do_mask),
            plan.target_idx,
        ),
        max(dmax, 1),
    )


def lg_param_table(cpds, params_tuple, dmax: int, min_scales):
    """[N, dmax + 2] rows: [w_0..w_{din-1}, 0pad, bias, sigma]."""
    rows = []
    for cpd, params, ms in zip(cpds, params_tuple, min_scales):
        w = params["weight"][:, 0]  # [din]
        pad = jnp.zeros((dmax - w.shape[0],), jnp.float32)
        sigma = jnp.sqrt(jnp.maximum(params["var"][0], ms**2))
        rows.append(
            jnp.concatenate([w, pad, params["bias"], sigma[None]])
        )
    return jnp.stack(rows)  # [N, dmax + 2]


_HALF_LOG_2PI = 0.9189385332046727


def _lg_sweep_kernel(
    seed_ref,  # SMEM [1] i32 (scalar prefetch)
    fixed_ref,  # SMEM [B, N] f32 evidence/do values (scalar prefetch)
    ptab_ref,  # VMEM [N, dmax + 2] f32 parameter table
    u_ref,  # VMEM [1, 2N * TM, 128] f32 external uniforms, or dummy
    *out_refs,  # [logw?] + [tgt] + [lpt?] blocks [1, TM, 128]
    plan_tuple,
    dmax: int,
    tm: int,
    external_u: bool,
    want_logw: bool,
    want_lpt: bool,
):
    n_nodes, parent_idx, ev_mask, do_mask, target_idx = plan_tuple
    b = pl.program_id(0)
    st = pl.program_id(1)
    if not external_u:
        pltpu.prng_seed(seed_ref[0], b * pl.num_programs(1) + st)

    vals = [None] * n_nodes
    logw = jnp.zeros((tm, _LANE), jnp.float32)
    lpt = jnp.zeros((tm, _LANE), jnp.float32)
    two_pi = jnp.float32(2.0 * np.pi)

    for i in range(n_nodes):
        pids = parent_idx[i]
        loc = ptab_ref[i, dmax]  # bias (scalar)
        for k, p in enumerate(pids):
            loc = loc + vals[p] * ptab_ref[i, k]
        sigma = ptab_ref[i, dmax + 1]

        is_fixed = bool(ev_mask[i] or do_mask[i])
        if is_fixed:
            val = jnp.full((tm, _LANE), fixed_ref[b, i], jnp.float32)
        else:
            if external_u:
                u1 = u_ref[0, (2 * i) * tm : (2 * i + 1) * tm, :]
                u2 = u_ref[0, (2 * i + 1) * tm : (2 * i + 2) * tm, :]
            else:
                u1 = _uniform_from_bits((tm, _LANE))
                u2 = _uniform_from_bits((tm, _LANE))
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(two_pi * u2)
            val = loc + sigma * z
        vals[i] = val

        if (ev_mask[i] and want_logw) or (i == target_idx and want_lpt):
            zz = (val - loc) / sigma
            lp = -0.5 * zz * zz - jnp.log(sigma) - _HALF_LOG_2PI
            if ev_mask[i] and want_logw:
                logw = logw + lp
            if i == target_idx and want_lpt:
                lpt = lp

    oi = 0
    if want_logw:
        out_refs[oi][0] = logw
        oi += 1
    out_refs[oi][0] = vals[target_idx]
    oi += 1
    if want_lpt:
        out_refs[oi][0] = lpt


@functools.partial(
    jax.jit,
    static_argnames=("plan_tuple", "dmax", "n_samples", "interpret", "want"),
)
def lg_sweep_fused(
    key: jax.Array,
    fixed_vals: jax.Array,  # [B, N] f32 evidence/do values
    param_table: jax.Array,  # [N, dmax + 2]
    plan_tuple,
    dmax: int,
    n_samples: int,
    interpret: bool = False,
    u_ext=None,  # [B, 2N, S] f32 external uniforms (interpret tests only)
    want=("logw", "lpt"),
):
    """Returns (log_w | None, target_vals, lp_tgt | None) — see
    ``categorical_sweep_fused``."""
    b, n = fixed_vals.shape
    s = n_samples
    tm = 8
    while tm < 1024 and (s // (_LANE * tm)) * b > 4096 and (
        n * tm * 2 * _LANE * 4 <= (6 << 20)
    ):
        tm *= 2
    while s % (tm * _LANE) != 0:
        tm //= 2
    s_tiles = s // (tm * _LANE)
    seed = jax.random.bits(key, (1,), "uint32").astype(jnp.int32)

    external_u = u_ext is not None
    want_logw = "logw" in want
    want_lpt = "lpt" in want
    n_out = 1 + int(want_logw) + int(want_lpt)
    kernel = functools.partial(
        _lg_sweep_kernel,
        plan_tuple=plan_tuple,
        dmax=dmax,
        tm=tm,
        external_u=external_u,
        want_logw=want_logw,
        want_lpt=want_lpt,
    )
    in_specs = [
        pl.BlockSpec(param_table.shape, lambda bb, st, *_: (0, 0)),
    ]
    operands = [param_table]
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
        in_specs.append(
            pl.BlockSpec((8, _LANE), lambda bb, st, *_: (0, 0))
        )
        operands.append(jnp.zeros((8, _LANE), jnp.float32))  # unused

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, s_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tm, _LANE), lambda bb, st, *_: (bb, st, 0))
            for _ in range(n_out)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, s_tiles * tm, _LANE), jnp.float32)
        for _ in range(n_out)
    ]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, fixed_vals, *operands)
    outs = [o.reshape(b, s) for o in outs]
    oi = 0
    logw = lpt = None
    if want_logw:
        logw, oi = outs[oi], oi + 1
    tgt, oi = outs[oi], oi + 1
    if want_lpt:
        lpt = outs[oi]
    return logw, tgt, lpt


# ---------------------------------------------------------------------------
# Program-level builder shared by LW / MCM static paths
# ---------------------------------------------------------------------------

def make_fused_sweep_fn(plan, cpds, n_samples: int, want=("logw", "lpt")):
    """Return ``raw(params_tuple, key, fixed) -> (logw, tgt, lpt)`` using
    the family-matched fused kernel, or None when unsupported. ``fixed``
    is the packed [B, total_dim] float evidence/do array (total_dim ==
    n_nodes under both gates). ``want`` drops unneeded side outputs and
    their compute/HBM streams (LW wants only "logw", MCM only "lpt")."""
    if categorical_sweep_supported(plan, cpds, n_samples):
        plan_struct, total_rows, cmax = plan_tuple_for(plan, cpds)
        cards = jnp.asarray(
            [c.resolved_classes for c in cpds], jnp.int32
        )

        def raw_cat(params_tuple, key, fixed_vals):
            fixed_i = jnp.clip(
                jnp.rint(jnp.nan_to_num(fixed_vals)).astype(jnp.int32),
                0,
                cards[None, :] - 1,
            )
            counts = _stacked_counts(cpds, params_tuple, total_rows, cmax)
            return categorical_sweep_fused(
                key, fixed_i, counts, plan_struct, n_samples, want=want
            )

        return raw_cat
    if lg_sweep_supported(plan, cpds, n_samples):
        plan_struct, dmax = lg_plan_tuple_for(plan, cpds)
        min_scales = tuple(float(c.min_scale) for c in cpds)

        def raw_lg(params_tuple, key, fixed_vals):
            ptab = lg_param_table(cpds, params_tuple, dmax, min_scales)
            return lg_sweep_fused(
                key,
                fixed_vals.astype(jnp.float32),
                ptab,
                plan_struct,
                dmax,
                n_samples,
                want=want,
            )

        return raw_lg
    return None
