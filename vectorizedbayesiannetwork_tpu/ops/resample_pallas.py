"""Fused systematic resample-gather: one streaming merge kernel.

The XLA form of systematic resampling materializes ancestor indices
(scatter-add histogram + prefix sum) and then gathers particles row-by-row
(``take_along_axis``). Measured on v5e at B=8, S=1M (completion-synced):
~92 ms for the index computation and ~80-315 ms for the gather (D=1..12) —
both ~100x off HBM speed-of-light, because XLA lowers TPU scatter/gather
to per-index dynamic slices.

This kernel exploits that systematic resampling is a *merge* of two sorted
sequences — the particle CDF ``cum`` and the stratified positions
``u_j = (j + u0)/S`` — so ancestors are monotone in ``j``:

- A cheap host-side ``searchsorted`` at the B*(S/T) tile boundaries (16k
  queries, not 8M) yields each output tile's input-window pointer. The
  pointers ride a scalar-prefetch grid spec, so Pallas's pipeline
  double-buffers the data-dependent window DMAs like ordinary blocks and
  the DMA latency is hidden.
- In-kernel, each position's ancestor *rank* inside its two-window pair
  comes from a vectorized branchless binary search (10 probe steps over
  the sorted 1024-row pair), and both the probes and the final value copy
  use Mosaic's in-register shuffles (``tpu.dynamic_gather``): a lane
  gather inside a 128-wide block plus a sublane gather across the pair's
  8 blocks — bit-exact f32 copies, no MXU, no index materialization.
- A tile whose ancestor span exceeds the prefetched pair (pathological
  weight crowds) falls back to a manual-DMA window walk in the same
  kernel; the ``prev_last`` ordering invariant keeps every output row
  written exactly once.

Both the CDF and the values are reshaped (free, row-major) to
window-blocked form ``[B, K, rows, 128]`` (window axis split onto
sublane x lane tiles) so every DMA is a whole aligned window selected by
leading-dim indices — Mosaic forbids unaligned slices of tiled trailing
dims, and a short trailing dim would be physically lane-padded to 128.

Semantics match ``searchsorted(cum, u, side='right')`` exactly in f32 (the
reference form in ``ops/resample.py`` computes the same ancestors via
``ceil``/histogram up to fp rounding of the same predicate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_pallas import cumsum_available, cumsum_pallas

_POS_MAX = 1.0 - 2.0**-24  # largest f32 strictly below 1.0

T = 512  # output positions per program instance
W = 512  # input window rows (== T: a parked pointer has offset < W, so
#          a two-window pair covers any non-crowded tile in one step)
_LB = 128  # lane-block width (vreg lanes) for in-register gathers
_CB = W // _LB  # lane-blocks per window


def _norm_cum(weights: jax.Array) -> jax.Array:
    """Normalized inclusive CDF, shared by the fused kernels AND the XLA
    reference paths so ancestor predicates stay bit-consistent. Uses the
    single-pass Pallas cumsum (monotone variant) off-CPU."""
    w = weights.astype(jnp.float32)
    if cumsum_available():
        cum = cumsum_pallas(w, monotone=True)
    else:
        cum = jnp.cumsum(w, axis=1)
    return cum / jnp.maximum(cum[:, -1:], 1e-20)


def _fetch(pair, idx):
    """pair [8, 128] (sorted window pair as 8 lane-blocks), idx [1, 128]
    int32 in [0, 1024) -> pair values at idx, [1, 128].

    Two single-vreg ``tpu.dynamic_gather``s: lanes within a block, then
    sublanes across the pair's 8 blocks.
    """
    c8 = jnp.broadcast_to(idx >> 7, (8, _LB))
    r8 = jnp.broadcast_to(idx & (_LB - 1), (8, _LB))
    m = jnp.take_along_axis(pair, r8, axis=1, mode="promise_in_bounds")
    g = jnp.take_along_axis(m, c8, axis=0, mode="promise_in_bounds")
    return g[0:1, :]


def _rank1024(cpair, uq):
    """#{i in [0,1024): cpair_flat[i] <= uq} per lane, [1, 128] int32 in
    [0, 1024].

    Hierarchical: the pair is globally sorted, so the count of FULL
    sublane rows below uq comes from one broadcast compare against each
    row's last lane (no gathers) — that resolves the top 3 bits; a 7-step
    branchless binary search inside the boundary row resolves the rest.
    Saves 3 of the 10 serial two-gather probes of the flat search
    (measured: the rank search is ~half the kernel, BENCH_NOTES.md
    "Cost decomposition")."""
    row_last = jnp.broadcast_to(cpair[:, _LB - 1 :], (_CB * 2, _LB))
    full_rows = jnp.sum(
        (row_last <= uq).astype(jnp.int32), axis=0, keepdims=True
    )  # [1, 128] in [0, 8]
    cnt = full_rows * _LB
    in_range = full_rows < _CB * 2  # all-rows-below => rank is exactly 1024
    bit = _LB // 2
    while bit >= 1:
        probe = jnp.minimum(cnt + (bit - 1), 2 * W - 1)
        val = _fetch(cpair, probe)
        cnt = cnt + jnp.where(
            jnp.logical_and(val <= uq, in_range), bit, 0
        ).astype(jnp.int32)
        bit //= 2
    return cnt


def _pair_pick(cw0, cw1, vw0, vw1, uqs, u_last, prev_last, acc, d8):
    """Resolve one two-window pair against the tile's positions.

    cw0/cw1: [4, 128] CDF windows (lane-blocked); vw0/vw1: [d8*4, 128]
    value windows (feature-major rows of 4 lane-blocks); uqs: list of
    [1, 128] sorted position quarters; u_last/prev_last: scalars;
    acc: quarter-blocked [rows_out, 128].
    Returns (acc', covered, pair_max).
    """
    cpair = jnp.concatenate([cw0, cw1], axis=0)  # [8, 128]
    nq = T // _LB
    segs = []
    for oq in range(nq):
        uq = uqs[oq]  # [1, 128]
        cnt = _rank1024(cpair, uq)
        # found <=> ancestor in this pair: not before it (rows resolved
        # by an earlier pair fail prev_last <= u strictly) and not beyond.
        found_q = jnp.logical_and(prev_last <= uq, cnt < 2 * W)
        l_q = jnp.clip(cnt, 0, 2 * W - 1)
        c8 = jnp.broadcast_to(l_q >> 7, (8, _LB))
        r8 = jnp.broadcast_to(l_q & (_LB - 1), (8, _LB))
        rows_q = []
        for d in range(d8):
            vd = jnp.concatenate(
                [vw0[4 * d : 4 * d + 4], vw1[4 * d : 4 * d + 4]], axis=0
            )  # [8, 128]: the pair's 8 lane-blocks of feature d
            m = jnp.take_along_axis(
                vd, r8, axis=1, mode="promise_in_bounds"
            )
            g = jnp.take_along_axis(
                m, c8, axis=0, mode="promise_in_bounds"
            )
            rows_q.append(g[0:1, :])  # [1, 128]
        picked_q = jnp.concatenate(rows_q, axis=0)  # [d8, 128]
        segs.append(
            jnp.where(
                found_q,
                picked_q,
                acc[oq * d8 : (oq + 1) * d8],
            )
        )
    # acc stays in quarter-blocked layout: rows [oq*d8 + d], lanes = the
    # position within the quarter — the same tiled form the output buffer
    # uses (a plain [.., T, D] pallas output with D < 128 would be
    # physically lane-padded 128/D-fold by Mosaic).
    tail = acc[nq * d8 :]
    acc = jnp.concatenate(segs + ([tail] if tail.shape[0] else []), axis=0)

    pair_max = jnp.max(cpair)
    covered = pair_max > u_last
    return acc, covered, pair_max


def _srg_kernel(
    u0_ref,  # SMEM [B, 1] f32 (scalar prefetch)
    p_ref,  # SMEM [B, K] int32 window pointers (scalar prefetch)
    *args,  # 2r pipelined window refs [1, 1, 4*(dp+1), 128] (rows 0..4 =
    #         CDF lane-blocks, rest = value lane-blocks), then the HBM
    #         blocks (overflow walk), the [1, 1, r*rows_out, 128] output
    #         block, VMEM overflow scratch x2, DMA semaphores (2,)
    s: int,
    dp: int,
    r: int,
):
    """r output tiles per program instance: the per-instance fixed cost
    (grid bookkeeping, pipeline bubbles) measured ~0.6 us/tile over 16k
    tiles at 8x1M (~10 of 23 ms) — amortized r-fold by resolving r
    consecutive tiles, each with its own prefetched window pair, in one
    instance."""
    blks = args[: 2 * r]
    blk_raw = args[2 * r]
    out_ref = args[2 * r + 1]
    bso0, bso1, sems = args[2 * r + 2], args[2 * r + 3], args[2 * r + 4]
    b = pl.program_id(0)
    kk = pl.program_id(1)
    rows_out = out_ref.shape[2] // r
    inv_s = jnp.float32(1.0 / s)
    u0s = u0_ref[b, 0] * inv_s
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(
        jnp.float32
    )
    # Clamp below 1.0: at large S, (S-1+u0)/S can round UP to exactly 1.0
    # in f32, and since the normalized CDF ends at exactly 1.0 the merge
    # walk would run into the padding pair and emit a zero particle. The
    # clamp keeps the kernel bit-identical to the XLA reference (which
    # clamps the same way).
    pos_max = jnp.float32(_POS_MAX)
    for j in range(r):
        k = kk * r + j
        base = (k * T).astype(jnp.float32)
        u = jnp.minimum(
            (base + iota) * inv_s + u0s, pos_max
        )  # [1, T] sorted positions (lanes)
        u_last = jnp.minimum(
            (base + jnp.float32(T - 1)) * inv_s + u0s, pos_max
        )
        uqs = [u[:, oq * _LB : (oq + 1) * _LB] for oq in range(T // _LB)]
        _resolve_tile(
            b, p_ref[b, k], uqs, u_last, blks[2 * j], blks[2 * j + 1],
            blk_raw, out_ref, bso0, bso1, sems, dp,
            row0=j * rows_out, rows_out=rows_out,
        )


def _spg_kernel(
    p_ref,  # SMEM [B, K] int32 window pointers (scalar prefetch)
    *args,  # positions block [1, r, nq, 128], then 2r pipelined window
    #         refs, HBM blocks, output [1, 1, r*rows_out, 128], scratch,
    #         semaphores — see _srg_kernel
    dp: int,
    r: int,
):
    pos_ref = args[0]
    blks = args[1 : 1 + 2 * r]
    blk_raw = args[1 + 2 * r]
    out_ref = args[2 + 2 * r]
    bso0, bso1, sems = args[3 + 2 * r], args[4 + 2 * r], args[5 + 2 * r]
    b = pl.program_id(0)
    kk = pl.program_id(1)
    rows_out = out_ref.shape[2] // r
    for j in range(r):
        k = kk * r + j
        pos = pos_ref[0, j]  # [nq, 128]
        uqs = [pos[oq : oq + 1, :] for oq in range(T // _LB)]
        u_last = jnp.max(pos)  # positions are globally sorted
        _resolve_tile(
            b, p_ref[b, k], uqs, u_last, blks[2 * j], blks[2 * j + 1],
            blk_raw, out_ref, bso0, bso1, sems, dp,
            row0=j * rows_out, rows_out=rows_out,
        )


def _resolve_tile(
    b, start, uqs, u_last, blk0_ref, blk1_ref, blk_raw, out_ref,
    bso0, bso1, sems, dp, row0: int = 0, rows_out: int = None,
):
    """Shared tile body: prefetched pair + overflow window walk.

    The common case (the prefetched pair covers the tile) writes the
    output directly; the walk lives behind ``pl.when`` with the output
    block as its accumulator, so tiles that never overflow don't pay the
    loop-carried dataflow (measured ~2.5 ms of 25 at 8x1M — BENCH_NOTES
    "Cost decomposition"). ``row0``/``rows_out`` select this tile's row
    band of the output block (multi-tile instances write several bands).
    """
    blk0 = blk0_ref[0, 0]
    blk1 = blk1_ref[0, 0]
    if rows_out is None:
        rows_out = out_ref.shape[2]
    row1 = row0 + rows_out
    acc0 = jnp.zeros((rows_out, _LB), jnp.float32)
    acc1, covered0, pair_max0 = _pair_pick(
        blk0[:_CB],
        blk1[:_CB],
        blk0[_CB:],
        blk1[_CB:],
        uqs,
        u_last,
        jnp.float32(-2.0),
        acc0,
        dp,
    )
    out_ref[0, 0, row0:row1] = acc1

    @pl.when(jnp.logical_not(covered0))
    def _walk():
        def overflow(carry):
            widx, prev_last, _cov = carry
            copies = [
                pltpu.make_async_copy(blk_raw.at[b, widx], bso0, sems.at[0]),
                pltpu.make_async_copy(
                    blk_raw.at[b, widx + 1], bso1, sems.at[1]
                ),
            ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            b0 = bso0[:]
            b1 = bso1[:]
            acc, covered, pair_max = _pair_pick(
                b0[:_CB], b1[:_CB], b0[_CB:], b1[_CB:], uqs, u_last,
                prev_last, out_ref[0, 0, row0:row1], dp,
            )
            out_ref[0, 0, row0:row1] = acc
            return widx + 2, pair_max, covered

        jax.lax.while_loop(
            lambda c: jnp.logical_not(c[2]),
            overflow,
            (start + 2, pair_max0, covered0),
        )


def srg_supported(s: int, d: int) -> bool:
    """Static-shape gate for the fused kernels."""
    return s >= T and s % T == 0 and 1 <= d <= 512


def _tiles_per_instance(k_tiles: int) -> int:
    """Output tiles resolved per program instance (largest divisor of the
    tile count up to VBN_SRG_TPI). Default 1: the on-chip ablation
    (BENCH_NOTES round 2, r2_batch2) measured IDENTICAL time at TPI
    1/2/4/8 — per-instance grid overhead is NOT the kernel's bottleneck
    (the serial rank-search probes are); the knob stays for future
    experiments."""
    import os

    cap = max(1, int(os.environ.get("VBN_SRG_TPI", "1")))
    for r in range(min(cap, k_tiles), 0, -1):
        if k_tiles % r == 0:
            return r
    return 1


def _prep_blocks(cum: jax.Array, values: jax.Array):
    """Window-block the CDF + values into one [B, K, rows, 128] array.

    Pads two spare windows (CDF = 2.0 > any position) so window pairs and
    the overflow walk always stay inside the array, pads the feature dim
    to the next ODD count (rows = 4*(dp+1) must be a multiple of the
    sublane tile 8; an 8-row pad would multiply the dominant array by up
    to 8x), and lane-blocks both (windows as 4 rows x 128 lanes).
    """
    b, s_in = cum.shape
    d = values.shape[-1]
    cum = jnp.concatenate(
        [cum, jnp.full((b, 2 * W), 2.0, jnp.float32)], axis=1
    )
    dp = d if d % 2 == 1 else d + 1
    vals = jnp.concatenate(
        [
            values.astype(jnp.float32),
            jnp.zeros((b, s_in, dp - d), jnp.float32),
        ],
        axis=2,
    )
    vals = jnp.concatenate(
        [vals, jnp.zeros((b, 2 * W, dp), jnp.float32)], axis=1
    )
    kw = (s_in + 2 * W) // W
    cum = cum.reshape(b, kw, _CB, _LB)
    vals = (
        vals.reshape(b, kw, _CB, _LB, dp)
        .transpose(0, 1, 4, 2, 3)
        .reshape(b, kw, dp * _CB, _LB)
    )
    rows = _CB + dp * _CB
    assert rows % 8 == 0, rows
    return jnp.concatenate([cum, vals], axis=2), dp, rows


def _unblock_out(out: jax.Array, b: int, s_out: int, dp: int, d: int):
    """[B, K, rows_out, 128] quarter-blocked -> [B, S_out, d]."""
    nq = T // _LB
    k_tiles = s_out // T
    return (
        out[:, :, : nq * dp]
        .reshape(b, k_tiles, nq, dp, _LB)
        .transpose(0, 1, 2, 4, 3)
        .reshape(b, s_out, dp)[..., :d]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def systematic_resample_gather(
    key: jax.Array,
    weights: jax.Array,  # [B, S] nonneg, need not be normalized
    values: jax.Array,  # [B, S, D]
    interpret: bool = False,
) -> jax.Array:
    """Systematic resampling of ``values`` by ``weights`` -> [B, S, D].

    Ancestors are ``searchsorted(cum, (j + u0)/S, side='right')`` — never
    materialized; values are copied bit-exactly by in-register gathers.
    """
    b, s = weights.shape
    d = values.shape[-1]
    assert srg_supported(s, d), (s, d)
    u0 = jax.random.uniform(key, (b, 1), jnp.float32)
    cum = _norm_cum(weights)
    inv_s = jnp.float32(1.0 / s)

    # Per-tile window pointers: the block of each tile's first ancestor.
    # Tiny searchsorted (B * S/T queries) — same f32 position formula as
    # the kernel, so ranks are consistent bit-for-bit.
    k_tiles = s // T
    u_grid = jnp.minimum(
        (
            jnp.arange(k_tiles, dtype=jnp.float32)[None, :]
            * jnp.float32(T)
        )
        * inv_s
        + u0 * inv_s,
        jnp.float32(_POS_MAX),
    )
    a0 = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cum, u_grid
    )
    p = (a0 // W).astype(jnp.int32)  # [B, K] in [0, S/W]

    blocks, dp, rows = _prep_blocks(cum, values)
    nq = T // _LB
    rows_out = -(-(nq * dp) // 8) * 8
    r = _tiles_per_instance(k_tiles)
    in_specs = []
    for j in range(r):
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, _LB),
                lambda bb, kk, u0r, pr, _j=j: (bb, pr[bb, kk * r + _j], 0, 0),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, _LB),
                lambda bb, kk, u0r, pr, _j=j: (
                    bb, pr[bb, kk * r + _j] + 1, 0, 0,
                ),
            )
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, k_tiles // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r * rows_out, _LB),
            lambda bb, kk, u0r, pr: (bb, kk, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, _LB), jnp.float32),
            pltpu.VMEM((rows, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_srg_kernel, s=s, dp=dp, r=r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, k_tiles // r, r * rows_out, _LB), jnp.float32
        ),
        interpret=interpret,
    )(u0, p, *([blocks] * (2 * r)), blocks)
    out = out.reshape(b, k_tiles, rows_out, _LB)
    return _unblock_out(out, b, s, dp, d).astype(values.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sorted_gather(
    cum: jax.Array,  # [B, S_in] sorted, normalized (last element 1.0)
    pos: jax.Array,  # [B, S_out] sorted positions
    values: jax.Array,  # [B, S_in, D]
    interpret: bool = False,
) -> jax.Array:
    """Inverse-CDF pick for *sorted* positions -> [B, S_out, D].

    ``out[b, j] = values[b, searchsorted(cum[b], pos'[b, j], 'right')]``
    with ``pos' = clip(pos, 0, 1 - 2**-24)`` (so the pick always lands on
    a real row). Same merge kernel as systematic resampling, with the
    positions streamed per output tile instead of computed in closed
    form. Requires S_in % 512 == 0 == S_out % 512.
    """
    b, s_in = cum.shape
    s_out = pos.shape[1]
    d = values.shape[-1]
    assert srg_supported(s_in, d) and s_out % T == 0 and s_out >= T
    pos = jnp.clip(pos.astype(jnp.float32), 0.0, _POS_MAX)
    k_tiles = s_out // T
    a0 = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(
        cum, pos[:, ::T]
    )
    p = (a0 // W).astype(jnp.int32)
    blocks, dp, rows = _prep_blocks(cum, values)
    nq = T // _LB
    rows_out = -(-(nq * dp) // 8) * 8
    r = _tiles_per_instance(k_tiles)
    pos_blocks = pos.reshape(b, k_tiles, nq, _LB)
    in_specs = [
        pl.BlockSpec((1, r, nq, _LB), lambda bb, kk, pr: (bb, kk, 0, 0)),
    ]
    for j in range(r):
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, _LB),
                lambda bb, kk, pr, _j=j: (bb, pr[bb, kk * r + _j], 0, 0),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, _LB),
                lambda bb, kk, pr, _j=j: (bb, pr[bb, kk * r + _j] + 1, 0, 0),
            )
        )
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, k_tiles // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r * rows_out, _LB), lambda bb, kk, pr: (bb, kk, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, _LB), jnp.float32),
            pltpu.VMEM((rows, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_spg_kernel, dp=dp, r=r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, k_tiles // r, r * rows_out, _LB), jnp.float32
        ),
        interpret=interpret,
    )(p, pos_blocks, *([blocks] * (2 * r)), blocks)
    out = out.reshape(b, k_tiles, rows_out, _LB)
    return _unblock_out(out, b, s_out, dp, d).astype(values.dtype)


def sorted_gather_xla(
    cum: jax.Array, pos: jax.Array, values: jax.Array
) -> jax.Array:
    """Reference semantics for ``sorted_gather`` in plain XLA."""
    s_in = cum.shape[1]
    pos = jnp.clip(pos.astype(jnp.float32), 0.0, _POS_MAX)
    idx = jax.vmap(
        lambda c, q: jnp.searchsorted(c, q, side="right")
    )(cum, pos)
    idx = jnp.clip(idx, 0, s_in - 1).astype(jnp.int32)
    return jnp.take_along_axis(values, idx[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def multinomial_resample_gather(
    key: jax.Array,
    weights: jax.Array,  # [B, S] nonneg, need not be normalized
    values: jax.Array,  # [B, S, D]
    interpret: bool = False,
) -> jax.Array:
    """I.i.d. multinomial resampling via sorted uniform order statistics.

    Normalized partial sums of S+1 iid Exp(1) variables are the order
    statistics of S iid U(0,1) draws, so the inverse-CDF picks through the
    sorted-merge kernel produce a multiset of ancestors identical in
    distribution to ``torch.multinomial`` draws (the reference's RIS
    semantics, ``vbn/inference/resampled_importance_sampling.py:33-41``) —
    only the particle ORDER differs, and resampled particles are
    exchangeable. Replaces the per-draw ``searchsorted`` lowering
    (~1.7 s at 8 x 1M on v5e) with one merge pass.
    """
    b, s = weights.shape
    cum = _norm_cum(weights)
    # NOTE: guards must be normal-range f32 — TPUs flush subnormals
    # (e.g. 1e-38) to zero, silently disabling them.
    e = jax.random.exponential(key, (b, s + 1), jnp.float32)
    if cumsum_available():
        c = cumsum_pallas(e, monotone=True)
    else:
        c = jnp.cumsum(e, axis=1)
    pos = c[:, :s] / jnp.maximum(c[:, -1:], 1e-20)
    return sorted_gather(cum, pos, values, interpret=interpret)


def systematic_resample_gather_xla(
    key: jax.Array, weights: jax.Array, values: jax.Array
) -> jax.Array:
    """Same semantics in plain XLA (CPU/test path, and unsupported shapes).

    Uses the identical f32 position formula so ancestors match the kernel
    bit-for-bit.
    """
    b, s = weights.shape
    u0 = jax.random.uniform(key, (b, 1), jnp.float32)
    cum = _norm_cum(weights)
    inv_s = jnp.float32(1.0 / s)
    u = jnp.minimum(
        jnp.arange(s, dtype=jnp.float32)[None, :] * inv_s + u0 * inv_s,
        jnp.float32(_POS_MAX),
    )
    idx = jax.vmap(
        lambda c, p: jnp.searchsorted(c, p, side="right")
    )(cum, u)
    idx = jnp.clip(idx, 0, s - 1).astype(jnp.int32)
    return jnp.take_along_axis(values, idx[..., None], axis=1)


def srg_available() -> bool:
    """Default-on for non-CPU backends; VBN_RESAMPLE_PALLAS=0 opts out."""
    import os

    if os.environ.get("VBN_RESAMPLE_PALLAS", "1") != "1":
        return False
    return jax.default_backend() not in ("cpu",)
