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

- Each output tile's input-window pointer comes from a tiny searchsorted
  over the S/W per-window CDF maxima (``_window_pointers`` — a broadcast
  compare-count, not a binary search over the full CDF). The pointers
  ride a scalar-prefetch grid spec, so Pallas's pipeline double-buffers
  the data-dependent window DMAs like ordinary blocks and the DMA latency
  is hidden.
- In-kernel, each position's ancestor *rank* inside its two-window pair
  is resolved by an 8-ary HIERARCHY instead of a bit-by-bit binary
  search: windows are pre-tiled into a transposed layout where the 8
  consecutive entries of any "column" sit in the 8 sublanes of one lane,
  so ONE in-register lane gather (``tpu.dynamic_gather``) fetches a
  query's whole 8-candidate span and a sublane compare-count resolves 3
  rank bits at once. Three stages cover the 1024-entry pair: a
  broadcast compare against the 16 supercolumn maxima (4 bits, no
  gather), one gather into the transposed column-maxima (3 bits), one
  gather into the transposed CDF (3 bits). The earlier binary-search
  form cost 7 serial two-gather probe rounds per 128 queries; gather
  rounds measure ~15 VPU cycles each on v5e, so the hierarchy removes
  ~70% of the search's cycle budget (BENCH_NOTES round-2 merge-kernel
  section).
- Values are stored in the same transposed layout, so the final copy is
  one lane gather of the 8-entry span plus a 3-level sublane select
  tree — bit-exact f32 copies, no MXU, no index materialization.
- A tile whose ancestor span exceeds the prefetched pair (pathological
  weight crowds) falls back to a manual-DMA window walk in the same
  kernel; the ``prev_last`` ordering invariant keeps every output row
  written exactly once, and walk pointers clamp to the last real pair
  (the final window holds cum == 1.0 > every position, so the walk
  always terminates in range — no sentinel windows are materialized).

Raw windows stream in as padding-free ``[B, KW, 4, 128]`` cum and
``[B, KW, DD, 4, 128]`` value arrays (pure reshapes of the natural
inputs), and the transposed hierarchical layout is built IN-REGISTER per
tile (``_build_block``: static lane-gathers + lane-mask selects). Round
2 built the layout XLA-side into a ``[B, K, rows, 128]`` array instead;
that prep's small-tile transposes ran 15-20x over their traffic
speed-of-light and dominated the kernel's total (~9 of 22.7 ms at 8x1M
— BENCH_NOTES round-3 decomposition; moving the build in-kernel
measured 19.4 -> 16.0 ms at d=1 and 38.0 -> 22.0 ms at d=8).

Semantics match ``searchsorted(cum, u, side='right')`` exactly in f32 (the
reference form in ``ops/resample.py`` computes the same ancestors via
``ceil``/histogram up to fp rounding of the same predicate; reference
semantics: ``/root/reference/vbn/inference/resampled_importance_sampling.py:33-41``).
"""

from __future__ import annotations

import functools
import os

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
_SC = 8  # supercolumns per window (64 entries each)
_HDR = 16  # header rows per window block: 8 supercolumn-last broadcast
#            rows + 8 transposed-CDF/column-last rows


def _window_pointers(cum: jax.Array, queries: jax.Array) -> jax.Array:
    """Window index of each query's first ancestor: searchsorted(cum, q,
    'right') // W, computed WITHOUT searching the full [B, S] CDF.

    ``a0 // W == #{j : cum[(j+1)W - 1] <= q}`` (every fully-below window
    contributes W ranks), so the pointer is a searchsorted over the S/W
    per-window maxima only. With ~2k windows and ~2k queries, a direct
    broadcast compare-count (one fused reduction over ~4M bools per batch
    row) beats XLA's gather-based binary search by ~50x at 8 x 1M
    (measured 8.2 ms -> ~0.15 ms; the full-CDF form pays ~20 serial
    rounds of random HBM gathers).
    """
    wm = cum[:, W - 1 :: W]  # [B, S/W] per-window maxima
    p = jnp.sum(
        wm[:, None, :] <= queries[:, :, None], axis=-1, dtype=jnp.int32
    )
    # Clamp so the prefetched pair (p, p+1) stays inside the real
    # windows; positions are < 1.0 == cum[:, -1], so the final pair
    # always covers any clamped query (the in-kernel ``prev_last`` guard
    # makes re-scanned windows harmless).
    return jnp.minimum(p, cum.shape[1] // W - 2).astype(jnp.int32)


_QUANT = jnp.float32(2.0**23)


def _norm_cum(weights: jax.Array) -> jax.Array:
    """Normalized inclusive CDF, shared by the fused kernels AND the XLA
    reference paths so ancestor predicates stay bit-consistent.

    For S <= 2**20, normalized weights are rounded to exact multiples of
    2**-23 first: every partial sum is then exactly representable in f32
    (the normalized total is ~1 < 2, so sums stay within 24 mantissa
    bits of the 2**-23 quantum), so ANY summation grouping gives the
    same, exactly nondecreasing CDF — the Pallas cumsum can skip its
    monotone max-scan pass (half its cost). The threshold keeps a
    quantum <= 1/8 of the uniform weight 1/S, bounding the per-particle
    relative selection-probability error at ~6% worst case and the
    deleted tail mass well below Monte-Carlo noise (the round-2 advisor
    measured ~8% of total mass silently rounding to zero for
    heavy-tailed weights with the old 2**-22 quantum at its old 2**22
    threshold, where a quantum EQUALED the uniform weight). Larger S
    takes the monotone-scan path with ordinary f32 rounding (~1e-4
    cumulative drift, fixed at the endpoint by the final
    renormalization)."""
    w = weights.astype(jnp.float32)
    if w.shape[1] <= 1 << 20:
        # Quantized-exact path (uniform weights stay >= 8 quanta here,
        # and a quantum is re-normalized away below).
        total = jnp.sum(w, axis=1, keepdims=True)
        w = jnp.round(
            w / jnp.maximum(total, 1e-20) * _QUANT
        ) * (1.0 / _QUANT)
        monotone = False
    else:
        monotone = True  # exactness bound (k + m <= 24 bits) would break
    if cumsum_available():
        cum = cumsum_pallas(w, monotone=monotone)
    else:
        cum = jnp.cumsum(w, axis=1)
    return cum / jnp.maximum(cum[:, -1:], 1e-20)


def _raw_windows(cum: jax.Array, values: jax.Array):
    """Padding-free raw window arrays for the in-kernel layout build.

    Returns (cum_w [B,KW,4,128], val_w [B,KW,DD,4,128], dd). Pure
    reshapes of the natural [B,S]/[B,S,D] arrays (plus one chunky
    feature-axis transpose for D > 1), replacing ``_prep_blocks``'s
    XLA-side small-tile transposes, which ran 15-20x over their traffic
    speed-of-light (~9 ms of the round-2 kernel's 22.7 ms total at
    8x1M, BENCH_NOTES round-3 decomposition).
    """
    b, s = cum.shape
    d = values.shape[-1]
    kw = s // W
    dd = d + (d % 2)
    cum_w = cum.reshape(b, kw, 4, _LB)
    v = values.astype(jnp.float32)
    if d == 1:
        vt = v.reshape(b, kw, 1, 4, _LB)
    else:
        vt = v.reshape(b, kw, 4, _LB, d).transpose(0, 1, 4, 2, 3)
    if dd != d:
        vt = jnp.concatenate(
            [vt, jnp.zeros((b, kw, dd - d, 4, _LB), jnp.float32)], axis=2
        )
    return cum_w, vt, dd


def _hier_header(cw):
    """[4,128] natural cum window -> [16,128] hierarchical header rows
    (rows 0:8 supercolumn-lasts broadcast; rows 8:16 = colt | clt | 0),
    bit-identical to ``_prep_blocks``'s layout, built with static
    lane-gathers + lane-mask selects (Mosaic rejects the (4,128)->(64,8)
    shape cast a direct transpose would need)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LB), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LB), 0)
    hdr = jnp.zeros((8, _LB), jnp.float32)
    for r in range(4):
        src = jnp.broadcast_to(cw[r : r + 1, :], (8, _LB))
        # colt lanes 16r..16r+15: entry 8*(l-16r)+s of source row r
        idx = jnp.clip(8 * (lane - 16 * r) + sub, 0, _LB - 1)
        g = jnp.take_along_axis(src, idx, axis=1, mode="promise_in_bounds")
        m = (lane >= 16 * r) & (lane < 16 * (r + 1))
        hdr = jnp.where(m, g, hdr)
        # clt lanes 64:72: entry 8*(8*(l-64)+s)+7
        e = 8 * (8 * (lane - 64) + sub) + 7
        idx = jnp.clip(e - _LB * r, 0, _LB - 1)
        g = jnp.take_along_axis(src, idx, axis=1, mode="promise_in_bounds")
        m = (
            (lane >= 64)
            & (lane < 72)
            & (e >= _LB * r)
            & (e < _LB * (r + 1))
        )
        hdr = jnp.where(m, g, hdr)
    # supercolumn-lasts as an independent gather chain (deriving them
    # from the built clt row measured neutral-to-worse: it serializes
    # on hdr and costs the ILP the 4-source form gets for free)
    scb = jnp.zeros((8, _LB), jnp.float32)
    for r in range(4):
        src = jnp.broadcast_to(cw[r : r + 1, :], (8, _LB))
        e = 64 * sub + 63  # supercolumn-last entry per sublane row
        idx = jnp.clip(e - _LB * r, 0, _LB - 1)
        g = jnp.take_along_axis(src, idx, axis=1, mode="promise_in_bounds")
        m = (e >= _LB * r) & (e < _LB * (r + 1))
        scb = jnp.where(m, g, scb)
    return jnp.concatenate([scb, hdr], axis=0)


def _hier_vrows(vw, p: int):
    """[DD,4,128] raw value window -> [8,128] transposed pair-row block
    for feature pair ``p`` (feature 2p at lanes 0:64, 2p+1 at 64:128),
    matching ``_prep_blocks``'s vt layout bit-for-bit."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LB), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LB), 0)
    out = jnp.zeros((8, _LB), jnp.float32)
    for h in (0, 1):
        f = 2 * p + h
        e = 8 * (lane - 64 * h) + sub
        for r in range(4):
            src = jnp.broadcast_to(vw[f, r : r + 1, :], (8, _LB))
            idx = jnp.clip(e - _LB * r, 0, _LB - 1)
            g = jnp.take_along_axis(
                src, idx, axis=1, mode="promise_in_bounds"
            )
            m = (
                (lane >= 64 * h)
                & (lane < 64 * h + 64)
                & (e >= _LB * r)
                & (e < _LB * (r + 1))
            )
            out = jnp.where(m, g, out)
    return out


def _build_block(cw, vw, dd: int):
    """Raw (cum [4,128], values [DD,4,128]) window -> the [rows,128]
    hierarchical block ``_pair_pick`` consumes (identical layout to the
    removed XLA-side ``_prep_blocks``)."""
    parts = [_hier_header(cw)]
    for p in range(dd // 2):
        parts.append(_hier_vrows(vw, p))
    return jnp.concatenate(parts, axis=0)


def _prebuild_kernel(c_ref, v_ref, out_ref, *, dd: int, g: int):
    """Build ``g`` windows' hierarchical blocks in one instance."""
    for j in range(g):
        out_ref[0, j] = _build_block(c_ref[0, j], v_ref[0, j], dd)


def _prebuild_blocks(cum_w, val_w, dd: int, interpret: bool):
    """One-pass window-layout build: each window's hierarchical block is
    constructed ONCE (vs twice per pair when built in-register per tile —
    with T == W every window serves ~2 tiles) and streamed back for the
    merge kernel to consume directly. The round-2 XLA-side prep died on
    small-tile transposes (15-20x over traffic SOL); this pass runs the
    SAME in-register build the r3 kernel uses, just hoisted so the merge
    kernel becomes pure rank search. Extra HBM traffic: one write + one
    read of ~6 rows per 4-row window (~0.5 ms at 8x1M d=1), bought
    against ~half the merge kernel's in-register gather budget.
    """
    b, kw = cum_w.shape[:2]
    rows = _HDR + 8 * (dd // 2)
    g = 8
    while kw % g:
        g //= 2
    return pl.pallas_call(
        functools.partial(_prebuild_kernel, dd=dd, g=g),
        grid=(b, kw // g),
        in_specs=[
            pl.BlockSpec((1, g, 4, _LB), lambda bb, kk: (bb, kk, 0, 0)),
            pl.BlockSpec(
                (1, g, dd, 4, _LB), lambda bb, kk: (bb, kk, 0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, g, rows, _LB), lambda bb, kk: (bb, kk, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, kw, rows, _LB), jnp.float32),
        interpret=interpret,
    )(cum_w, val_w)


def _prebuild_enabled() -> bool:
    """Default ON (VBN_SRG_PREBUILD=0 reverts to per-tile in-register
    builds for A/B measurement). PROCESS-LEVEL knob: it is read at trace
    time inside jitted entry points, so toggling it mid-process is
    ignored once a shape has compiled — run each A/B arm in its own
    process (as benchmarking scripts do)."""
    import os

    return os.environ.get("VBN_SRG_PREBUILD", "1") == "1"


def _value_pair(blk0, blk1, fidx):
    """Feature ``fidx``'s transposed value pair, [8, 128]: column c holds
    entries 8c..8c+7 of the pair (two features pack per 8-row block)."""
    base = _HDR + 8 * (fidx // 2)
    half = 64 * (fidx % 2)
    return jnp.concatenate(
        [
            blk0[base : base + 8, half : half + 64],
            blk1[base : base + 8, half : half + 64],
        ],
        axis=1,
    )


def _sublane_pick(g, sa):
    """g [8, 128]; sa [1, 128] int32 in [0, 8) -> g[sa[l], l] per lane.

    3-level select tree (cheaper than a sublane ``dynamic_gather``:
    gather rounds measure ~15 VPU cycles, the tree ~6)."""
    t = jnp.where(jnp.broadcast_to(sa >= 4, (4, _LB)), g[4:8], g[0:4])
    t = jnp.where(jnp.broadcast_to((sa & 2) > 0, (2, _LB)), t[2:4], t[0:2])
    return jnp.where((sa & 1) > 0, t[1:2], t[0:1])


def _srg_ablate() -> str:
    """VBN_SRG_ABLATE: trace-time cost-decomposition switch (round-4
    VERDICT next #7 — measure before rewriting). Modes remove stages of
    the rank search so on-chip deltas attribute the kernel's time:

      ""       full kernel (production; the only correct mode)
      "ranks"  rank search complete, value gathers skipped
      "sc"     supercolumn counts only (column/entry probes skipped)
      "stream" no search at all — block streaming + output writes

    Profiling only: outputs are WRONG in every non-empty mode, and the
    flag is read at trace time (use a fresh process per mode — the jit
    cache does not key on it). See benchmarking/srg_profile.py.
    """
    return os.environ.get("VBN_SRG_ABLATE", "")


def _pair_pick(blk0, blk1, uqs, u_last, prev_last, acc, d):
    """Resolve one two-window pair against the tile's positions.

    blk0/blk1: [rows, 128] hierarchical window blocks (see
    ``_prep_blocks``); uqs: list of [1, 128] sorted position quarters;
    u_last/prev_last: scalars; acc: quarter-blocked [rows_out, 128].
    Returns (acc', covered, pair_max).

    Rank per query = #{pair entries <= u}, resolved 8-ary:
    supercolumn count (broadcast compare, 4 bits) -> column count (one
    gather into transposed column-lasts, 3 bits) -> entry count (one
    gather into the transposed CDF, 3 bits).
    """
    scl = jnp.concatenate([blk0[0:_SC], blk1[0:_SC]], axis=0)  # [16,128]
    colt = jnp.concatenate(
        [blk0[_SC:_HDR, 0:64], blk1[_SC:_HDR, 0:64]], axis=1
    )  # [8, 128] transposed CDF: column c = entries 8c..8c+7
    clt = jnp.concatenate(
        [
            blk0[_SC:_HDR, 64:72],
            blk1[_SC:_HDR, 64:72],
            jnp.zeros((8, _LB - 16), jnp.float32),
        ],
        axis=1,
    )  # [8, 128] transposed column-lasts in lanes 0:16 ([s, t] = last of
    #    column 8t+s); zero-padded to a full vreg (Mosaic's dynamic_gather
    #    requires indices shaped like the source)
    nq = T // _LB
    ablate = _srg_ablate()
    # STAGE-MAJOR evaluation: all quarters' supercolumn counts, then all
    # their column probes, then entry probes, then value picks — the
    # structural form of the round-3 "interleave quarters for ILP" idea.
    # Measured NEUTRAL vs quarter-major on v5e (14.18 vs 14.12 ms at
    # 8x1M d=1): Mosaic's scheduler already overlaps the independent
    # probe chains. Kept because it states the independence explicitly
    # and costs nothing.
    if ablate == "stream":
        scs = [jnp.zeros((1, _LB), jnp.int32) for _ in uqs]
    else:
        scs = [
            jnp.sum((scl <= uq).astype(jnp.int32), axis=0, keepdims=True)
            for uq in uqs
        ]  # [1, 128] full supercolumns each, in [0, 16]
    sccs = [jnp.minimum(sc, 2 * _SC - 1) for sc in scs]
    if ablate in ("sc", "stream"):
        ccs = [jnp.zeros((1, _LB), jnp.int32) for _ in uqs]
        fs = list(ccs)
    else:
        g1s = [
            jnp.take_along_axis(
                clt,
                jnp.broadcast_to(scc, (8, _LB)),
                axis=1,
                mode="promise_in_bounds",
            )
            for scc in sccs
        ]  # row s = column-last of column 8*scc + s
        ccs = [
            jnp.sum((g1 <= uq).astype(jnp.int32), axis=0, keepdims=True)
            for g1, uq in zip(g1s, uqs)
        ]  # boundary supercolumn is not full => cc <= 7 when in range
        cols = [
            jnp.minimum(scc * 8 + cc, _LB - 1)
            for scc, cc in zip(sccs, ccs)
        ]
        g2s = [
            jnp.take_along_axis(
                colt,
                jnp.broadcast_to(col, (8, _LB)),
                axis=1,
                mode="promise_in_bounds",
            )
            for col in cols
        ]  # row s = pair entry 8*col + s
        fs = [
            jnp.sum((g2 <= uq).astype(jnp.int32), axis=0, keepdims=True)
            for g2, uq in zip(g2s, uqs)
        ]
    vpairs = [_value_pair(blk0, blk1, fidx) for fidx in range(d)]
    segs = []
    for oq in range(nq):
        uq = uqs[oq]
        sc, cc, f = scs[oq], ccs[oq], fs[oq]
        in_range = sc < 2 * _SC
        rank = jnp.where(in_range, sc * 64 + cc * 8 + f, 2 * W)
        # found <=> ancestor in this pair: not before it (rows resolved
        # by an earlier pair fail prev_last <= u strictly) and not beyond.
        found_q = jnp.logical_and(prev_last <= uq, rank < 2 * W)
        a = jnp.minimum(rank, 2 * W - 1)  # local ancestor index
        ca = a >> 3
        sa = a & 7
        if ablate:
            # value gathers skipped: fold the rank (or the raw first
            # value rows) into the output so nothing above is DCE'd
            rows_q = [
                rank.astype(jnp.float32) + vpairs[fidx][:1]
                for fidx in range(d)
            ]
        else:
            rows_q = [
                _sublane_pick(
                    jnp.take_along_axis(
                        vpairs[fidx],
                        jnp.broadcast_to(ca, (8, _LB)),
                        axis=1,
                        mode="promise_in_bounds",
                    ),
                    sa,
                )
                for fidx in range(d)
            ]
        picked_q = jnp.concatenate(rows_q, axis=0)  # [d, 128]
        segs.append(
            jnp.where(
                found_q,
                picked_q,
                acc[oq * d : (oq + 1) * d],
            )
        )
    # acc stays in quarter-blocked layout: rows [oq*d + f], lanes = the
    # position within the quarter — the same tiled form the output buffer
    # uses (a plain [.., T, D] pallas output with D < 128 would be
    # physically lane-padded 128/D-fold by Mosaic).
    tail = acc[nq * d :]
    acc = jnp.concatenate(segs + ([tail] if tail.shape[0] else []), axis=0)

    pair_max = jnp.max(scl)  # == last pair entry (sorted)
    covered = pair_max > u_last
    return acc, covered, pair_max


def _srg_kernel(
    u0_ref,  # SMEM [B, 1] f32 (scalar prefetch)
    p_ref,  # SMEM [B, K] int32 window pointers (scalar prefetch)
    *args,  # per tile: 2 prebuilt-block refs ([1,1,rows,128]) in prebuilt
    #         mode, else 4 raw-window refs (cum [1,1,4,128] + values
    #         [1,1,dd,4,128] per window); then the HBM arrays (overflow
    #         walk), the [1, 1, r*rows_out, 128] output block, VMEM
    #         overflow scratch, DMA semaphores
    s: int,
    d: int,
    dd: int,
    r: int,
    k_last: int,
    prebuilt: bool,
):
    """r output tiles per program instance (VBN_SRG_TPI; measured neutral
    at 8x1M — the rank search, not grid overhead, bounds the kernel)."""
    npp = 2 if prebuilt else 4
    blks = args[: npp * r]
    if prebuilt:
        hbm = (args[npp * r],)
        out_ref = args[npp * r + 1]
        scratch = args[npp * r + 2 : npp * r + 5]
    else:
        hbm = (args[npp * r], args[npp * r + 1])
        out_ref = args[npp * r + 2]
        scratch = args[npp * r + 3 : npp * r + 8]
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
    # walk would never find the position. The clamp keeps the kernel
    # bit-identical to the XLA reference (which clamps the same way).
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
            b, p_ref[b, k], uqs, u_last,
            blks[npp * j : npp * (j + 1)],
            hbm, out_ref, scratch, d, dd,
            row0=j * rows_out, rows_out=rows_out, k_last=k_last,
            prebuilt=prebuilt,
        )


def _spg_kernel(
    p_ref,  # SMEM [B, K] int32 window pointers (scalar prefetch)
    *args,  # positions block [1, r, nq, 128], then the pipelined window
    #         refs, HBM arrays, output, scratch, semaphores — see
    #         _srg_kernel
    d: int,
    dd: int,
    r: int,
    k_last: int,
    prebuilt: bool,
):
    pos_ref = args[0]
    npp = 2 if prebuilt else 4
    blks = args[1 : 1 + npp * r]
    if prebuilt:
        hbm = (args[1 + npp * r],)
        out_ref = args[2 + npp * r]
        scratch = args[3 + npp * r : 6 + npp * r]
    else:
        hbm = (args[1 + npp * r], args[2 + npp * r])
        out_ref = args[3 + npp * r]
        scratch = args[4 + npp * r : 9 + npp * r]
    b = pl.program_id(0)
    kk = pl.program_id(1)
    rows_out = out_ref.shape[2] // r
    for j in range(r):
        k = kk * r + j
        pos = pos_ref[0, j]  # [nq, 128]
        uqs = [pos[oq : oq + 1, :] for oq in range(T // _LB)]
        u_last = jnp.max(pos)  # positions are globally sorted
        _resolve_tile(
            b, p_ref[b, k], uqs, u_last,
            blks[npp * j : npp * (j + 1)],
            hbm, out_ref, scratch, d, dd,
            row0=j * rows_out, rows_out=rows_out, k_last=k_last,
            prebuilt=prebuilt,
        )


def _resolve_tile(
    b, start, uqs, u_last, blk_refs, hbm, out_ref, scratch, d, dd,
    row0: int, rows_out: int, k_last: int, prebuilt: bool,
):
    """Shared tile body: prefetched pair + overflow window walk.

    In PREBUILT mode (default) the pipelined refs deliver ready
    hierarchical blocks from the one-pass ``_prebuild_blocks`` kernel —
    the merge kernel is pure rank search. Otherwise refs deliver RAW
    windows (cum [4,128] + values [dd,4,128]) and the layout is built
    in-register per tile (``_build_block``, the round-3 form — kept
    behind VBN_SRG_PREBUILD=0 for A/B). The common case (the prefetched
    pair covers the tile) writes the output directly; the walk lives
    behind ``pl.when`` with the output block as its accumulator, so
    tiles that never overflow don't pay the loop-carried dataflow.
    ``row0``/``rows_out`` select this tile's row band of the output
    block. Walk pointers clamp to ``k_last`` (== K-2): the final real
    pair holds cum == 1.0, so it covers every remaining position and the
    loop terminates in range; re-scanned windows are excluded by the
    ``prev_last`` ordering guard.
    """
    if prebuilt:
        b0_ref, b1_ref = blk_refs
        blk0 = b0_ref[0, 0]
        blk1 = b1_ref[0, 0]
        (blk_raw,) = hbm
        bs0, bs1, sems = scratch
    else:
        c0_ref, v0_ref, c1_ref, v1_ref = blk_refs
        blk0 = _build_block(c0_ref[0, 0], v0_ref[0, 0], dd)
        blk1 = _build_block(c1_ref[0, 0], v1_ref[0, 0], dd)
        cum_raw, val_raw = hbm
        cs0, vs0, cs1, vs1, sems = scratch
    row1 = row0 + rows_out
    acc0 = jnp.zeros((rows_out, _LB), jnp.float32)
    acc1, covered0, pair_max0 = _pair_pick(
        blk0, blk1, uqs, u_last, jnp.float32(-2.0), acc0, d
    )
    out_ref[0, 0, row0:row1] = acc1

    @pl.when(jnp.logical_not(covered0))
    def _walk():
        def overflow(carry):
            step, prev_last, _cov = carry
            widx = jnp.minimum(step, k_last)
            if prebuilt:
                copies = [
                    pltpu.make_async_copy(
                        blk_raw.at[b, widx], bs0, sems.at[0]
                    ),
                    pltpu.make_async_copy(
                        blk_raw.at[b, widx + 1], bs1, sems.at[1]
                    ),
                ]
            else:
                copies = [
                    pltpu.make_async_copy(
                        cum_raw.at[b, widx], cs0, sems.at[0]
                    ),
                    pltpu.make_async_copy(
                        cum_raw.at[b, widx + 1], cs1, sems.at[1]
                    ),
                    pltpu.make_async_copy(
                        val_raw.at[b, widx], vs0, sems.at[2]
                    ),
                    pltpu.make_async_copy(
                        val_raw.at[b, widx + 1], vs1, sems.at[3]
                    ),
                ]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            if prebuilt:
                w0, w1 = bs0[:], bs1[:]
            else:
                w0 = _build_block(cs0[:], vs0[:], dd)
                w1 = _build_block(cs1[:], vs1[:], dd)
            acc, covered, pair_max = _pair_pick(
                w0, w1, uqs, u_last, prev_last,
                out_ref[0, 0, row0:row1], d,
            )
            out_ref[0, 0, row0:row1] = acc
            return step + 2, pair_max, covered

        # The clamp guarantees the loop reaches the final real pair
        # (pair_max == 1.0 > every clamped position) — the step bound is
        # pure defense so a miscompiled/NaN predicate can never livelock
        # the chip (a wedged kernel takes the whole TPU grant with it).
        jax.lax.while_loop(
            lambda c: jnp.logical_and(
                jnp.logical_not(c[2]), c[0] <= k_last + 2
            ),
            overflow,
            (start + 2, pair_max0, covered0),
        )


def srg_supported(s: int, d: int) -> bool:
    """Static-shape gate for the fused kernels.

    ``s >= 2 * W``: the window-pointer prefetch walks (p, p+1) pairs, so a
    single-window input has no valid pair — ``_window_pointers`` would
    clamp every pointer to -1 and the kernel silently gathers garbage
    (round-2 advisor finding: S=512 returned maxerr ~6 while claiming
    support). Single-window sizes take the XLA fallback instead.
    """
    return s >= 2 * W and s % T == 0 and 1 <= d <= 512


def _tiles_per_instance(k_tiles: int) -> int:
    """Output tiles resolved per program instance (largest divisor of the
    tile count up to VBN_SRG_TPI). Default 1: the on-chip ablation
    (BENCH_NOTES round 2) measured IDENTICAL time at TPI 1/2/4/8 —
    per-instance grid overhead is NOT the kernel's bottleneck (the rank
    search is); the knob stays for future experiments."""
    import os

    cap = max(1, int(os.environ.get("VBN_SRG_TPI", "1")))
    for r in range(min(cap, k_tiles), 0, -1):
        if k_tiles % r == 0:
            return r
    return 1


def _unblock_out(out: jax.Array, b: int, s_out: int, d: int):
    """[B, K, rows_out, 128] quarter-blocked -> [B, S_out, d]."""
    nq = T // _LB
    k_tiles = s_out // T
    return (
        out[:, :, : nq * d]
        .reshape(b, k_tiles, nq, d, _LB)
        .transpose(0, 1, 2, 4, 3)
        .reshape(b, s_out, d)
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
    # Same f32 position formula as the kernel, so ranks are consistent
    # bit-for-bit.
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
    p = _window_pointers(cum, u_grid)  # [B, K] in [0, S/W - 2]

    cum_w, val_w, dd = _raw_windows(cum, values)
    nq = T // _LB
    rows_out = -(-(nq * d) // 8) * 8
    r = _tiles_per_instance(k_tiles)
    prebuilt = _prebuild_enabled()
    in_specs = []
    operands = []
    if prebuilt:
        blk_w = _prebuild_blocks(cum_w, val_w, dd, interpret)
        rows_blk = blk_w.shape[2]
        for j in range(r):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows_blk, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows_blk, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0,
                    ),
                )
            )
            operands.extend([blk_w, blk_w])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.append(blk_w)
        scratch_shapes = [
            pltpu.VMEM((rows_blk, _LB), jnp.float32),
            pltpu.VMEM((rows_blk, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        for j in range(r):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 4, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, dd, 4, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 4, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, dd, 4, _LB),
                    lambda bb, kk, u0r, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0, 0,
                    ),
                )
            )
            operands.extend([cum_w, val_w, cum_w, val_w])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.extend([cum_w, val_w])
        scratch_shapes = [
            pltpu.VMEM((4, _LB), jnp.float32),
            pltpu.VMEM((dd, 4, _LB), jnp.float32),
            pltpu.VMEM((4, _LB), jnp.float32),
            pltpu.VMEM((dd, 4, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, k_tiles // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r * rows_out, _LB),
            lambda bb, kk, u0r, pr: (bb, kk, 0, 0),
        ),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(
            _srg_kernel, s=s, d=d, dd=dd, r=r, k_last=s // W - 2,
            prebuilt=prebuilt,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, k_tiles // r, r * rows_out, _LB), jnp.float32
        ),
        interpret=interpret,
    )(u0, p, *operands)
    out = out.reshape(b, k_tiles, rows_out, _LB)
    return _unblock_out(out, b, s, d).astype(values.dtype)


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
    p = _window_pointers(cum, pos[:, ::T])
    cum_w, val_w, dd = _raw_windows(cum, values)
    nq = T // _LB
    rows_out = -(-(nq * d) // 8) * 8
    r = _tiles_per_instance(k_tiles)
    prebuilt = _prebuild_enabled()
    pos_blocks = pos.reshape(b, k_tiles, nq, _LB)
    in_specs = [
        pl.BlockSpec((1, r, nq, _LB), lambda bb, kk, pr: (bb, kk, 0, 0)),
    ]
    operands = [pos_blocks]
    if prebuilt:
        blk_w = _prebuild_blocks(cum_w, val_w, dd, interpret)
        rows_blk = blk_w.shape[2]
        for j in range(r):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows_blk, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows_blk, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0,
                    ),
                )
            )
            operands.extend([blk_w, blk_w])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.append(blk_w)
        scratch_shapes = [
            pltpu.VMEM((rows_blk, _LB), jnp.float32),
            pltpu.VMEM((rows_blk, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        for j in range(r):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 4, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, dd, 4, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j], 0, 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 4, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0,
                    ),
                )
            )
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, dd, 4, _LB),
                    lambda bb, kk, pr, _j=j: (
                        bb, pr[bb, kk * r + _j] + 1, 0, 0, 0,
                    ),
                )
            )
            operands.extend([cum_w, val_w, cum_w, val_w])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        operands.extend([cum_w, val_w])
        scratch_shapes = [
            pltpu.VMEM((4, _LB), jnp.float32),
            pltpu.VMEM((dd, 4, _LB), jnp.float32),
            pltpu.VMEM((4, _LB), jnp.float32),
            pltpu.VMEM((dd, 4, _LB), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, k_tiles // r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, r * rows_out, _LB), lambda bb, kk, pr: (bb, kk, 0, 0)
        ),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(
            _spg_kernel, d=d, dd=dd, r=r, k_last=s_in // W - 2,
            prebuilt=prebuilt,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, k_tiles // r, r * rows_out, _LB), jnp.float32
        ),
        interpret=interpret,
    )(p, *operands)
    out = out.reshape(b, k_tiles, rows_out, _LB)
    return _unblock_out(out, b, s_out, d).astype(values.dtype)


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
