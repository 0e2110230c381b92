"""Fused Pallas KDE kernel: distance GEMM + logsumexp entirely in VMEM.

The chunked matmul path (``kde_kernel.py``) still writes/reads the
``[chunk, N]`` kernel-logit tiles through HBM between the GEMM and the
logsumexp. At 1M particles x 4096 support points that is ~32GB of HBM
traffic per call — the dominant cost. This kernel fuses the whole per-tile
pipeline (two small-K GEMMs on the MXU, mask add, two row logsumexps) in
VMEM, so HBM traffic drops to the inputs and the [M] output.

Grid: 1-D over M tiles (``TM`` rows); the full support (N x D, N <= ~8k)
is resident in VMEM for every program instance. CPU/test environments use
``interpret=True`` (same code path, interpreter semantics).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256  # query rows per program instance (upper bound; see _tile_rows)


def _tile_rows(n: int) -> int:
    """M-tile height bounded so the [TM, N] f32 intermediates fit VMEM.

    The kernel keeps several [TM, N] buffers live (two cross-term
    accumulators + the summed logits); at TM=256, N=4096 that is ~16.7MB —
    just over the 16MB scoped-VMEM limit (measured OOM on v5e). Capping
    TM*N at 512k elements keeps the worst case ~halved with no measurable
    throughput cost (the MXU stays saturated from TM>=64 at these K).
    """
    return max(64, min(TM, (1 << 19) // max(1, n)))


def _precise_cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """fp32-accurate a @ b.T via explicit bf16x3 decomposition.

    The MXU multiplies bf16; this Mosaic version drops the
    ``precision=HIGHEST`` request on ``dot_general``, and single-pass bf16
    error (~0.4% relative) is fatal for exponentiated distances. Splitting
    each operand into bf16 high/low parts and summing three passes
    reproduces fp32 accuracy explicitly.
    """

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _logsumexp_rows(a: jax.Array) -> jax.Array:
    """Row logsumexp [TM, N] -> [TM, 1] (guarded against -inf rows)."""
    mx = jnp.max(a, axis=1, keepdims=True)
    mx = jnp.maximum(mx, -1e30)
    return mx + jnp.log(
        jnp.sum(jnp.exp(a - mx), axis=1, keepdims=True)
    )


def _kde_cond_kernel(
    q_ref, p_ref, datax_ref, datap_ref, mask_ref, out_ref,
    *, inv2y, inv2p, const_y, const_p
):
    q = q_ref[:]  # [TM, Dx]
    p = p_ref[:]  # [TM, Dp]
    dx = datax_ref[:]  # [N, Dx]
    dp = datap_ref[:]  # [N, Dp]
    log_mask = mask_ref[:]  # [1, N]

    cross_y = _precise_cross(q, dx)  # [TM, N]
    sq_y = (
        jnp.sum(q * q, axis=1, keepdims=True)
        - 2.0 * cross_y
        + jnp.sum(dx * dx, axis=1)[None, :]
    )
    ky = -sq_y * inv2y + const_y

    cross_p = _precise_cross(p, dp)
    sq_p = (
        jnp.sum(p * p, axis=1, keepdims=True)
        - 2.0 * cross_p
        + jnp.sum(dp * dp, axis=1)[None, :]
    )
    kp = -sq_p * inv2p + const_p + log_mask

    num = _logsumexp_rows(kp + ky)
    den = _logsumexp_rows(kp)
    out_ref[:] = num - den


_DIRECT_D = 32  # feature-dim cutoff for the VPU distance path


def _kde_cond_kernel_direct(
    q_ref, p_ref, dxt_ref, dpt_ref, mask_ref, out_ref,
    *, inv2y, inv2p, const_y, const_p, dxn, dpn
):
    """Small-D variant: squared distances by direct broadcast on the VPU.

    KDE feature dims are tiny (Dx/Dp of 1–3 for typical networks); the GEMM
    path pads K to the 128-lane width and runs bf16x3, i.e. ~2·128·3 MACs
    per (row, support) pair where the math needs ~3·D VPU ops — ~250x excess
    multiply work at D=1. Support points arrive TRANSPOSED ([D, N]) so each
    feature is a lane-contiguous row and the diff broadcast is
    [TM,1] - [1,N]; exact fp32 with no decomposition tricks. Measured on
    v5e (honest completion-synced timing, BENCH_NOTES.md): 512k x 2048
    conditional log density 31.4 -> 13.5 ms; 1M x 4096 65.2 -> 33.2 ms
    (~2x over the GEMM kernel, ~1.6-2x over the XLA chunked path).
    """
    q = q_ref[:]  # [TM, dx_pad]
    p = p_ref[:]  # [TM, dp_pad]
    dxt = dxt_ref[:]  # [dx_pad8, N]
    dpt = dpt_ref[:]  # [dp_pad8, N]
    log_mask = mask_ref[:]  # [1, N]

    tm = q.shape[0]
    n = dxt.shape[1]
    sq_y = jnp.zeros((tm, n), jnp.float32)
    for d in range(dxn):
        diff = q[:, d : d + 1] - dxt[d : d + 1, :]
        sq_y += diff * diff
    ky = -sq_y * inv2y + const_y

    sq_p = jnp.zeros((tm, n), jnp.float32)
    for d in range(dpn):
        diff = p[:, d : d + 1] - dpt[d : d + 1, :]
        sq_p += diff * diff
    kp = -sq_p * inv2p + const_p + log_mask

    num = _logsumexp_rows(kp + ky)
    den = _logsumexp_rows(kp)
    out_ref[:] = num - den


def _kde_root_kernel_direct(
    q_ref, dxt_ref, mask_ref, out_ref, *, inv2y, const_y, dxn
):
    """Root-node KDE: logsumexp over support of the target kernel only."""
    q = q_ref[:]
    dxt = dxt_ref[:]
    log_mask = mask_ref[:]
    tm = q.shape[0]
    n = dxt.shape[1]
    sq_y = jnp.zeros((tm, n), jnp.float32)
    for d in range(dxn):
        diff = q[:, d : d + 1] - dxt[d : d + 1, :]
        sq_y += diff * diff
    ky = -sq_y * inv2y + const_y + log_mask
    out_ref[:] = _logsumexp_rows(ky)


@functools.partial(jax.jit, static_argnames=("y_scale", "interpret"))
def kde_log_prob_root_fused(
    x: jax.Array,  # [M, Dx]
    data_x: jax.Array,  # [N, Dx]
    log_mask: jax.Array,  # [N]
    y_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Root-node masked ``logsumexp_n log N(x_m - t_n; 0, y_scale)`` -> [M].

    (Caller subtracts ``log n_eff``.) Same direct-VPU distance form as the
    conditional kernel; only worthwhile for small D, and root KDE dims are
    always small.
    """
    m = x.shape[0]
    n = data_x.shape[0]
    dx_orig = x.shape[1]
    n_pad = -(-n // 128) * 128
    d8x = -(-dx_orig // 8) * 8
    dxt = jnp.concatenate(
        [
            data_x,
            jnp.zeros((n, d8x - dx_orig), data_x.dtype),
        ],
        axis=1,
    ).T
    if n_pad != n:
        dxt = jnp.concatenate(
            [dxt, jnp.zeros((d8x, n_pad - n), dxt.dtype)], axis=1
        )
        log_mask = jnp.concatenate(
            [log_mask, jnp.full((n_pad - n,), -1e30, log_mask.dtype)]
        )
    x = jnp.concatenate(
        [x, jnp.zeros((m, 128 - dx_orig), x.dtype)], axis=1
    )
    tm = _tile_rows(n_pad)
    n_tiles = -(-m // tm)
    m_pad = n_tiles * tm
    if m_pad != m:
        x = jnp.concatenate(
            [x, jnp.zeros((m_pad - m, 128), x.dtype)], axis=0
        )
    kernel = functools.partial(
        _kde_root_kernel_direct,
        inv2y=1.0 / (2.0 * y_scale * y_scale),
        const_y=-dx_orig
        * (0.5 * math.log(2.0 * math.pi) + math.log(y_scale)),
        dxn=dx_orig,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d8x, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        interpret=interpret,
    )(x, dxt, log_mask[None, :])
    return out[:m, 0]


@functools.partial(
    jax.jit, static_argnames=("y_scale", "p_scale", "interpret")
)
def kde_log_prob_fused(
    x: jax.Array,  # [M, Dx]
    parents: jax.Array,  # [M, Dp]
    data_x: jax.Array,  # [N, Dx]
    data_p: jax.Array,  # [N, Dp]
    log_mask: jax.Array,  # [N]
    y_scale: float,
    p_scale: float,
    interpret: bool = False,
) -> jax.Array:
    m = x.shape[0]
    n = data_x.shape[0]
    dx_orig = x.shape[1]
    dp_orig = parents.shape[1]
    const_y = -dx_orig * (0.5 * math.log(2.0 * math.pi) + math.log(y_scale))
    const_p = -dp_orig * (0.5 * math.log(2.0 * math.pi) + math.log(p_scale))
    inv2y = 1.0 / (2.0 * y_scale * y_scale)
    inv2p = 1.0 / (2.0 * p_scale * p_scale)

    def featpad(a, d_to):
        if a.shape[1] == d_to:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((a.shape[0], d_to - a.shape[1]), a.dtype)], axis=1
        )

    def rowpad(a, rows):
        if a.shape[0] == rows:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)],
            axis=0,
        )

    if max(dx_orig, dp_orig) <= _DIRECT_D:
        # Small-D direct path: support points transposed to [D, N] so each
        # feature is one lane-contiguous row; N padded to the lane width
        # with -inf mask entries (they vanish in both logsumexps).
        n_pad = -(-n // 128) * 128
        d8x = -(-dx_orig // 8) * 8
        d8p = -(-dp_orig // 8) * 8
        dxt = featpad(data_x, d8x).T
        dpt = featpad(data_p, d8p).T
        if n_pad != n:
            dxt = featpad(dxt, n_pad)
            dpt = featpad(dpt, n_pad)
            log_mask = jnp.concatenate(
                [log_mask, jnp.full((n_pad - n,), -1e30, log_mask.dtype)]
            )
        x = featpad(x, 128)
        parents = featpad(parents, 128)
        tm = _tile_rows(n_pad)
        n_tiles = -(-m // tm)
        m_pad = n_tiles * tm
        x = rowpad(x, m_pad)
        parents = rowpad(parents, m_pad)
        kernel = functools.partial(
            _kde_cond_kernel_direct,
            inv2y=inv2y, inv2p=inv2p, const_y=const_y, const_p=const_p,
            dxn=dx_orig, dpn=dp_orig,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tm, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d8x, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d8p, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            interpret=interpret,
        )(x, parents, dxt, dpt, log_mask[None, :])
        return out[:m, 0]

    # Large-D path: zero-pad feature dims to the 128-lane width —
    # mathematically neutral for both the cross GEMM and the squared norms —
    # and compute the cross terms on the MXU (bf16x3 for fp32 accuracy).
    dx = -(-dx_orig // 128) * 128
    dp = -(-dp_orig // 128) * 128
    x = featpad(x, dx)
    parents = featpad(parents, dp)
    data_x = featpad(data_x, dx)
    data_p = featpad(data_p, dp)
    tm = _tile_rows(n)
    n_tiles = -(-m // tm)
    m_pad = n_tiles * tm
    x = rowpad(x, m_pad)
    parents = rowpad(parents, m_pad)

    kernel = functools.partial(
        _kde_cond_kernel,
        inv2y=inv2y, inv2p=inv2p, const_y=const_y, const_p=const_p,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tm, dx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dx), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        interpret=interpret,
    )(x, parents, data_x, data_p, log_mask[None, :])
    return out[:m, 0]


def _kde_pick_body(p, dpt, datax, log_mask, g, *, inv2p, dpn):
    """scores + Gumbel field g + argmax + one-hot GEMM -> picked values."""
    tm = p.shape[0]
    n = dpt.shape[1]
    if dpn:
        sq = jnp.zeros((tm, n), jnp.float32)
        for d in range(dpn):
            diff = p[:, d : d + 1] - dpt[d : d + 1, :]
            sq += diff * diff
        scores = -sq * inv2p + log_mask
    else:
        scores = jnp.broadcast_to(log_mask, (tm, n))
    am = jnp.argmax(scores + g, axis=1)  # [TM]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tm, n), 1) == am[:, None]
    ).astype(jnp.float32)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # bf16x2 on the values only (one-hot is exact in bf16): keeps the
    # picked support values fp32-accurate through the MXU pass.
    d_hi = datax.astype(jnp.bfloat16).astype(jnp.float32)
    return dot(onehot, d_hi) + dot(onehot, datax - d_hi)


def _kde_pick_kernel(
    seed_ref, p_ref, dpt_ref, datax_ref, mask_ref, out_ref, *, inv2p, dpn
):
    """Parent-weighted support pick: scores + in-kernel Gumbel + argmax +
    one-hot GEMM, all in VMEM. Replaces the XLA path (chunked score matmul,
    [chunk,N] Gumbel field, argmax, then a random HBM gather of the picked
    support rows) — the gather alone costs tens of ms at M ~ 500k."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    p = p_ref[:]  # [TM, 128]
    tm = p.shape[0]
    n = dpt_ref.shape[1]
    bits = pltpu.bitcast(pltpu.prng_random_bits((tm, n)), jnp.uint32)
    # top 24 bits -> int32 (Mosaic lacks uint32->f32; the shifted value is
    # non-negative so the bitcast is exact) -> uniform in (2^-25, 1 - 2^-25)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = (bits24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))
    g = -jnp.log(-jnp.log(u))
    out_ref[:] = _kde_pick_body(
        p, dpt_ref[:], datax_ref[:], mask_ref[:], g, inv2p=inv2p, dpn=dpn
    )


def _kde_pick_kernel_extg(
    p_ref, dpt_ref, datax_ref, mask_ref, g_ref, out_ref, *, inv2p, dpn
):
    """Test variant: Gumbel field supplied as an input (the in-kernel PRNG
    primitives have no CPU interpreter lowering)."""
    out_ref[:] = _kde_pick_body(
        p_ref[:], dpt_ref[:], datax_ref[:], mask_ref[:], g_ref[:],
        inv2p=inv2p, dpn=dpn,
    )


@functools.partial(
    jax.jit, static_argnames=("p_scale", "m", "interpret")
)
def kde_sample_picked_fused(
    key: jax.Array,
    parents,  # [M, Dp] or None (root)
    data_p: jax.Array,  # [N, Dp]
    data_x: jax.Array,  # [N, Dx] support target values
    log_mask: jax.Array,  # [N]
    p_scale: float,
    m: int,
    interpret: bool = False,
    gumbel=None,  # [M, N] external Gumbel field (tests only)
) -> jax.Array:
    """Gumbel-argmax support pick -> picked target values [M, Dx]."""
    n, dx_orig = data_x.shape
    dp_orig = 0 if parents is None else parents.shape[1]
    n_pad = -(-n // 128) * 128
    seed = jax.random.bits(key, (1,), "uint32").astype(jnp.int32)

    def featpad(a, d_to):
        if a.shape[1] == d_to:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((a.shape[0], d_to - a.shape[1]), a.dtype)], axis=1
        )

    datax = featpad(data_x, 128)
    if parents is None:
        parents = jnp.zeros((m, 128), jnp.float32)
        dpt = jnp.zeros((8, n), jnp.float32)
        d8p = 8
    else:
        d8p = -(-dp_orig // 8) * 8
        dpt = featpad(data_p, d8p).T
        parents = featpad(parents, 128)
    if n_pad != n:
        dpt = featpad(dpt, n_pad)
        datax = jnp.concatenate(
            [datax, jnp.zeros((n_pad - n, 128), datax.dtype)], axis=0
        )
        log_mask = jnp.concatenate(
            [log_mask, jnp.full((n_pad - n,), -1e30, log_mask.dtype)]
        )
    tm = _tile_rows(n_pad)
    n_tiles = -(-m // tm)
    m_pad = n_tiles * tm
    if m_pad != m:
        parents = jnp.concatenate(
            [parents, jnp.zeros((m_pad - m, 128), parents.dtype)], axis=0
        )
    inv2p = 1.0 / (2.0 * p_scale * p_scale)
    if gumbel is not None:
        g = gumbel
        if n_pad != n:
            g = featpad(g, n_pad)
        if m_pad != m:
            g = jnp.concatenate(
                [g, jnp.zeros((m_pad - m, n_pad), g.dtype)], axis=0
            )
        out = pl.pallas_call(
            functools.partial(
                _kde_pick_kernel_extg, inv2p=inv2p, dpn=dp_orig
            ),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tm, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d8p, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tm, n_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
            interpret=interpret,
        )(parents, dpt, datax, log_mask[None, :], g)
        return out[:m, :dx_orig]

    out = pl.pallas_call(
        functools.partial(_kde_pick_kernel, inv2p=inv2p, dpn=dp_orig),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d8p, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
        interpret=interpret,
    )(seed, parents, dpt, datax, log_mask[None, :])
    return out[:m, :dx_orig]


def pallas_available() -> bool:
    """Default-on for non-CPU backends; VBN_KDE_PALLAS=0 opts out.

    Measured on TPU v5e with completion-synced timing (BENCH_NOTES.md): the
    small-D direct kernel computes 512k x 2048 conditional log density in
    13.5 ms vs 22.2 ms for the XLA matmul+chunk path, 1M x 4096 in 33.2 ms
    vs 66.6 ms; accuracy is exact fp32 (small-D path) or 5.5e-4 (bf16x3
    GEMM path at D > 32). CPU tests exercise the same kernels via interpret
    mode.
    """
    import os

    if os.environ.get("VBN_KDE_PALLAS", "1") != "1":
        return False
    return jax.default_backend() not in ("cpu",)
