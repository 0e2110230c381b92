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
    # Zero-pad feature dims to the 128-lane width: mathematically neutral
    # for both the cross GEMM and the squared norms, and it prevents the
    # Mosaic lane padding of tiny trailing dims from entering reductions.
    dx = 128
    dp = 128

    def featpad(a, d_to):
        return jnp.concatenate(
            [a, jnp.zeros((a.shape[0], d_to - a.shape[1]), a.dtype)], axis=1
        )

    x = featpad(x, dx)
    parents = featpad(parents, dp)
    data_x = featpad(data_x, dx)
    data_p = featpad(data_p, dp)
    tm = _tile_rows(n)
    n_tiles = -(-m // tm)
    m_pad = n_tiles * tm
    if m_pad != m:
        pad = m_pad - m
        x = jnp.concatenate([x, jnp.zeros((pad, dx), x.dtype)], axis=0)
        parents = jnp.concatenate(
            [parents, jnp.zeros((pad, dp), parents.dtype)], axis=0
        )

    kernel = functools.partial(
        _kde_cond_kernel,
        inv2y=1.0 / (2.0 * y_scale * y_scale),
        inv2p=1.0 / (2.0 * p_scale * p_scale),
        const_y=-dx_orig
        * (0.5 * math.log(2.0 * math.pi) + math.log(y_scale)),
        const_p=-dp_orig
        * (0.5 * math.log(2.0 * math.pi) + math.log(p_scale)),
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


def pallas_available() -> bool:
    """Default-on for non-CPU backends; VBN_KDE_PALLAS=0 opts out.

    Measured on TPU v5e: matches the exact difference-form log density to
    5.5e-4 (bf16x3 cross terms) and runs 512k x 2k in 23 ms vs 2075 ms for
    the HBM-round-tripping matmul+chunk path (~90x). CPU tests exercise the
    same kernel via interpret mode.
    """
    import os

    if os.environ.get("VBN_KDE_PALLAS", "1") != "1":
        return False
    return jax.default_backend() not in ("cpu",)
