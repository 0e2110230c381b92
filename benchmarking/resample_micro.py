"""Micro-benchmark: systematic-resampling ancestor selection + particle
gather strategies at production shape (B=8, S=1M).

The RIS hot path (ops/resample.py) currently costs ~150 ms/event at 8x1M:
a scatter-add histogram for ancestor indices plus a take_along_axis
per prefix node. Roadmap item: exploit ancestor monotonicity. This script
measures every candidate on the real chip before we commit to one:

  idx/hist        scatter-add histogram + cumsum (current index path)
  idx/anchor      searchsorted at tile anchors only (for a Pallas kernel)
  gather/taa      take_along_axis [B,S,D] (current gather)
  gather/sorted   lax.gather with indices_are_sorted=True
  gather/fill     winner-scatter seeds + associative-scan forward fill
  fused/onehot    Pallas: per-tile windowed one-hot matmul from cum directly

Run: python -m benchmarking.resample_micro [S_log2=20]
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking._timing import measure


def make_inputs(b, s, d, key):
    kw, kv, ku = jax.random.split(key, 3)
    logw = jax.random.normal(kw, (b, s)) * 2.0
    w = jax.nn.softmax(logw, axis=1)
    vals = jax.random.normal(kv, (b, s, d), jnp.float32)
    u0 = jax.random.uniform(ku, (b, 1))
    return w, vals, u0


def t_of(w, u0):
    s = w.shape[1]
    cum = jnp.cumsum(w, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-38)
    return jnp.clip(jnp.ceil(s * cum - u0), 0, s).astype(jnp.int32), cum


@jax.jit
def idx_hist(w, u0):
    t, _ = t_of(w, u0)
    b, s = w.shape
    hist = jnp.zeros((b, s + 1), jnp.int32)
    hist = jax.vmap(lambda h, ti: h.at[ti].add(1))(hist, t)
    a = jnp.cumsum(hist[:, :s], axis=1)
    return jnp.clip(a, 0, s - 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def idx_anchor(w, u0, tile=512):
    """Ancestor index at every tile boundary only: a[k*tile]."""
    _, cum = t_of(w, u0)
    s = w.shape[1]
    k = s // tile + 1
    p = (jnp.arange(k, dtype=jnp.float32)[None, :] * tile + u0) / s
    anchors = jax.vmap(
        lambda c, q: jnp.searchsorted(c, q, side="right")
    )(cum, p)
    return jnp.clip(anchors, 0, s - 1).astype(jnp.int32)


@jax.jit
def gather_taa(vals, a):
    return jnp.take_along_axis(vals, a[..., None], axis=1)


@jax.jit
def gather_sorted(vals, a):
    b, s, d = vals.shape
    out = jax.vmap(
        lambda v, ai: jax.lax.gather(
            v,
            ai[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(0,),
                start_index_map=(0,),
            ),
            slice_sizes=(1, d),
            indices_are_sorted=True,
        )
    )(vals, a)
    return out


@jax.jit
def gather_fill(vals, w, u0):
    """Winner-scatter seeds then forward-fill (no per-element gather)."""
    b, s, d = vals.shape
    t, _ = t_of(w, u0)
    t_prev = jnp.concatenate([jnp.zeros((b, 1), t.dtype), t[:, :-1]], axis=1)
    winner = t > t_prev  # particle owns a nonempty output run
    pos = jnp.where(winner, t_prev, s)  # losers -> OOB, dropped
    seeds = jnp.zeros((b, s, d), vals.dtype)
    seeds = jax.vmap(
        lambda sd, p, v: sd.at[p].set(
            v, mode="drop", indices_are_sorted=True, unique_indices=True
        )
    )(seeds, pos, vals)
    valid = jnp.zeros((b, s), bool)
    valid = jax.vmap(
        lambda va, p: va.at[p].set(
            True, mode="drop", indices_are_sorted=True, unique_indices=True
        )
    )(valid, pos)

    def combine(left, right):
        lv, lm = left
        rv, rm = right
        return jnp.where(rm[..., None], rv, lv), lm | rm

    filled, _ = jax.lax.associative_scan(combine, (seeds, valid), axis=1)
    return filled


def fused_onehot(vals, w, u0, tile=256, chunk=256):
    """Pallas: gather-by-ancestor straight from the weight CDF.

    grid (B, S/tile); per tile DMA cum/vals windows [chunk] from HBM,
    ancestor membership by interval test on the CDF, pick via one-hot
    matmul. Window start comes from prefetched anchors.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = vals.shape
    cum = jnp.cumsum(w, axis=1)
    cum = cum / jnp.maximum(cum[:, -1:], 1e-38)
    anchors = idx_anchor(w, u0, tile)  # [B, S/tile + 1]
    n_tiles = s // tile

    def kernel(anchor_ref, u0_ref, cum_ref, vals_ref, out_ref, acc, sc, sv,
               sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        w0 = anchor_ref[bi, ti]
        w1 = anchor_ref[bi, ti + 1]
        w0 = (w0 // 8) * 8  # sublane-aligned window start
        u = u0_ref[bi, 0]
        j0 = ti * tile
        pj = (jax.lax.broadcasted_iota(jnp.float32, (tile, 1), 0)
              + (j0 + u)) / s
        acc[...] = jnp.zeros_like(acc)
        n_chunks = (w1 - w0) // chunk + 1

        def body(c, _):
            start = jnp.minimum(w0 + c * chunk, s - chunk)
            cp = pltpu.make_async_copy(
                cum_ref.at[bi, pl.ds(start, chunk)], sc, sem.at[0]
            )
            vp = pltpu.make_async_copy(
                vals_ref.at[bi, pl.ds(start, chunk)], sv, sem.at[1]
            )
            cp.start()
            vp.start()
            cp.wait()
            vp.wait()
            cumc = sc[...].reshape(1, chunk)
            prev = jnp.concatenate(
                [jnp.full((1, 1), -jnp.inf, cumc.dtype), cumc[:, :-1]],
                axis=1,
            )
            first = (c == 0) & (start == w0)
            # ancestor i <=> cum_{i-1} <= p_j < cum_i ; at the very first
            # window element, the left edge is the (unseen) cum_{start-1}
            # <= p_j, which anchor choice guarantees.
            left = jnp.where((first is not None) & first,
                             jnp.where(jax.lax.broadcasted_iota(
                                 jnp.int32, (1, chunk), 1) == 0,
                                 -jnp.inf, prev),
                             prev)
            m = ((left <= pj) & (pj < cumc)).astype(jnp.float32)
            acc[...] += jax.lax.dot_general(
                m, sv[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return _

        jax.lax.fori_loop(0, n_chunks, body, None)
        out_ref[...] = acc[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, d), lambda i, j, *_: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, d), jnp.float32),
            pltpu.VMEM((chunk,), jnp.float32),
            pltpu.VMEM((chunk, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(anchors, u0, cum, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.float32),
            grid_spec=grid_spec,
        )(anchors, u0, cum, vals)

    return call(anchors, u0, cum, vals)


def main():
    s = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    b = 8
    print(json.dumps({"device": str(jax.devices()[0]), "B": b, "S": s}))
    for d in (1, 8):
        w, vals, u0 = make_inputs(b, s, d, jax.random.key(0))
        a = idx_hist(w, u0)
        jax.block_until_ready((w, vals, a))
        variants = [
            ("idx/hist", lambda: idx_hist(w, u0)),
            ("idx/anchor", lambda: idx_anchor(w, u0)),
            ("gather/taa", lambda: gather_taa(vals, a)),
            ("gather/sorted", lambda: gather_sorted(vals, a)),
            ("gather/fill", lambda: gather_fill(vals, w, u0)),
        ]
        for name, fn in variants:
            try:
                ms = measure(fn) * 1e3
                print(json.dumps({"d": d, name: round(ms, 2)}), flush=True)
            except Exception as e:  # keep measuring the rest
                print(json.dumps({"d": d, name: f"ERR {e}"[:200]}),
                      flush=True)
        # correctness of fill vs taa
        ref = gather_taa(vals, a)
        fill = gather_fill(vals, w, u0)
        err = float(jnp.max(jnp.abs(ref - fill)))
        print(json.dumps({"d": d, "fill_vs_taa_maxerr": err}), flush=True)


if __name__ == "__main__":
    main()
