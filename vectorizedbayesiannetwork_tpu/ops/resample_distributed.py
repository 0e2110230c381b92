"""Distributed systematic/multinomial resampling over a sharded particle axis.

SURVEY §5.8 lists "multinomial resampling across all particles ->
all-gather or distributed systematic resampling" as the reduction point
for the reference's single-device form
(``/root/reference/vbn/inference/resampled_importance_sampling.py:33-41``).
This module implements the distributed form with FIXED shapes and bounded
memory — no global all-gather of the particle values:

- The global CDF exists only as ``local inclusive cumsum + exclusive
  per-shard offset``; the offsets come from one tiny ``all_gather`` of
  per-shard weight sums over the particle axis.
- Each output shard owns a contiguous block of output positions. Because
  systematic (and sorted-uniform multinomial) positions are monotone, the
  ancestors each source shard contributes are a contiguous, per-shard
  window — so a ``ppermute`` ring rotates every source shard's (cdf,
  values) past every output shard exactly once. At step r a shard claims
  the positions whose target mass falls inside the visiting shard's CDF
  span and picks rows with a LOCAL sorted gather (the fused Pallas merge
  kernel when available, ``ops/resample_pallas.py::sorted_gather``; XLA
  take-along-axis otherwise, e.g. on the CPU dryrun mesh).
- Peak memory is 2x the local shard (the resident and visiting windows),
  traffic is one full rotation of the values — the lower bound for a
  resampling whose ancestors may live anywhere.

Positions use the raw-mass predicate ``cum >= u * total`` so no global
normalization pass is needed; per visiting shard the window is
renormalized locally, which preserves the predicate exactly in f32 up to
the same rounding the single-device kernel performs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resample_pallas import sorted_gather, srg_available, srg_supported
from .scan_pallas import cumsum_available, cumsum_pallas

_POS_MAX = 1.0 - 2.0**-24


def _local_cumsum(x: jax.Array) -> jax.Array:
    if cumsum_available():
        return cumsum_pallas(x.astype(jnp.float32), monotone=True)
    return jnp.cumsum(x.astype(jnp.float32), axis=1)


def _ring_pick(
    q: jax.Array,  # [B_l, s_out] target masses, monotone per row
    cum_l: jax.Array,  # [B_l, s_l] local inclusive cumsum (raw mass)
    v_l: jax.Array,  # [B_l, s_l, D]
    sums: jax.Array,  # [n_p, B_l] per-shard masses
    axis_name: str,
) -> jax.Array:
    n_p = sums.shape[0]
    me = jax.lax.axis_index(axis_name)
    offs = jnp.cumsum(sums, axis=0) - sums  # exclusive [n_p, B_l]
    s_l, d = v_l.shape[1], v_l.shape[2]
    use_kernel = srg_available() and srg_supported(s_l, d) and (
        q.shape[1] % 512 == 0 and q.shape[1] >= 512
    )
    out = jnp.zeros(q.shape + (d,), v_l.dtype)
    cw, vw = cum_l, v_l
    perm = [(i, (i - 1) % n_p) for i in range(n_p)]  # shift left
    for r in range(n_p):
        src = (me + r) % n_p
        lo = jnp.take(offs, src, axis=0)  # [B_l]
        mass = jnp.maximum(jnp.take(sums, src, axis=0), 1e-20)
        # side='right' ancestor predicate (first cum > q), matching the
        # single-device merge kernel: src owns q in [lo, lo + mass).
        mine = (q >= lo[:, None]) & (q < (lo + mass)[:, None])
        # Monotone local positions in [0, 1): clipping keeps sortedness.
        pos = jnp.clip((q - lo[:, None]) / mass[:, None], 0.0, _POS_MAX)
        cn = jnp.minimum(cw / mass[:, None], 1.0)
        if use_kernel:
            picked = sorted_gather(cn, pos, vw)
        else:
            rank = jax.vmap(
                lambda c, p: jnp.searchsorted(c, p, side="right")
            )(cn, pos)
            rank = jnp.clip(rank, 0, s_l - 1)
            picked = jnp.take_along_axis(vw, rank[..., None], axis=1)
        out = jnp.where(mine[..., None], picked, out)
        if r < n_p - 1:
            cw = jax.lax.ppermute(cw, axis_name, perm)
            vw = jax.lax.ppermute(vw, axis_name, perm)
    return out


def _shard_body(
    key: jax.Array,
    weights: jax.Array,  # local [B_l, s_l]
    values: jax.Array,  # local [B_l, s_l, D]
    *,
    method: str,
    particle_axis: str,
    data_axis: str,
):
    ax = particle_axis
    n_p = jax.lax.psum(1, ax)
    me = jax.lax.axis_index(ax)
    b_l, s_l = weights.shape
    s = s_l * n_p
    w = jnp.maximum(weights.astype(jnp.float32), 0.0)
    cum_l = _local_cumsum(w)
    sums = jax.lax.all_gather(cum_l[:, -1], ax)  # [n_p, B_l]
    total = jnp.sum(sums, axis=0)  # [B_l] raw global mass
    # Per-GLOBAL-row randomness: fold the data-shard index so rows on
    # different data shards draw independently, while every particle
    # shard of one row agrees (key and data index are identical there).
    row_key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
    if method == "systematic":
        u0 = jax.random.uniform(row_key, (b_l, 1), jnp.float32)
        t = (me * s_l + jnp.arange(s_l, dtype=jnp.float32))[None, :]
        u = (t + u0) / s  # my output slots' quantiles, monotone
    else:  # multinomial via sorted uniform order statistics
        e = jax.random.exponential(
            jax.random.fold_in(row_key, me), (b_l, s_l), jnp.float32
        )
        ec = _local_cumsum(e)
        esums = jax.lax.all_gather(ec[:, -1], ax)  # [n_p, B_l]
        tail = jax.random.exponential(
            jax.random.fold_in(row_key, n_p), (b_l,), jnp.float32
        )
        e_tot = jnp.sum(esums, axis=0) + tail  # Z_{S+1}
        e_off = (jnp.cumsum(esums, axis=0) - esums)[me]  # [B_l]
        u = (ec + e_off[:, None]) / jnp.maximum(e_tot[:, None], 1e-20)
    q = jnp.minimum(u, _POS_MAX) * total[:, None]
    return _ring_pick(q, cum_l, values, sums, ax)


def distributed_resample_gather(
    key: jax.Array,
    weights: jax.Array,  # [B, S] global
    values: jax.Array,  # [B, S, D] global
    mesh,
    *,
    method: str = "systematic",
    data_axis: str = "data",
    particle_axis: str = "particle",
) -> jax.Array:
    """Resample ``values`` by ``weights`` with the particle axis sharded.

    Callable inside a jitted program (shard_map composes under jit). The
    caller must ensure B divides the data-axis size and S the
    particle-axis size (``distributed_resample_supported``).
    """
    from functools import partial

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    body = partial(
        _shard_body,
        method=method,
        particle_axis=particle_axis,
        data_axis=data_axis,
    )
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),
            P(data_axis, particle_axis),
            P(data_axis, particle_axis, None),
        ),
        out_specs=P(data_axis, particle_axis, None),
    )(key, weights, values)


def distributed_resample_supported(mesh, b: int, s: int, *,
                                   data_axis: str = "data",
                                   particle_axis: str = "particle") -> bool:
    if mesh is None:
        return False
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_d = sizes.get(data_axis, 1)
    n_p = sizes.get(particle_axis, 1)
    return b % max(n_d, 1) == 0 and s % max(n_p, 1) == 0 and n_p >= 1
