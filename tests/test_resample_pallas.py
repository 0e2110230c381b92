"""Fused systematic resample-gather kernel == XLA reference, bit-exact.

The kernel (ops/resample_pallas.py) claims ancestors identical to
``searchsorted(cum, (j+u0)/S, 'right')`` and bit-exact value copies; pin
both against the plain-XLA path for adversarial weight profiles, including
the degenerate ones that stress the merge-window walk (all mass on the
first/last particle, long runs of zero weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
    srg_supported,
    systematic_resample_gather,
    systematic_resample_gather_xla,
)

B, S, D = 3, 2048, 5


def _profiles():
    key = jax.random.PRNGKey(0)
    rows = []
    # heavy-tailed random weights
    rows.append(
        jax.random.dirichlet(key, jnp.ones((S,)) * 0.3, shape=(B,))
    )
    # uniform
    rows.append(jnp.full((B, S), 1.0 / S))
    # all mass on the last particle (every tile's walk must cross the
    # dead prefix exactly once)
    w = jnp.zeros((B, S)).at[:, -1].set(1.0)
    rows.append(w)
    # all mass on the first particle
    w = jnp.zeros((B, S)).at[:, 0].set(1.0)
    rows.append(w)
    # half the particles dead, alternating blocks
    w = jnp.ones((B, S))
    w = w * (jnp.arange(S)[None, :] // 256 % 2).astype(jnp.float32)
    rows.append(w)
    # mixed rows in one batch: delta / uniform / random
    mixed = jnp.stack(
        [
            jnp.zeros((S,)).at[S // 2].set(1.0),
            jnp.full((S,), 1.0 / S),
            jax.random.dirichlet(jax.random.fold_in(key, 7), jnp.ones((S,))),
        ]
    )
    rows.append(mixed)
    return rows


@pytest.mark.parametrize("case", range(6))
def test_kernel_matches_xla_reference(case):
    weights = _profiles()[case]
    key = jax.random.PRNGKey(42 + case)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (B, S, D))
    got = systematic_resample_gather(key, weights, vals, interpret=True)
    want = systematic_resample_gather_xla(key, weights, vals)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resampled_set_is_weight_proportional():
    """Systematic resampling reproduces counts ~ S * w_i (within 1)."""
    key = jax.random.PRNGKey(3)
    weights = jnp.tile(
        jnp.array([[0.5, 0.25, 0.125, 0.125] + [0.0] * (S - 4)]), (B, 1)
    )
    vals = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[None, :, None], (B, S, D)
    )
    out = systematic_resample_gather(key, weights, vals, interpret=True)
    ids = np.asarray(out[0, :, 0]).astype(int)
    counts = np.bincount(ids, minlength=S)
    for i, w in enumerate([0.5, 0.25, 0.125, 0.125]):
        assert abs(counts[i] - S * w) <= 1
    assert counts[4:].sum() == 0


def test_supported_gate():
    assert srg_supported(2048, 5)
    assert not srg_supported(100, 5)  # S not a tile multiple
    assert not srg_supported(2048, 1024)  # D too wide
    # Single-window S=512 has no (p, p+1) prefetch pair: the kernel
    # clamps every window pointer to -1 and silently gathers garbage
    # (round-2 advisor finding, maxerr ~6.2 vs the XLA reference), so
    # the gate must route it to the XLA fallback.
    assert not srg_supported(512, 5)


def test_single_window_sizes_fall_back_correct():
    """S=512 (and the S=1024 two-window minimum) resample correctly.

    S=512 goes through the XLA fallback (gate above); S=1024 is the
    smallest kernel-supported size and must match the XLA reference.
    """
    from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
        sorted_gather,
        sorted_gather_xla,
        srg_supported as gate,
    )

    key = jax.random.PRNGKey(11)
    for s in (512, 1024):
        w = jax.random.dirichlet(
            jax.random.fold_in(key, s), jnp.ones((s,)) * 0.3, shape=(2,)
        )
        cum = _norm_cum(w)
        pos = jnp.sort(
            jax.random.uniform(jax.random.fold_in(key, s + 1), (2, s)), axis=1
        )
        vals = jax.random.normal(
            jax.random.fold_in(key, s + 2), (2, s, 3)
        )
        want = sorted_gather_xla(cum, pos, vals)
        if gate(s, 3):
            got = sorted_gather(cum, pos, vals, interpret=True)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            assert s == 512  # documented fallback size
        assert np.isfinite(np.asarray(want)).all()


def _norm_cum(w):
    c = jnp.cumsum(w, axis=1)
    return c / jnp.maximum(c[:, -1:], 1e-38)


@pytest.mark.parametrize("case", range(6))
def test_sorted_gather_matches_xla(case):
    from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
        sorted_gather,
        sorted_gather_xla,
    )

    weights = _profiles()[case]
    cum = _norm_cum(weights)
    key = jax.random.PRNGKey(100 + case)
    # sorted random positions, including boundary values 0 and ~1
    pos = jnp.sort(jax.random.uniform(key, (B, S)), axis=1)
    pos = pos.at[:, 0].set(0.0).at[:, -1].set(1.0)
    vals = jax.random.normal(jax.random.fold_in(key, 1), (B, S, D))
    got = sorted_gather(cum, pos, vals, interpret=True)
    want = sorted_gather_xla(cum, pos, vals)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sorted_gather_different_sizes():
    """S_out != S_in: 1024 picks from a 2048-row support."""
    from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
        sorted_gather,
        sorted_gather_xla,
    )

    key = jax.random.PRNGKey(7)
    w = jax.random.dirichlet(key, jnp.ones((S,)), shape=(B,))
    cum = _norm_cum(w)
    pos = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1), (B, 1024)), axis=1)
    vals = jax.random.normal(jax.random.fold_in(key, 2), (B, S, D))
    got = sorted_gather(cum, pos, vals, interpret=True)
    want = sorted_gather_xla(cum, pos, vals)
    assert got.shape == (B, 1024, D)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_multinomial_resample_gather_distribution():
    """Ancestor counts match multinomial expectations (chi-square-ish)."""
    from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
        multinomial_resample_gather,
    )

    key = jax.random.PRNGKey(11)
    probs = [0.4, 0.3, 0.2, 0.1]
    weights = jnp.tile(
        jnp.array([probs + [0.0] * (S - 4)]), (B, 1)
    )
    vals = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.float32)[None, :, None], (B, S, D)
    )
    out = multinomial_resample_gather(key, weights, vals, interpret=True)
    ids = np.asarray(out[:, :, 0]).astype(int)
    counts = np.stack([np.bincount(r, minlength=S) for r in ids])
    assert counts[:, 4:].sum() == 0
    for i, p in enumerate(probs):
        # multinomial sd = sqrt(S p (1-p)) ~ 22 at S=2048; allow 5 sd
        assert np.abs(counts[:, i] - S * p).max() < 5 * np.sqrt(S * p * (1 - p))


def test_high_u0_never_emits_padding():
    """Positions that would round to 1.0 in f32 must still pick a REAL
    particle (regression: the merge walk ran into the 2.0-CDF padding and
    emitted a zero vector when (S-1+u0)/S rounded up to exactly 1.0)."""
    key = jax.random.PRNGKey(0)
    S2 = 1 << 16
    # deterministically find a key whose u0 makes (S-1+u0)/S round to 1.0
    thr = 1.0 - S2 * 2.0**-25
    trigger = None
    for i in range(4096):
        k = jax.random.fold_in(key, i)
        u0 = np.asarray(jax.random.uniform(k, (2, 1), jnp.float32))
        if (u0 >= thr).any():
            pos = np.float32((S2 - 1 + u0.max()) / S2)
            if pos >= 1.0:
                trigger = k
                break
    assert trigger is not None, "no triggering key found"
    w = jnp.full((2, S2), 1.0 / S2)
    vals = jnp.broadcast_to(
        jnp.arange(1, S2 + 1, dtype=jnp.float32)[None, :, None], (2, S2, 1)
    )  # strictly positive: a zero output exposes the padding bug
    got = systematic_resample_gather(trigger, w, vals, interpret=True)
    want = systematic_resample_gather_xla(trigger, w, vals)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(np.min(np.asarray(got))) >= 1.0
