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
