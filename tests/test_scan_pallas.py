"""Single-pass Pallas cumsum == jnp.cumsum (tolerance) + monotone."""

import jax
import jax.numpy as jnp
import pytest

from vectorizedbayesiannetwork_tpu.ops.scan_pallas import cumsum_pallas


@pytest.mark.parametrize("shape", [(3, 70000), (2, 65536), (1, 100)])
@pytest.mark.parametrize("monotone", [False, True])
def test_cumsum_matches_jnp(shape, monotone):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    got = cumsum_pallas(x, monotone=monotone, interpret=True)
    want = jnp.cumsum(x, axis=1)
    rel = jnp.max(jnp.abs(got - want) / jnp.maximum(want, 1e-6))
    assert float(rel) < 1e-5
    if monotone:
        assert bool(jnp.all(jnp.diff(got, axis=1) >= 0))


def test_cumsum_signed_values():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4096))
    got = cumsum_pallas(x, interpret=True)
    want = jnp.cumsum(x, axis=1)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-3
