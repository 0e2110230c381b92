"""bf16 eval-path mixed precision: close to fp32, contract-preserving.

``compute_dtype="bfloat16"`` casts MLP GEMM inputs to bf16 with fp32
accumulation (``models/_mlp.py``) on the eval paths only; training stays
fp32. These tests pin (a) numeric closeness to the fp32 path and (b) that
the option round-trips through init kwargs / checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectorizedbayesiannetwork_tpu.models._mlp import (
    mlp_apply,
    mlp_init,
    resolve_compute_dtype,
)


def test_resolve_compute_dtype():
    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_compute_dtype("float16x")


def test_mlp_bf16_close_to_fp32():
    key = jax.random.PRNGKey(0)
    net = mlp_init(key, 8, [32, 32], 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 8), jnp.float32)
    y32 = mlp_apply(net, x, "relu")
    y16 = mlp_apply(net, x, "relu", jnp.bfloat16)
    assert y16.dtype == jnp.float32  # fp32 accumulation and output
    # bf16 has ~3 significant decimal digits on the inputs; fp32 accumulate
    # keeps the error at the 1e-2 relative level for unit-scale activations
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), rtol=0.05, atol=0.05
    )


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("gaussian_nn", {}),
        ("mdn", {"n_components": 3}),
    ],
)
def test_nn_cpd_bf16_eval_close(name, kwargs):
    from vectorizedbayesiannetwork_tpu import CPD_REGISTRY

    cls = CPD_REGISTRY[name]
    g = np.random.default_rng(0)
    parents = jnp.asarray(g.normal(size=(512, 2)), jnp.float32)
    x = jnp.asarray(
        0.7 * np.asarray(parents[:, :1]) + 0.1 * g.normal(size=(512, 1)),
        jnp.float32,
    )
    results = {}
    for dt in ("float32", "bfloat16"):
        cpd = cls(2, 1, seed=0, compute_dtype=dt, **kwargs)
        params = cpd.init(jax.random.PRNGKey(0))
        params = cpd.fit(
            params, jax.random.PRNGKey(1), parents, x,
            epochs=3, batch_size=128, lr=1e-3,
        )
        lp = cpd._log_prob_flat(params, x, parents)
        results[dt] = np.asarray(lp)
        assert cpd.get_init_kwargs()["compute_dtype"] == dt
    np.testing.assert_allclose(
        results["bfloat16"], results["float32"], rtol=0.05, atol=0.15
    )
