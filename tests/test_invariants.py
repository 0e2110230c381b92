"""Cross-cutting invariants (parity: tests/test_performance_upgrades.py).

- batched row-0 == single row-0 under the same key-stream position (the
  reference resets torch's global seed; here counter-based keys + JAX's
  partitionable threefry give the same bits for the shared prefix);
- no NaNs in outputs;
- ESS-triggered IS fallback;
- KDE chunked == full (the matmul kernel's chunking is exercised whenever
  M > the chunk size; equivalence vs the naive form is asserted).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import CPD_REGISTRY, VBN, defaults


@pytest.fixture(scope="module")
def vbn():
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df())
    return v


def test_batched_vs_single_consistency(vbn):
    vbn.set_inference_method("likelihood_weighting", n_samples=64)
    ev = np.array([[0.3], [0.9]], np.float32)
    vbn._keys.set_state(500)
    wb, sb = vbn.infer_posterior({"target": "x0", "evidence": {"x2": ev}})
    vbn._keys.set_state(500)
    ws, ss = vbn.infer_posterior(
        {"target": "x0", "evidence": {"x2": ev[:1]}}
    )
    np.testing.assert_allclose(np.asarray(wb)[0], np.asarray(ws)[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(sb)[0], np.asarray(ss)[0])


def test_no_nans_in_outputs(vbn):
    vbn.set_inference_method("importance_sampling", n_samples=32)
    w, s = vbn.infer_posterior(
        {"target": "x2", "evidence": {"x0": np.random.randn(3, 1)}}
    )
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(s)).all()


def test_is_ess_fallback_triggers(vbn):
    vbn.set_inference_method("importance_sampling", n_samples=12)
    vbn._inference.ess_threshold = 1.1  # force
    vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.2], [0.4]]}})
    assert vbn._inference._last_fallback is True


def test_kde_chunked_matches_naive():
    # Exercise the chunked matmul path (M > _CHUNK) against the naive form.
    from vectorizedbayesiannetwork_tpu.ops import kde_kernel

    g = np.random.default_rng(0)
    n, m = 100, kde_kernel._CHUNK + 123
    data_p = g.normal(size=(n, 1)).astype(np.float32)
    data_x = np.sin(data_p).astype(np.float32)
    valid = np.ones(n, np.float32)
    qp = g.normal(size=(m, 1)).astype(np.float32)
    qx = g.normal(size=(m, 1)).astype(np.float32)
    ys, ps = 0.4, 0.3
    lp = np.asarray(
        kde_kernel.kde_log_prob(
            jnp.asarray(qx), jnp.asarray(qp), jnp.asarray(data_x),
            jnp.asarray(data_p), jnp.log(jnp.asarray(valid)), ys, ps,
        )
    )

    def k(diff, s):
        return -0.5 * (
            (diff / s) ** 2 + math.log(2 * math.pi) + 2 * math.log(s)
        )

    ky = k(qx[:, None, :] - data_x[None], ys).sum(-1)
    kp = k(qp[:, None, :] - data_p[None], ps).sum(-1)

    def lse(a):
        mx = a.max(axis=1, keepdims=True)
        return (mx + np.log(np.exp(a - mx).sum(axis=1, keepdims=True)))[:, 0]

    ref = lse(kp + ky) - lse(kp)
    np.testing.assert_allclose(lp, ref, atol=2e-4)


def test_public_outputs_have_no_grad(vbn):
    # analogue of tests/test_public_outputs.py: results are concrete values
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=16)
    pdf, s = vbn.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[0.1]], "x1": [[0.0]]}}
    )
    assert isinstance(pdf, jax.Array) and isinstance(s, jax.Array)
    # stop_gradient applied: differentiating through returns zeros
    def f(v):
        return jnp.sum(jax.lax.stop_gradient(pdf) * v)

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g))


def test_kde_pallas_interpret_matches_matmul():
    # The fused Pallas kernel in interpreter mode == the matmul path.
    from vectorizedbayesiannetwork_tpu.ops.kde_kernel import (
        _pairwise_kernel_logits,
    )
    from vectorizedbayesiannetwork_tpu.ops.kde_pallas import (
        kde_log_prob_fused,
    )

    g = np.random.default_rng(0)
    n, m = 256, 300
    data_p = jnp.asarray(g.normal(size=(n, 2)).astype(np.float32))
    data_x = jnp.asarray(g.normal(size=(n, 1)).astype(np.float32))
    log_mask = jnp.zeros((n,), jnp.float32)
    qp = jnp.asarray(g.normal(size=(m, 2)).astype(np.float32))
    qx = jnp.asarray(g.normal(size=(m, 1)).astype(np.float32))
    ys, ps = 0.35, 0.45
    fused = kde_log_prob_fused(
        qx, qp, data_x, data_p, log_mask, ys, ps, interpret=True
    )
    ky = _pairwise_kernel_logits(qx, data_x, ys)
    kp = _pairwise_kernel_logits(qp, data_p, ps)
    import jax as _jax

    ref = _jax.scipy.special.logsumexp(
        kp + ky, axis=1
    ) - _jax.scipy.special.logsumexp(kp, axis=1)
    # bf16x3 cross terms: ~5e-4 absolute in log space (vs ~0.1 for the
    # single bf16 pass the decomposition replaces)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-3)
