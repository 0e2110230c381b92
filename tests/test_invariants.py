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


def test_systematic_resample_matches_searchsorted():
    # The search-free histogram form == the textbook searchsorted form,
    # given the same key (same u0 draw).
    from vectorizedbayesiannetwork_tpu.ops.resample import (
        systematic_resample_indices,
    )

    g = np.random.default_rng(0)
    b, s = 3, 257
    w = g.random((b, s)).astype(np.float32) ** 4  # spiky weights
    w /= w.sum(axis=1, keepdims=True)
    w = jnp.asarray(w)
    key = jax.random.PRNGKey(7)
    idx = np.asarray(systematic_resample_indices(key, w))

    u0 = np.asarray(jax.random.uniform(key, (b, 1)))
    positions = (u0 + np.arange(s)[None, :]) / s
    cum = np.cumsum(np.asarray(w), axis=1)
    cum = cum / cum[:, -1:]
    ref = np.stack(
        [np.searchsorted(cum[i], positions[i], side="left") for i in range(b)]
    ).clip(0, s - 1)
    np.testing.assert_array_equal(idx, ref)
    # ancestor counts are within 1 of S*w (the systematic guarantee)
    counts = np.stack([np.bincount(idx[i], minlength=s) for i in range(b)])
    np.testing.assert_array_less(
        np.abs(counts - s * np.asarray(w)), 1.0 + 1e-6
    )


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


def test_kde_pallas_direct_path_unaligned_support():
    # Small-D direct branch with N not a lane multiple (exercises the
    # -inf mask padding) — exact fp32, so tight tolerance.
    from vectorizedbayesiannetwork_tpu.ops.kde_pallas import (
        kde_log_prob_fused,
    )

    g = np.random.default_rng(1)
    n, m = 200, 97
    data_p = jnp.asarray(g.normal(size=(n, 3)).astype(np.float32))
    data_x = jnp.asarray(g.normal(size=(n, 2)).astype(np.float32))
    log_mask = jnp.where(jnp.arange(n) < 150, 0.0, -1e30).astype(jnp.float32)
    qp = jnp.asarray(g.normal(size=(m, 3)).astype(np.float32))
    qx = jnp.asarray(g.normal(size=(m, 2)).astype(np.float32))
    ys, ps = 0.5, 0.3
    fused = kde_log_prob_fused(
        qx, qp, data_x, data_p, log_mask, ys, ps, interpret=True
    )
    from vectorizedbayesiannetwork_tpu.ops.kde_kernel import (
        _pairwise_kernel_logits,
    )

    ky = _pairwise_kernel_logits(qx, data_x, ys)
    kp = _pairwise_kernel_logits(qp, data_p, ps) + log_mask[None, :]
    ref = jax.scipy.special.logsumexp(
        kp + ky, axis=1
    ) - jax.scipy.special.logsumexp(kp, axis=1)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_kde_pallas_root_kernel():
    from vectorizedbayesiannetwork_tpu.ops.kde_pallas import (
        kde_log_prob_root_fused,
    )
    from vectorizedbayesiannetwork_tpu.ops.kde_kernel import (
        _pairwise_kernel_logits,
    )

    g = np.random.default_rng(3)
    n, m = 200, 77
    data_x = jnp.asarray(g.normal(size=(n, 2)).astype(np.float32))
    log_mask = jnp.where(jnp.arange(n) < 160, 0.0, -1e30).astype(jnp.float32)
    qx = jnp.asarray(g.normal(size=(m, 2)).astype(np.float32))
    ys = 0.4
    fused = kde_log_prob_root_fused(qx, data_x, log_mask, ys, interpret=True)
    ky = _pairwise_kernel_logits(qx, data_x, ys) + log_mask[None, :]
    ref = jax.scipy.special.logsumexp(ky, axis=1)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_kde_pallas_sample_pick_kernel():
    from vectorizedbayesiannetwork_tpu.ops.kde_pallas import (
        kde_sample_picked_fused,
    )

    g = np.random.default_rng(4)
    n, m = 160, 3000
    data_p = jnp.asarray(g.normal(size=(n, 1)).astype(np.float32))
    data_x = jnp.asarray(g.normal(size=(n, 2)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    gum = jax.random.gumbel(key, (m, n), jnp.float32)

    # 1. single valid support point -> every pick is that point's value
    mask_one = jnp.where(jnp.arange(n) == 7, 0.0, -1e30).astype(jnp.float32)
    picked = kde_sample_picked_fused(
        key, None, data_p, data_x, mask_one, 0.5, m, interpret=True,
        gumbel=gum,
    )
    assert picked.shape == (m, 2)
    np.testing.assert_allclose(
        np.asarray(picked),
        np.broadcast_to(np.asarray(data_x)[7], (m, 2)),
        atol=1e-6,
    )

    # 2. tight parent kernel -> picks the support point nearest each parent
    q = jnp.asarray(g.normal(size=(m, 1)).astype(np.float32))
    picked = kde_sample_picked_fused(
        key, q, data_p, data_x, jnp.zeros((n,), jnp.float32),
        1e-4, m, interpret=True, gumbel=gum,
    )
    nearest = np.argmin(
        np.abs(np.asarray(q) - np.asarray(data_p)[:, 0][None, :]), axis=1
    )
    frac = np.mean(
        np.all(
            np.isclose(
                # atol covers MXU f32 (bf16x3) rounding when the suite
                # runs on a real TPU instead of the CPU mesh
                np.asarray(picked), np.asarray(data_x)[nearest], atol=1e-4
            ),
            axis=1,
        )
    )
    assert frac > 0.99, frac

    # 3. uniform mask, no parents: pick == argmax of the supplied Gumbel
    # field, i.e. exact parity with the XLA gumbel-argmax path
    picked = kde_sample_picked_fused(
        key, None, data_p, data_x, jnp.zeros((n,), jnp.float32),
        0.5, m, interpret=True, gumbel=gum,
    )
    idx_ref = np.argmax(np.asarray(gum), axis=1)
    np.testing.assert_allclose(
        np.asarray(picked), np.asarray(data_x)[idx_ref], atol=1e-4
    )


def test_kde_pallas_gemm_path_large_d():
    # D > 32 takes the MXU bf16x3 branch (feature dims padded to 128).
    from vectorizedbayesiannetwork_tpu.ops.kde_pallas import (
        _DIRECT_D,
        kde_log_prob_fused,
    )

    g = np.random.default_rng(2)
    n, m, d = 128, 64, _DIRECT_D + 4
    data_p = jnp.asarray(g.normal(size=(n, d)).astype(np.float32))
    data_x = jnp.asarray(g.normal(size=(n, 1)).astype(np.float32))
    log_mask = jnp.zeros((n,), jnp.float32)
    qp = jnp.asarray(g.normal(size=(m, d)).astype(np.float32))
    qx = jnp.asarray(g.normal(size=(m, 1)).astype(np.float32))
    ys, ps = 0.6, 0.8
    fused = kde_log_prob_fused(
        qx, qp, data_x, data_p, log_mask, ys, ps, interpret=True
    )
    from vectorizedbayesiannetwork_tpu.ops.kde_kernel import (
        _pairwise_kernel_logits,
    )

    ky = _pairwise_kernel_logits(qx, data_x, ys)
    kp = _pairwise_kernel_logits(qp, data_p, ps)
    ref = jax.scipy.special.logsumexp(
        kp + ky, axis=1
    ) - jax.scipy.special.logsumexp(kp, axis=1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-3)
