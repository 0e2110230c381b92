"""Multi-query fusion: infer_posterior_many == sequential infer_posterior.

``VBN.infer_posterior_many`` traces several query programs into ONE XLA
dispatch (``inference/_base.py::CompiledMethod.infer_posterior_many``).
Because both paths draw per-query keys from the same host-side KeyStream in
the same order, fused and sequential results on identically-seeded models
must match exactly.
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import VBN, defaults

B, S = 2, 64

QUERIES = [
    {"target": "x2", "evidence": {"x0": [[0.3]] * B, "x1": [[-0.2]] * B}},
    {"target": "x0", "evidence": {"x2": [[0.4]]}},
    {"target": "x2", "do": {"x0": [[1.0]]}},
    {"target": "x1", "evidence": {}},
]


def _fresh_vbn():
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df())
    return v


@pytest.mark.parametrize(
    "method",
    [
        "monte_carlo_marginalization",
        "likelihood_weighting",
        "importance_sampling",
        "resampled_importance_sampling",
    ],
)
def test_fused_matches_sequential(method):
    v1 = _fresh_vbn()
    v1.set_inference_method(method, n_samples=S)
    fused = v1.infer_posterior_many(QUERIES)

    v2 = _fresh_vbn()
    v2.set_inference_method(method, n_samples=S)
    seq = [v2.infer_posterior(q) for q in QUERIES]

    assert len(fused) == len(QUERIES)
    for (pf, sf), (ps, ss) in zip(fused, seq):
        np.testing.assert_allclose(
            np.asarray(pf), np.asarray(ps), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(sf), np.asarray(ss), rtol=1e-6, atol=1e-7
        )


def test_fused_cache_reuse_and_fresh_randomness():
    v = _fresh_vbn()
    v.set_inference_method("monte_carlo_marginalization", n_samples=S)
    r1 = v.infer_posterior_many(QUERIES)
    assert len(v._inference._fused_cache) == 1
    r2 = v.infer_posterior_many(QUERIES)
    assert len(v._inference._fused_cache) == 1  # same fused program reused
    # fresh keys -> different draws for stochastic queries
    assert not np.allclose(np.asarray(r1[0][1]), np.asarray(r2[0][1]))


def test_fallback_method_sequential():
    # gaussian_exact has host-side fallback chains -> no fused program;
    # the API must still answer every query correctly.
    v = _fresh_vbn()
    v.set_inference_method("gaussian_exact")
    res = v.infer_posterior_many(QUERIES[:2])
    assert len(res) == 2
    for pdf, samples in res:
        assert np.all(np.isfinite(np.asarray(pdf)))
        assert np.asarray(samples).ndim == 3


def _fresh_discrete_vbn():
    import networkx as nx
    import pandas as pd

    g = np.random.default_rng(3)
    n = 2000
    a = g.integers(0, 3, size=n)
    b = (a + g.integers(0, 2, size=n)) % 4
    c = (b + g.integers(0, 3, size=n)) % 2
    df = pd.DataFrame({"a": a, "b": b, "c": c}, dtype=float)
    G = nx.DiGraph([("a", "b"), ("b", "c")])
    v = VBN(G, seed=0)
    conf = lambda k: dict(defaults.cpd("categorical_table"), n_classes=k)
    v.set_learning_method(
        "node_wise", nodes_cpds={"a": conf(3), "b": conf(4), "c": conf(2)}
    )
    v.fit(df)
    return v


DISCRETE_QUERIES = [
    {"target": "c", "evidence": {"a": [[0.0], [2.0]]}},
    {"target": "a", "evidence": {"c": [[1.0]]}},
    {"target": "b", "evidence": {}},
]


@pytest.mark.parametrize(
    "method", ["likelihood_weighting", "importance_sampling",
               "monte_carlo_marginalization"]
)
def test_pmf_path_matches_host_epilogue(method):
    """On-device pmf reduction == host-side weighted bincount, same key."""
    k_max = 4
    v1 = _fresh_discrete_vbn()
    v1.set_inference_method(method, n_samples=S, dynamic_masks=True)
    fused = v1.infer_posterior_pmf(
        DISCRETE_QUERIES, n_classes=k_max, pad_bucket=8
    )
    assert fused is not None
    pmf_rows, spans = fused
    assert pmf_rows.shape == (4, k_max)  # 2 + 1 + 1 rows

    v2 = _fresh_discrete_vbn()
    v2.set_inference_method(method, n_samples=S, dynamic_masks=True)
    many = v2.infer_posterior_many(DISCRETE_QUERIES, pad_bucket=8)
    for (lo, hi, _t), (pdf, samples) in zip(spans, many):
        w = np.maximum(np.nan_to_num(np.asarray(pdf)), 0.0)
        cls = np.clip(
            np.rint(np.asarray(samples)[..., 0]).astype(int), 0, k_max - 1
        )
        expect = np.zeros((hi - lo, k_max))
        for i in range(hi - lo):
            expect[i] = np.bincount(cls[i], weights=w[i], minlength=k_max)
        np.testing.assert_allclose(
            pmf_rows[lo:hi], expect, rtol=1e-4, atol=1e-6
        )


def test_pmf_degrades_internally_without_dynamic_masks():
    """No fused path -> infer_posterior_pmf degrades INTERNALLY (never
    None): rows equal the host-side weighted histogram over
    infer_posterior_many on an identically-seeded model (same KeyStream
    order -> bit-identical draws)."""
    k = 4
    v = _fresh_discrete_vbn()
    v.set_inference_method("likelihood_weighting", n_samples=S)
    out = v.infer_posterior_pmf(DISCRETE_QUERIES, n_classes=k)
    assert out is not None
    rows, spans = out
    assert rows.shape == (4, k)

    v2 = _fresh_discrete_vbn()
    v2.set_inference_method("likelihood_weighting", n_samples=S)
    many = v2.infer_posterior_many(DISCRETE_QUERIES)
    for (lo, hi, _t), (pdf, samples) in zip(spans, many):
        w = np.maximum(np.nan_to_num(np.asarray(pdf, np.float64)), 0.0)
        cls = np.clip(
            np.rint(np.asarray(samples)[..., 0]).astype(int), 0, k - 1
        )
        expect = np.zeros((hi - lo, k))
        for i in range(hi - lo):
            expect[i] = np.bincount(cls[i], weights=w[i], minlength=k)
        np.testing.assert_allclose(rows[lo:hi], expect, rtol=1e-6, atol=1e-9)


def test_pmf_fallback_statistically_matches_fused():
    """The internal stream fallback and the dynamic-mask fused reduction
    estimate the SAME posterior: normalized pmf rows agree within Monte
    Carlo error at equal particle counts (different RNG streams)."""
    k, s = 4, 8192
    v = _fresh_discrete_vbn()
    v.set_inference_method("likelihood_weighting", n_samples=s)
    rows_fb, spans_fb = v.infer_posterior_pmf(DISCRETE_QUERIES, n_classes=k)

    v2 = _fresh_discrete_vbn()
    v2.set_inference_method(
        "likelihood_weighting", n_samples=s, dynamic_masks=True
    )
    rows_fu, spans_fu = v2.infer_posterior_pmf(DISCRETE_QUERIES, n_classes=k)
    assert [tuple(sp) for sp in spans_fb] == [tuple(sp) for sp in spans_fu]

    def norm(r):
        return r / np.maximum(r.sum(axis=1, keepdims=True), 1e-30)

    np.testing.assert_allclose(norm(rows_fb), norm(rows_fu), atol=0.06)


def test_moments_degrade_internally():
    """Methods without a fused moments path still serve (mean, std) rows
    via the internal stream reduction, matching _posterior_stats."""
    v = _fresh_vbn()
    v.set_inference_method("likelihood_weighting", n_samples=S)
    out = v.infer_posterior_moments(QUERIES[:2])
    assert out is not None
    mom, spans = out
    assert mom.shape == (B + 1, 2)

    v2 = _fresh_vbn()
    v2.set_inference_method("likelihood_weighting", n_samples=S)
    many = v2.infer_posterior_many(QUERIES[:2])
    at = 0
    for (lo, hi, _t), (pdf, samples) in zip(spans, many):
        stats = v2._posterior_stats(pdf, samples)
        np.testing.assert_allclose(
            mom[lo:hi, 0], np.asarray(stats["mean"]).ravel(),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            mom[lo:hi, 1], np.asarray(stats["std"]).ravel(),
            rtol=1e-5, atol=1e-6,
        )
        at = hi


def test_stream_fallback_avoids_giant_fused_traces():
    """The internal pmf fallback must NOT row-fuse large query lists:
    infer_posterior_many traces one program per query into one XLA
    computation, which is pathological for big duplicate batches on big
    networks (the round-5 warmup regression: 256 copies of a 724-node
    sweep). Lists > 16 go through the cached per-plan program
    sequentially; the serving-path marker reports the degradation."""
    v = _fresh_discrete_vbn()
    v.set_inference_method("likelihood_weighting", n_samples=S)
    calls = {"many": 0}
    orig = type(v._inference).infer_posterior_many

    def counting(self, vbn, qs, **kw):
        calls["many"] += 1
        return orig(self, vbn, qs, **kw)

    type(v._inference).infer_posterior_many = counting
    try:
        q = {"target": "c", "evidence": {"a": [[0.0]]}}
        rows, spans = v.infer_posterior_pmf([q] * 20, n_classes=4)
    finally:
        type(v._inference).infer_posterior_many = orig
    assert calls["many"] == 0  # sequential cached-program path
    assert rows.shape == (20, 4)
    assert v._last_summary_path == "stream"
    # small lists still fuse
    calls["many"] = 0
    type(v._inference).infer_posterior_many = counting
    try:
        v.infer_posterior_pmf([q] * 4, n_classes=4)
    finally:
        type(v._inference).infer_posterior_many = orig
    assert calls["many"] == 1
