"""Mask-dynamic LW: one compiled program serves every evidence pattern.

Static programs specialize on the query's evidence/do masks and target;
``likelihood_weighting(dynamic_masks=True)`` moves those to runtime inputs
(inference/_dynamic_sweep.py). Latent draws fold the same per-node subkeys,
so at equal (B, S) the dynamic program's outputs match the static ones.
"""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from vectorizedbayesiannetwork_tpu import VBN, defaults

S = 256


@pytest.fixture(scope="module")
def vbn():
    g = np.random.default_rng(0)
    n = 4000
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    x3 = 0.8 * x2 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2, "x3": x3})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2"), ("x2", "x3")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in G.nodes},
    )
    v.fit(df)
    return v


QUERIES = [
    {"target": "x2", "evidence": {"x0": [[1.0], [0.0]], "x1": [[0.0], [1.0]]}},
    {"target": "x0", "evidence": {"x3": [[0.5], [-0.5]]}},
    {"target": "x3", "evidence": {"x1": [[0.2], [0.2]]},
     "do": {"x0": [[1.0], [2.0]]}},
    {"target": "x1", "evidence": {}},
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_dynamic_matches_static(vbn, qi):
    q = QUERIES[qi]
    vbn.set_inference_method("likelihood_weighting", n_samples=S)
    counter = vbn._keys.state()
    pdf_s, samp_s = vbn.infer_posterior(q)
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    vbn._keys.set_state(counter)  # same key for both programs
    pdf_d, samp_d = vbn.infer_posterior(q)
    np.testing.assert_allclose(
        np.asarray(pdf_d), np.asarray(pdf_s), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(samp_d), np.asarray(samp_s), rtol=1e-5, atol=1e-6
    )


# MCM queries whose STATIC path is the general sweep (target has a latent
# parent and is not intervened) — only these can match the dynamic program
# draw-for-draw; fast-path queries match in distribution instead.
MCM_GENERAL_QUERIES = [
    {"target": "x3", "evidence": {"x0": [[1.0], [0.0]], "x1": [[0.0], [1.0]]}},
    {"target": "x2", "evidence": {"x0": [[0.5], [-0.5]]}},
    {"target": "x3", "evidence": {"x1": [[0.2], [0.2]]},
     "do": {"x0": [[1.0], [2.0]]}},
]


@pytest.mark.parametrize("qi", range(len(MCM_GENERAL_QUERIES)))
def test_dynamic_mcm_matches_static(vbn, qi):
    q = MCM_GENERAL_QUERIES[qi]
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=S)
    counter = vbn._keys.state()
    pdf_s, samp_s = vbn.infer_posterior(q)
    vbn.set_inference_method(
        "monte_carlo_marginalization", n_samples=S, dynamic_masks=True
    )
    vbn._keys.set_state(counter)
    pdf_d, samp_d = vbn.infer_posterior(q)
    assert pdf_d.shape == pdf_s.shape and samp_d.shape == samp_s.shape
    np.testing.assert_allclose(
        np.asarray(pdf_d), np.asarray(pdf_s), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(samp_d), np.asarray(samp_s), rtol=1e-4, atol=1e-5
    )


def test_dynamic_mcm_direct_path_distribution(vbn):
    """Queries the static method answers via its parents-observed direct
    fast path: the dynamic general sweep must agree in distribution
    (sample mean within MC error) and exactly on the evidence-target pdf."""
    # target x2 with both parents observed: mean = 0.5*x0 - 0.2*x1
    q = {"target": "x2",
         "evidence": {"x0": [[1.0], [0.0]], "x1": [[0.0], [1.0]]}}
    vbn.set_inference_method(
        "monte_carlo_marginalization", n_samples=4096, dynamic_masks=True
    )
    pdf, samp = vbn.infer_posterior(q)
    m = np.asarray(samp)[..., 0].mean(axis=1)
    np.testing.assert_allclose(m, [0.5, -0.2], atol=0.05)


def test_dynamic_mcm_do_target_delta(vbn):
    """do(target): pdf == 1 everywhere and samples == the do value."""
    vbn.set_inference_method(
        "monte_carlo_marginalization", n_samples=S, dynamic_masks=True
    )
    pdf, samp = vbn.infer_posterior(
        {"target": "x2", "evidence": {}, "do": {"x2": [[3.0], [-1.0]]}}
    )
    np.testing.assert_allclose(np.asarray(pdf), 1.0)
    np.testing.assert_allclose(np.asarray(samp)[0], 3.0)
    np.testing.assert_allclose(np.asarray(samp)[1], -1.0)


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_dynamic_is_matches_static(vbn, qi):
    q = QUERIES[qi]
    vbn.set_inference_method("importance_sampling", n_samples=S)
    counter = vbn._keys.state()
    pdf_s, samp_s = vbn.infer_posterior(q)
    fell_s = vbn._inference._last_fallback
    vbn.set_inference_method(
        "importance_sampling", n_samples=S, dynamic_masks=True
    )
    vbn._keys.set_state(counter)
    pdf_d, samp_d = vbn.infer_posterior(q)
    assert vbn._inference._last_fallback == fell_s
    np.testing.assert_allclose(
        np.asarray(pdf_d), np.asarray(pdf_s), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(samp_d), np.asarray(samp_s), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "method", ["monte_carlo_marginalization", "importance_sampling"]
)
def test_dynamic_one_program_and_row_fusion(vbn, method):
    """MCM/IS dynamic: every skeleton rides ONE compiled program, and the
    heterogeneous row-fused dispatch matches per-query answers."""
    vbn.set_inference_method(method, n_samples=S, dynamic_masks=True)
    m = vbn._inference
    m._fn_cache.clear()
    singles = []
    for q in QUERIES[:3]:
        counter = vbn._keys.state()
        singles.append((counter, vbn.infer_posterior(q)))
        assert np.isfinite(np.asarray(singles[-1][1][0])).all()
    assert len(m._fn_cache) == 1
    outs = vbn.infer_posterior_many(QUERIES[:3])
    assert len(outs) == 3
    for (pdf, samp), q in zip(outs, QUERIES[:3]):
        b = len(next(iter(q["evidence"].values()))) if q["evidence"] else 1
        assert pdf.shape[0] == b and np.isfinite(np.asarray(pdf)).all()


def test_one_program_serves_all_patterns(vbn):
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    method = vbn._inference
    method._fn_cache.clear()
    for q in QUERIES[:3]:  # same batch bucket (B=2)
        pdf, samp = vbn.infer_posterior(q)
        assert np.isfinite(np.asarray(pdf)).all()
    # every mask pattern and target rode the SAME compiled program
    # (programs are keyed only by (S, normalize, batch bucket))
    assert len(method._fn_cache) == 1


def test_dynamic_padded_batch(vbn):
    """Odd batch sizes pad to pow2 buckets and slice back."""
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    ev = {"x0": np.linspace(-1, 1, 3).reshape(3, 1),
          "x1": np.zeros((3, 1))}
    pdf, samp = vbn.infer_posterior({"target": "x2", "evidence": ev})
    assert pdf.shape == (3, S) and samp.shape == (3, S, 1)
    # posterior mean tracks 0.5*x0 - 0.2*x1
    w = np.asarray(pdf)
    m = (w / w.sum(1, keepdims=True) * np.asarray(samp)[..., 0]).sum(1)
    np.testing.assert_allclose(m, 0.5 * ev["x0"][:, 0], atol=0.05)


@pytest.mark.parametrize(
    "method", ["likelihood_weighting", "importance_sampling"]
)
def test_dynamic_masks_on_scan_form(monkeypatch, method):
    """Scan-scale categorical net: the dynamic program rides the scan
    sweep with runtime masks — one compile for any evidence pattern, and
    answers match exact ground truth."""
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    from benchmarking.data_gen import domain_schema
    from benchmarking.exact import ancestral_sample, exact_posterior
    from benchmarking.models.vbn_tpu import VBNTpuBenchmarkModel
    from benchmarking.networks import random_bn

    bn = random_bn(15, max_indegree=3, max_card=3, seed=7)
    data = {
        k: v.astype(np.float32).reshape(-1, 1)
        for k, v in ancestral_sample(bn, 20000, 0).items()
    }
    m = VBNTpuBenchmarkModel(
        domain_schema(bn),
        seed=0,
        config={
            "inference": {
                "name": method,
                "n_samples": 8192,
                "dynamic_masks": True,
            }
        },
    )
    m.fit(data)
    method = m.vbn._inference
    method._fn_cache.clear()
    # three different evidence patterns + targets
    pairs = [
        (bn.nodes[-1], {bn.nodes[0]: 0}),
        (bn.nodes[-1], {bn.nodes[1]: 1, bn.nodes[2]: 0}),
        (bn.nodes[0], {bn.nodes[-1]: 0}),
    ]
    for target, ev in pairs:
        pdf, samples = m.vbn.infer_posterior(
            {
                "target": target,
                "evidence": {k: [[float(v)]] for k, v in ev.items()},
            }
        )
        w = np.asarray(pdf)[0]
        s = np.rint(np.asarray(samples)[0, :, 0]).astype(int)
        k = len(bn.states[target])
        pmf = np.bincount(np.clip(s, 0, k - 1), weights=w, minlength=k)
        pmf = pmf / pmf.sum()
        gt = exact_posterior(bn, target, ev)
        np.testing.assert_allclose(pmf, gt, atol=0.06)
    assert len(method._fn_cache) == 1


def test_dynamic_mcm_on_gaussian_scan(vbn, monkeypatch):
    """Gaussian scan form: the in-scan target-density accumulator matches
    the static path's post-hoc target_log_prob evaluation."""
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    q = MCM_GENERAL_QUERIES[0]
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=S)
    vbn._inference._fn_cache.clear()
    counter = vbn._keys.state()
    pdf_s, samp_s = vbn.infer_posterior(q)
    vbn.set_inference_method(
        "monte_carlo_marginalization", n_samples=S, dynamic_masks=True
    )
    vbn._keys.set_state(counter)
    pdf_d, samp_d = vbn.infer_posterior(q)
    np.testing.assert_allclose(
        np.asarray(pdf_d), np.asarray(pdf_s), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(samp_d), np.asarray(samp_s), rtol=1e-4, atol=1e-5
    )


def test_heterogeneous_row_fused_dispatch(vbn):
    """Mixed targets/evidence patterns in ONE row-fused dispatch match the
    per-query dynamic answers."""
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    outs = vbn.infer_posterior_many(QUERIES[:3])
    assert len(outs) == 3
    for (pdf, samp), q in zip(outs, QUERIES[:3]):
        b = len(next(iter(q["evidence"].values()))) if q["evidence"] else 1
        assert pdf.shape[0] == b and np.isfinite(np.asarray(pdf)).all()
    # row-fused posterior means match analytic values for the first query
    pdf, samp = outs[0]
    w = np.asarray(pdf)
    m = (w / w.sum(1, keepdims=True) * np.asarray(samp)[..., 0]).sum(1)
    np.testing.assert_allclose(m, [0.5, -0.2], atol=0.07)
    # single dispatch: one cached fused program for the whole mix
    method = vbn._inference
    method._fn_cache.clear()
    vbn.infer_posterior_many(QUERIES[:3])
    assert len(method._fn_cache) == 1
