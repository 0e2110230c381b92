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


def test_dynamic_masks_on_scan_form(monkeypatch):
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
                "name": "likelihood_weighting",
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
