"""Fused exact linear-Gaussian conditioning vs closed-form numpy truth.

The device program (inference/_lg_exact.py) and the benchmark ground-truth
generator (benchmarking/gaussian_bn.py) implement the same math through
entirely different routes (batched masked-block solves on device vs numpy
submatrix algebra), so agreement cross-validates both.
"""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from benchmarking.gaussian_bn import random_gaussian
from vectorizedbayesiannetwork_tpu import VBN, defaults


@pytest.fixture(scope="module")
def net_and_vbn():
    bn = random_gaussian(9, seed=3)
    data = bn.sample(60_000, seed=1)
    df = pd.DataFrame({k: v for k, v in data.items()})
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    v = VBN(g, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in bn.nodes},
    )
    v.fit(df)
    v.set_inference_method("gaussian_exact")
    return bn, v


QUERIES = [
    {"target": "x8", "evidence": {"x0": 0.7}},
    {"target": "x0", "evidence": {"x8": -1.2, "x3": 0.4}},   # diagnosis
    {"target": "x5", "evidence": {}},
    {"target": "x6", "do": {"x2": 2.0}},
    {"target": "x7", "evidence": {"x1": 1.0}, "do": {"x0": -1.0}},
    {"target": "x4", "evidence": {"x4": 0.25}},              # clamped target
]


def test_lg_exact_matches_closed_form(net_and_vbn):
    bn, v = net_and_vbn
    qdicts = [
        {
            "target": q["target"],
            "evidence": {
                k: [[val]] for k, val in (q.get("evidence") or {}).items()
            },
            "do": {k: [[val]] for k, val in (q.get("do") or {}).items()},
        }
        for q in QUERIES
    ]
    fused = v.infer_posterior_moments(qdicts, pad_bucket=8)
    assert fused is not None
    mom, spans = fused
    # Truth from the FITTED params (isolates conditioning math from fit
    # error): rebuild a GaussianBN carrying the fitted coefficients.
    fitted = type(bn)(name="fitted")
    for node in bn.nodes:
        fitted.nodes.append(node)
        parents = list(v.dag.parents(node))
        fitted.parents[node] = parents
        p = v.params[node]
        fitted.weights[node] = [float(w) for w in np.asarray(p["weight"])[:, 0]]
        fitted.bias[node] = float(np.asarray(p["bias"])[0])
        fitted.sigma[node] = float(
            np.sqrt(max(float(np.asarray(p["var"])[0]), 1e-3**2))
        )
    for q, (lo, hi, _t) in zip(QUERIES, spans):
        got_mean, got_std = mom[lo][0], mom[lo][1]
        ev = q.get("evidence") or {}
        if q["target"] in ev:
            want_mean, want_std = float(ev[q["target"]]), 0.0
        else:
            want_mean, want_std = fitted.conditional(
                q["target"], ev, q.get("do") or {}
            )
        np.testing.assert_allclose(got_mean, want_mean, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_std, want_std, rtol=2e-3, atol=2e-3)


def test_lg_exact_refuses_non_lg(net_and_vbn):
    _, _ = net_and_vbn
    g = np.random.default_rng(0)
    df = pd.DataFrame(
        {"a": g.integers(0, 2, size=300).astype(float),
         "b": g.integers(0, 2, size=300).astype(float)}
    )
    v = VBN(nx.DiGraph([("a", "b")]), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: dict(defaults.cpd("categorical_table"), n_classes=2)
            for k in ["a", "b"]
        },
    )
    v.fit(df)
    v.set_inference_method("gaussian_exact")
    # non-LG net: gaussian_exact has no fused moments path, but the API
    # contract is never-None (round-4 VERDICT next #8) — the call
    # degrades internally to the stream fallback + _posterior_stats
    # host reduction.
    out = v.infer_posterior_moments(
        [{"target": "b", "evidence": {"a": [[1.0]]}}]
    )
    assert out is not None
    mom, spans = out
    assert mom.shape == (1, 2) and np.all(np.isfinite(mom))
