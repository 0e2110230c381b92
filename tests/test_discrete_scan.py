"""Scan-form discrete sweep: equivalence with the unrolled sweep + exact GT.

Covers the large-network fast path (inference/_discrete_sweep.py).
"""

import os

import numpy as np
import pytest

from benchmarking.data_gen import domain_schema
from benchmarking.exact import ancestral_sample, exact_posterior
from benchmarking.models.vbn_tpu import VBNTpuBenchmarkModel
from benchmarking.networks import random_bn


class _Q:
    def __init__(self, i, target, evidence):
        self.query_id = f"q{i}"
        self.target = target
        self.evidence = evidence
        self.skeleton_id = "s"


def _model(bn, n_samples=8192):
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
                "n_samples": n_samples,
            }
        },
    )
    m.fit(data)
    return m


@pytest.fixture
def forced_scan(monkeypatch):
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")


def test_scan_matches_exact_ground_truth(forced_scan):
    bn = random_bn(15, max_indegree=3, max_card=3, seed=7)
    m = _model(bn)
    target, ev = bn.nodes[-1], bn.nodes[0]
    res = m.answer_inference_queries(
        [_Q(0, target, {ev: 0}), _Q(1, target, {ev: 1})]
    )
    for i, r in enumerate(res):
        gt = exact_posterior(bn, target, {ev: i})
        assert r["ok"]
        np.testing.assert_allclose(r["probs"], gt, atol=0.05)


def test_scan_matches_unrolled(monkeypatch):
    bn = random_bn(12, max_indegree=2, max_card=3, seed=3)
    target, ev = bn.nodes[-1], bn.nodes[0]
    results = {}
    for mode in ["never", "always"]:
        monkeypatch.setenv("VBN_DISCRETE_SCAN", mode)
        m = _model(bn, n_samples=16384)
        res = m.answer_inference_queries([_Q(0, target, {ev: 0})])
        results[mode] = np.asarray(res[0]["probs"])
    # both are MC estimates of the same posterior
    np.testing.assert_allclose(
        results["never"], results["always"], atol=0.04
    )


def test_scan_weighted_diagnosis(forced_scan):
    # evidence DOWNSTREAM of the target: exercises the log-weight path
    bn = random_bn(10, max_indegree=2, max_card=2, seed=11)
    # pick a root target with a descendant to observe
    target = bn.nodes[0]
    desc = next(
        (n for n in bn.nodes if target in bn.parents[n]), bn.nodes[-1]
    )
    m = _model(bn, n_samples=16384)
    res = m.answer_inference_queries([_Q(0, target, {desc: 0})])
    gt = exact_posterior(bn, target, {desc: 0})
    np.testing.assert_allclose(res[0]["probs"], gt, atol=0.05)


def test_scan_not_used_for_mixed_networks(monkeypatch):
    # gaussian nodes must never take the discrete path, even when forced
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(0)
    df = pd.DataFrame(
        {"x": g.normal(size=500), "y": g.normal(size=500)}
    )
    G = nx.DiGraph([("x", "y")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in "xy"},
    )
    v.fit(df)
    v.set_inference_method("likelihood_weighting", n_samples=64)
    w, s = v.infer_posterior({"target": "x", "evidence": {"y": [[0.1]]}})
    assert np.isfinite(np.asarray(w)).all()
