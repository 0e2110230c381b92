"""Scan-form linear-Gaussian sweep: equivalence with the unrolled sweep.

Covers the large-Gaussian-network fast path (inference/_gaussian_sweep.py).
"""

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from vectorizedbayesiannetwork_tpu import VBN, defaults


def make_gaussian_chain(n_nodes=10, n_rows=3000, seed=0):
    g = np.random.default_rng(seed)
    cols = {}
    edges = []
    for i in range(n_nodes):
        name = f"v{i}"
        noise = g.normal(size=n_rows)
        if i == 0:
            cols[name] = noise
        else:
            cols[name] = 0.7 * cols[f"v{i-1}"] + 0.3 * noise
            edges.append((f"v{i-1}", name))
    return nx.DiGraph(edges), pd.DataFrame(cols)


def fit(G, df):
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={c: defaults.cpd("linear_gaussian") for c in df.columns},
    )
    v.fit(df)
    return v


def test_gaussian_scan_matches_unrolled(monkeypatch):
    G, df = make_gaussian_chain()
    q = {"target": "v9", "evidence": {"v0": [[1.0], [-1.0]]}}
    stats = {}
    for mode in ["never", "always"]:
        monkeypatch.setenv("VBN_DISCRETE_SCAN", mode)
        v = fit(G, df)
        v.set_inference_method("likelihood_weighting", n_samples=16384)
        w, s = v.infer_posterior(q)
        st = v._posterior_stats(w, s)
        stats[mode] = np.asarray(st["mean"]).ravel()
    # same posterior from both program forms (MC tolerance)
    np.testing.assert_allclose(stats["never"], stats["always"], atol=0.05)
    # analytic: E[v9 | v0=1] = 0.7^9
    assert abs(stats["always"][0] - 0.7**9) < 0.05


def test_gaussian_scan_diagnosis(monkeypatch):
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    G, df = make_gaussian_chain(n_nodes=5)
    v = fit(G, df)
    v.set_inference_method("likelihood_weighting", n_samples=32768)
    w, s = v.infer_posterior({"target": "v0", "evidence": {"v4": [[1.0]]}})
    st = v._posterior_stats(w, s)
    assert float(st["mean"][0, 0]) > 0.15  # pulled toward +
    assert np.isfinite(np.asarray(w)).all()


def test_gaussian_scan_do_intervention(monkeypatch):
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    G, df = make_gaussian_chain(n_nodes=4)
    v = fit(G, df)
    v.set_sampling_method("ancestral")
    s = np.asarray(
        v.sample(
            {"target": "v3", "evidence": {}, "do": {"v1": [[2.0]]}},
            n_samples=8192,
        )
    )
    assert abs(float(np.mean(s)) - 2.0 * 0.7**2) < 0.05
