"""Level-grouped vmap sweep: grouped == ungrouped, for every path.

Same-signature nodes within a topological level are stacked and evaluated
as one vmapped call (``inference/_sweep.py``). These tests pin the
invariant that grouping is a pure performance transform: posterior
weights/samples match the per-node unrolled sweep (same fold(key, idx)
per-node RNG; only GEMM batching differs, so tolerances are loose FP ones).
"""

import os

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from vectorizedbayesiannetwork_tpu import VBN, defaults

B, S = 3, 64
N_SIBLINGS = 4


def _make_df(n=800, seed=0):
    g = np.random.default_rng(seed)
    z = g.normal(size=n)
    cols = {"z": z}
    for i in range(N_SIBLINGS):
        cols[f"y{i}"] = (0.4 + 0.2 * i) * z + 0.1 * g.normal(size=n)
    cols["t"] = sum(cols[f"y{i}"] for i in range(N_SIBLINGS)) + 0.1 * g.normal(
        size=n
    )
    return pd.DataFrame(cols)


def _make_vbn(cpd_name):
    G = nx.DiGraph(
        [("z", f"y{i}") for i in range(N_SIBLINGS)]
        + [(f"y{i}", "t") for i in range(N_SIBLINGS)]
    )
    sib_cfg = dict(defaults.cpd(cpd_name))
    if cpd_name == "gaussian_nn":
        sib_cfg["fit"] = {**sib_cfg["fit"], "epochs": 3, "batch_size": 256}
        sib_cfg["hidden_dims"] = [16]
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            "z": defaults.cpd("linear_gaussian"),
            **{f"y{i}": sib_cfg for i in range(N_SIBLINGS)},
            "t": defaults.cpd("linear_gaussian"),
        },
    )
    v.fit(_make_df())
    return v


def _infer(cpd_name, grouping, query, method):
    os.environ["VBN_LEVEL_GROUP"] = grouping
    try:
        v = _make_vbn(cpd_name)
        v.set_inference_method(method, n_samples=S)
        pdf, samples = v.infer_posterior(query)
        return np.asarray(pdf), np.asarray(samples)
    finally:
        os.environ.pop("VBN_LEVEL_GROUP", None)


@pytest.mark.parametrize("cpd_name", ["gaussian_nn", "linear_gaussian"])
@pytest.mark.parametrize(
    "method", ["monte_carlo_marginalization", "likelihood_weighting"]
)
def test_grouped_matches_unrolled_latent_siblings(cpd_name, method):
    # siblings y0..y3 are latent, same level, same signature -> one vmap
    query = {"target": "t", "evidence": {"z": [[0.3]] * B}}
    pdf_g, s_g = _infer(cpd_name, "always", query, method)
    pdf_u, s_u = _infer(cpd_name, "never", query, method)
    np.testing.assert_allclose(s_g, s_u, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pdf_g, pdf_u, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cpd_name", ["gaussian_nn"])
def test_grouped_matches_unrolled_evidence_siblings(cpd_name):
    # siblings observed -> grouped evidence log_prob accumulation
    query = {
        "target": "t",
        "evidence": {f"y{i}": [[0.2 * i]] * B for i in range(N_SIBLINGS)},
    }
    pdf_g, s_g = _infer(cpd_name, "always", query, "likelihood_weighting")
    pdf_u, s_u = _infer(cpd_name, "never", query, "likelihood_weighting")
    np.testing.assert_allclose(s_g, s_u, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pdf_g, pdf_u, rtol=1e-4, atol=1e-5)


def test_mixed_level_partial_grouping():
    # one sibling uses a different CPD family -> grouped path must only
    # stack the matching ones and still produce finite, correct shapes
    G = nx.DiGraph(
        [("z", f"y{i}") for i in range(3)] + [(f"y{i}", "t") for i in range(3)]
    )
    df = _make_df()
    v = VBN(G, seed=0)
    nn_cfg = dict(defaults.cpd("gaussian_nn"))
    nn_cfg["fit"] = {**nn_cfg["fit"], "epochs": 2, "batch_size": 256}
    nn_cfg["hidden_dims"] = [8]
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            "z": defaults.cpd("linear_gaussian"),
            "y0": nn_cfg,
            "y1": nn_cfg,
            "y2": defaults.cpd("linear_gaussian"),
            "t": defaults.cpd("linear_gaussian"),
        },
    )
    v.fit(df[["z", "y0", "y1", "y2", "t"]])
    v.set_inference_method("likelihood_weighting", n_samples=S)
    pdf, samples = v.infer_posterior(
        {"target": "t", "evidence": {"z": [[0.1]] * B}}
    )
    assert np.all(np.isfinite(np.asarray(pdf)))
    assert np.asarray(samples).shape == (B, S, 1)
