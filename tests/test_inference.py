"""Registry sweep over ALL inference methods + method-specific semantics.

Modeled on ``tests/test_inference.py:27-37`` of the reference: every method
returns (pdf/weights [B,S'], samples [B,S',D]) finite.
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import INFERENCE_REGISTRY, VBN, defaults

B, S = 4, 64


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


@pytest.fixture(scope="module")
def vbn_cat():
    import networkx as nx
    import pandas as pd

    g = np.random.default_rng(0)
    n = 1200
    a = g.integers(0, 3, n)
    b = (a + g.integers(0, 2, n)) % 3
    df = pd.DataFrame({"a": a.astype(float), "b": b.astype(float)})
    G = nx.DiGraph([("a", "b")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            "a": {**defaults.cpd("categorical_table"), "n_classes": 3},
            "b": {**defaults.cpd("categorical_table"), "n_classes": 3},
        },
    )
    v.fit(df)
    return v


QUERY = {
    "target": "x2",
    "evidence": {"x0": [[0.3]] * B, "x1": [[-0.2]] * B},
}


@pytest.mark.parametrize("name", sorted(INFERENCE_REGISTRY))
def test_every_method_contract(vbn, name):
    vbn.set_inference_method(name, n_samples=S)
    pdf, samples = vbn.infer_posterior(QUERY)
    pdf, samples = np.asarray(pdf), np.asarray(samples)
    assert pdf.ndim == 2 and pdf.shape[0] == B
    assert samples.ndim == 3 and samples.shape[0] == B
    assert samples.shape[1] == pdf.shape[1]
    assert np.all(np.isfinite(pdf))
    assert np.all(np.isfinite(samples))


@pytest.mark.parametrize("name", sorted(INFERENCE_REGISTRY))
def test_every_method_latent_parent_query(vbn, name):
    # p(x0 | x2): parents of target unobserved -> MC paths / fallbacks
    vbn.set_inference_method(name, n_samples=S)
    pdf, samples = vbn.infer_posterior(
        {"target": "x0", "evidence": {"x2": [[0.4]]}}
    )
    assert np.all(np.isfinite(np.asarray(pdf)))
    stats = vbn._posterior_stats(pdf, samples)
    # Weighted methods condition on descendant evidence; MCM ignores it by
    # construction (pure ancestral pdf, parity with the reference), and
    # gaussian_exact on a ROOT target returns the exact prior (its
    # "parents observed" check is vacuously true — also reference parity).
    if name not in {"monte_carlo_marginalization", "gaussian_exact"}:
        assert float(stats["mean"][0, 0]) > 0.0  # pulled toward positive


def test_gaussian_exact_matches_analytic(vbn):
    vbn.set_inference_method("gaussian_exact", n_samples=101)
    pdf, samples = vbn.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
    )
    assert not vbn._inference._last_fallback
    stats = vbn._posterior_stats(pdf, samples)
    assert abs(float(stats["mean"][0, 0]) - 0.19) < 0.01
    # grid center = exact conditional mean
    mid = np.asarray(samples)[0, 50, 0]
    assert abs(mid - 0.19) < 0.01


def test_gaussian_exact_fallback_on_latent_parent(vbn):
    vbn.set_inference_method("gaussian_exact", n_samples=64)
    vbn.infer_posterior({"target": "x2", "evidence": {"x0": [[0.3]]}})
    assert vbn._inference._last_fallback


def test_categorical_exact_pmf(vbn_cat):
    vbn_cat.set_inference_method("categorical_exact")
    probs, support = vbn_cat.infer_posterior(
        {"target": "b", "evidence": {"a": [[1.0]]}}
    )
    probs = np.asarray(probs)
    assert not vbn_cat._inference._last_fallback
    assert probs.shape == (1, 3)
    assert abs(probs.sum() - 1.0) < 1e-5
    # b = (1 + Bernoulli(0.5)) % 3 -> mass on classes 1 and 2
    assert probs[0, 0] < 0.1
    assert np.asarray(support).shape == (1, 3, 1)


def test_rb_marginalization_gaussian_grid(vbn):
    vbn.set_inference_method(
        "rao_blackwellized_marginalization", n_samples=128, n_particles=256
    )
    pdf, samples = vbn.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[1.0]]}}
    )
    assert not vbn._inference._last_fallback
    stats = vbn._posterior_stats(pdf, samples)
    assert abs(float(stats["mean"][0, 0]) - 0.5) < 0.05


def test_rb_marginalization_descendant_fallback(vbn):
    vbn.set_inference_method(
        "rao_blackwellized_marginalization", n_samples=64
    )
    vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.4]]}})
    assert vbn._inference._last_fallback
    assert "descendants" in vbn._inference._last_reason


def test_rb_marginalization_categorical(vbn_cat):
    vbn_cat.set_inference_method(
        "rao_blackwellized_marginalization", n_samples=64, n_particles=128
    )
    probs, support = vbn_cat.infer_posterior({"target": "b", "evidence": {}})
    assert not vbn_cat._inference._last_fallback
    probs = np.asarray(probs)
    assert abs(probs.sum() - 1.0) < 1e-4


def test_ris_resamples_on_unlikely_evidence(vbn):
    vbn.set_inference_method(
        "resampled_importance_sampling", n_samples=128, ess_threshold=0.9
    )
    w, s = vbn.infer_posterior(
        {
            "target": "x0",
            "evidence": {"x2": [[3.0]]},  # unlikely evidence -> low ESS
        }
    )
    assert vbn._inference._last_resampled
    assert np.all(np.isfinite(np.asarray(w)))


def test_is_ess_and_fallback_flags(vbn):
    vbn.set_inference_method("importance_sampling", n_samples=256)
    vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.2]]}})
    assert vbn._inference._last_ess is not None


def test_lbp_converges(vbn):
    vbn.set_inference_method("lbp", n_samples=64, n_iters=10, damping=0.5)
    w, s = vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.2]]}})
    assert np.allclose(np.asarray(w).sum(axis=1), 1.0, atol=1e-4)
