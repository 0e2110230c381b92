"""Registry sweep over sampling methods + MCMC correctness checks.

Modeled on the reference's ``tests/test_sampling.py:46-75``.
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import SAMPLING_REGISTRY, VBN, defaults


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


@pytest.mark.parametrize("name", sorted(SAMPLING_REGISTRY))
def test_every_sampler_contract(vbn, name):
    vbn.set_sampling_method(name)
    kwargs = {}
    if name == "gibbs":
        kwargs = {"burn_in": 5, "n_steps": 1}
    if name == "hmc":
        kwargs = {"burn_in": 5}
    if name == "nuts":
        kwargs = {"burn_in": 5, "max_tree_depth": 4}
    s = vbn.sample(
        {"target": "x2", "evidence": {"x0": [[0.5]]}}, n_samples=32, **kwargs
    )
    s = np.asarray(s)
    assert s.shape == (1, 32, 1)
    assert np.all(np.isfinite(s))


def test_ancestral_joint(vbn):
    vbn.set_sampling_method("ancestral")
    joint = vbn._sampling.sample_joint(
        vbn, vbn._normalize_query({"target": "x2", "evidence": {}}), 64
    )
    assert set(joint) == {"x0", "x1", "x2"}
    x2 = np.asarray(joint["x2"])
    x0 = np.asarray(joint["x0"])
    x1 = np.asarray(joint["x1"])
    resid = x2 - (0.5 * x0 - 0.2 * x1)
    assert abs(float(np.std(resid)) - 0.1) < 0.05


def test_gibbs_posterior_mean(vbn):
    # p(x0 | x2=0.5): analytic posterior mean ~ 0.25/0.29 ~ 0.862
    vbn.set_sampling_method("gibbs")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=300,
        burn_in=30,
        n_steps=2,
        n_chains=8,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.15


def test_hmc_posterior_mean(vbn):
    vbn.set_sampling_method("hmc")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=400,
        burn_in=50,
        step_size=0.2,
        n_leapfrog=8,
        n_chains=8,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.15


def test_hmc_falls_back_for_categorical():
    import networkx as nx
    import pandas as pd

    g = np.random.default_rng(0)
    df = pd.DataFrame(
        {"a": g.integers(0, 2, 300).astype(float)}
    )
    v = VBN(nx.DiGraph([("a", "a")]) if False else _single_node_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={"a": {**defaults.cpd("categorical_table"), "n_classes": 2}},
    )
    v.fit(df)
    v.set_sampling_method("hmc")
    s = np.asarray(v.sample({"target": "a", "evidence": {}}, n_samples=64))
    assert set(np.unique(s)).issubset({0.0, 1.0})


def _single_node_graph():
    import networkx as nx

    g = nx.DiGraph()
    g.add_node("a")
    return g


def test_do_intervention_sampling(vbn):
    vbn.set_sampling_method("ancestral")
    s = np.asarray(
        vbn.sample(
            {"target": "x2", "evidence": {}, "do": {"x0": [[2.0]]}},
            n_samples=2048,
        )
    )
    assert abs(float(np.mean(s)) - 1.0) < 0.05


def test_nuts_posterior_mean(vbn):
    # same analytic posterior as the HMC test; NUTS picks its own
    # trajectory lengths so no n_leapfrog is supplied
    vbn.set_sampling_method("nuts")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=400,
        burn_in=50,
        step_size=0.2,
        n_chains=8,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.15


def test_nuts_adaptation_from_bad_step_size(vbn):
    vbn.set_sampling_method("nuts")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=300,
        burn_in=80,
        step_size=5.0,
        n_chains=8,
        adapt_step_size=True,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.2


def test_nuts_falls_back_for_categorical():
    g = np.random.default_rng(0)
    import pandas as pd

    df = pd.DataFrame({"a": g.integers(0, 2, 300).astype(float)})
    v = VBN(_single_node_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={"a": {**defaults.cpd("categorical_table"), "n_classes": 2}},
    )
    v.fit(df)
    v.set_sampling_method("nuts")
    s = np.asarray(v.sample({"target": "a", "evidence": {}}, n_samples=64))
    assert set(np.unique(s)).issubset({0.0, 1.0})


def test_hmc_step_size_adaptation(vbn):
    # dual averaging + find-reasonable-epsilon recovers from a terrible
    # initial step size (the reference placeholder would just not move)
    vbn.set_sampling_method("hmc")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=300,
        burn_in=80,
        step_size=2.0,  # far too large: fixed-eps chains reject ~always
        n_chains=8,
        adapt_step_size=True,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.2


def test_gibbs_keyed_fallback_matches(vbn, monkeypatch):
    """Without _noise_spec support the gibbs scan keeps its in-loop key
    path; both paths must estimate the same posterior (the RNG hoisting
    is a pure performance transform)."""
    from vectorizedbayesiannetwork_tpu.models.linear_gaussian import (
        LinearGaussianCPD,
    )

    monkeypatch.delattr(LinearGaussianCPD, "_noise_spec")
    vbn.set_sampling_method("gibbs")
    s = vbn.sample(
        {"target": "x0", "evidence": {"x2": [[0.5]]}},
        n_samples=300,
        burn_in=30,
        n_steps=2,
        n_chains=8,
    )
    mean = float(np.mean(np.asarray(s)))
    assert abs(mean - 0.862) < 0.15
