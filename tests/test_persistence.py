"""Save/load roundtrip for every CPD family + update-policy state.

Parity with the reference's ``tests/test_persistence.py:6-36`` extended to
the full registry (SURVEY.md §5.4).
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import VBN, defaults

CONT_FAMILIES = ["linear_gaussian", "gaussian_nn", "mdn", "rff_gaussian", "kde"]
DISC_FAMILIES = ["categorical_table", "categorical_embedded_softmax", "softmax_nn"]


def small_fit(conf):
    conf = dict(conf)
    conf["fit"] = {**conf["fit"], "epochs": 3, "batch_size": 512}
    return conf


@pytest.mark.parametrize("family", CONT_FAMILIES)
def test_roundtrip_continuous(family, tmp_path):
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: small_fit(defaults.cpd(family)) for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df(n=600))
    v.set_inference_method("likelihood_weighting", n_samples=64)
    v.set_sampling_method("ancestral")
    path = str(tmp_path / f"{family}.npz")
    v.save(path)
    v2 = VBN.load(path)
    q = {"target": "x2", "evidence": {"x0": [[0.2]], "x1": [[0.1]]}}
    # identical params -> identical conditional densities
    x_test = np.array([[[0.1]]], np.float32)
    p_test = np.array([[0.2, 0.1]], np.float32)
    lp1 = np.asarray(v.get_cpd("x2").log_prob(x_test, p_test))
    lp2 = np.asarray(v2.get_cpd("x2").log_prob(x_test, p_test))
    np.testing.assert_allclose(lp1, lp2, rtol=1e-6)
    pdf, s = v2.infer_posterior(q)
    assert np.all(np.isfinite(np.asarray(pdf)))
    assert v2.sample(q, n_samples=16).shape == (1, 16, 1)


@pytest.mark.parametrize("family", DISC_FAMILIES)
def test_roundtrip_discrete(family, tmp_path):
    import networkx as nx
    import pandas as pd

    g = np.random.default_rng(0)
    n = 600
    a = g.integers(0, 3, n)
    b = (a + g.integers(0, 2, n)) % 3
    df = pd.DataFrame({"a": a.astype(float), "b": b.astype(float)})
    G = nx.DiGraph([("a", "b")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: small_fit({**defaults.cpd(family), "n_classes": 3})
            for k in ["a", "b"]
        },
    )
    v.fit(df)
    path = str(tmp_path / f"{family}.npz")
    v.save(path)
    v2 = VBN.load(path)
    # static fit-resolved spec state must survive (class supports, bins)
    assert (
        v2.nodes["b"].static_signature() == v.nodes["b"].static_signature()
    )
    p_test = np.array([[1.0]], np.float32)
    lp1 = np.asarray(v.get_cpd("b").log_prob([[1.0]], p_test))
    lp2 = np.asarray(v2.get_cpd("b").log_prob([[1.0]], p_test))
    np.testing.assert_allclose(lp1, lp2, rtol=1e-6)


def test_roundtrip_update_policy_state(tmp_path):
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: small_fit(defaults.cpd("gaussian_nn"))
            for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df(n=400))
    v.set_inference_method("likelihood_weighting", n_samples=32)
    v.update(
        make_chain_df(n=100, seed=3),
        update_method="replay_buffer",
        max_size=500,
    )
    path = str(tmp_path / "ckpt_dir")
    v.save(path)
    import os

    assert os.path.exists(os.path.join(path, "checkpoint.npz"))
    assert os.path.exists(os.path.join(path, "meta.json"))
    v2 = VBN.load(path)
    assert v2._update_policy is not None
    assert set(v2._update_policy._buffer) == {"x0", "x1", "x2"}
    np.testing.assert_allclose(
        v._update_policy._buffer["x2"][1], v2._update_policy._buffer["x2"][1]
    )
    # update continues from restored buffer without re-specifying method
    v2.update(make_chain_df(n=50, seed=4))


def test_save_refuses_callable_methods(tmp_path):
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: small_fit(defaults.cpd("linear_gaussian"))
            for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df(n=200))
    v.set_inference_method(lambda vbn, q: None)
    with pytest.raises(ValueError, match="callable"):
        v.save(str(tmp_path / "x.npz"))


def test_save_refuses_missing_cpds(tmp_path):
    v = VBN(make_chain_graph(), seed=0)
    with pytest.raises(RuntimeError, match="missing CPDs"):
        v.save(str(tmp_path / "x.npz"))


def test_rng_counter_restored(tmp_path):
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: small_fit(defaults.cpd("linear_gaussian"))
            for k in ["x0", "x1", "x2"]
        },
    )
    v.fit(make_chain_df(n=200))
    v.set_sampling_method("ancestral")
    path = str(tmp_path / "c.npz")
    v.save(path)
    v2 = VBN.load(path)
    q = {"target": "x2", "evidence": {}}
    s1 = np.asarray(v.sample(q, n_samples=8))
    s2 = np.asarray(v2.sample(q, n_samples=8))
    np.testing.assert_allclose(s1, s2)  # same key-stream position
