"""Core-layer tests: DAG, registries, utils, config system, plans.

Modeled on the reference's registry/validation tests (SURVEY.md §4).
"""

import networkx as nx
import numpy as np
import pytest

import vectorizedbayesiannetwork_tpu as vt
from vectorizedbayesiannetwork_tpu import StaticDAG, defaults
from vectorizedbayesiannetwork_tpu.config_cast import (
    CPD_SCHEMAS,
    FIT_SCHEMA,
    coerce_numbers,
)
from vectorizedbayesiannetwork_tpu.core.utils import (
    ensure_2d,
    infer_batch_size,
)


def test_dag_topo_and_levels():
    g = nx.DiGraph()
    g.add_edges_from([("a", "c"), ("b", "c"), ("c", "d")])
    dag = StaticDAG(g)
    topo = dag.topological_order()
    assert topo.index("c") > topo.index("a")
    assert topo.index("d") > topo.index("c")
    levels = dag.topological_levels()
    assert set(levels[0]) == {"a", "b"}
    assert levels[1] == ("c",)
    assert levels[2] == ("d",)
    assert dag.parents("c") == ("a", "b")
    assert dag.children("c") == ("d",)


def test_dag_rejects_cycles():
    g = nx.DiGraph()
    g.add_edges_from([("a", "b"), ("b", "a")])
    with pytest.raises(ValueError):
        StaticDAG(g)


def test_registries_populated():
    assert "linear_gaussian" in vt.CPD_REGISTRY
    assert "node_wise" in vt.LEARNING_REGISTRY
    assert "monte_carlo_marginalization" in vt.INFERENCE_REGISTRY
    assert "ancestral" in vt.SAMPLING_REGISTRY


def test_registry_duplicate_guard():
    with pytest.raises(KeyError):

        @vt.register_cpd("linear_gaussian")
        class Dup:
            pass


def test_defaults_cpd_structure():
    conf = defaults.cpd("linear_gaussian")
    assert conf["cpd"] == "linear_gaussian"
    assert isinstance(conf["fit"], dict) and isinstance(conf["update"], dict)
    assert "lr" not in conf  # training keys live under fit/update


def test_defaults_all_categories():
    for name in ["monte_carlo_marginalization", "importance_sampling"]:
        assert defaults.inference(name)["name"] == name
    assert defaults.sampling("ancestral")["n_samples"] == 512
    assert defaults.update("replay_buffer")["max_size"] == 2000
    assert defaults.learning("node_wise")["default_cpd"] == "gaussian_nn"


def test_config_cast():
    out = coerce_numbers(
        {"epochs": "10", "lr": "1e-3", "batch_size": np.int64(32)}, FIT_SCHEMA
    )
    assert out == {"epochs": 10, "lr": 1e-3, "batch_size": 32}
    out = coerce_numbers(
        {"hidden_dims": "[8, 16]", "min_scale": "0.01"},
        CPD_SCHEMAS["gaussian_nn"],
    )
    assert out["hidden_dims"] == [8, 16]
    assert out["min_scale"] == 0.01
    with pytest.raises(ValueError):
        coerce_numbers({"epochs": "abc"}, FIT_SCHEMA)


def test_ensure_2d_and_batch_size():
    assert ensure_2d(1.5).shape == (1, 1)
    assert ensure_2d([1.0, 2.0]).shape == (2, 1)
    assert infer_batch_size({"a": [[1.0], [2.0]]}, {"b": [[3.0], [4.0]]}) == 2
    assert infer_batch_size({}, {}) == 1
    with pytest.raises(ValueError):
        infer_batch_size({"a": [[1.0]]}, {"b": [[1.0], [2.0]]})


def test_prng_impl_rbg():
    """Opt-in fast PRNG: VBN(prng_impl='rbg') produces valid posteriors,
    persists the impl through save/load, and differs from the default
    stream (core/rng.py::root_key)."""
    import os
    import tempfile

    import networkx as nx
    import numpy as np
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(0)
    n = 4000
    x0 = g.normal(size=n)
    x1 = 0.7 * x0 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1})
    G = nx.DiGraph([("x0", "x1")])

    def build(impl):
        v = VBN(G, seed=0, prng_impl=impl)
        v.set_learning_method(
            "node_wise",
            nodes_cpds={k: defaults.cpd("linear_gaussian") for k in G.nodes},
        )
        v.fit(df)
        v.set_inference_method("likelihood_weighting", n_samples=2048)
        return v

    q = {"target": "x1", "evidence": {"x0": [[1.0]]}}
    v_rbg = build("rbg")
    pdf, samp = v_rbg.infer_posterior(q)
    w = np.asarray(pdf)
    m = (w / w.sum(1, keepdims=True) * np.asarray(samp)[..., 0]).sum(1)[0]
    assert abs(m - 0.7) < 0.05  # analytic posterior mean
    v_def = build(None)
    pdf_d, samp_d = v_def.infer_posterior(q)
    assert not np.allclose(np.asarray(samp_d), np.asarray(samp))  # new stream

    path = os.path.join(tempfile.mkdtemp(), "ck")
    v_rbg.save(path)
    v2 = VBN.load(path)
    assert v2.prng_impl == "rbg"
    v2.set_inference_method("likelihood_weighting", n_samples=2048)
    pdf2, samp2 = v2.infer_posterior(q)
    assert np.isfinite(np.asarray(pdf2)).all()
