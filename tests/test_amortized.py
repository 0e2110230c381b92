"""Real amortized learning + single-pass amortized inference.

The reference only registers an ``amortized`` placeholder that raises
(``vbn/learning/amortized.py:6-14``); this framework trains a
masked-evidence posterior network (``learning/amortized.py``) and serves
``p(target | evidence)`` in one MLP forward (``inference/amortized.py``).
Correctness targets are analytic linear-Gaussian posteriors — including the
*inverse* conditional p(parent | child), which is the whole point of
amortization.
"""

import os
import tempfile

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from vectorizedbayesiannetwork_tpu import VBN, defaults

S = 512


def _fit_lin_gauss(seed=0, epochs=60, **lkw):
    g = np.random.default_rng(seed)
    n = 6000
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "amortized",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in G.nodes},
        epochs=epochs,
        batch_size=512,
        hidden_dims=[64, 64],
        **lkw,
    )
    v.fit(df)
    v.set_inference_method("amortized", n_samples=S)
    return v


@pytest.fixture(scope="module")
def vbn():
    return _fit_lin_gauss()


def _mean(v, pdf, samples):
    st = v._posterior_stats(pdf, samples)
    return float(np.asarray(st["mean"]).ravel()[0])


def test_forward_conditional(vbn):
    pdf, s = vbn.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}}
    )
    assert not vbn._inference._last_fallback
    assert pdf.shape == (1, S) and s.shape == (1, S, 1)
    assert abs(_mean(vbn, pdf, s) - 0.5) < 0.08


def test_inverse_posterior(vbn):
    # p(x0 | x2=0.3): analytic mean = cov/var * x2 = 0.5/0.30 * 0.3 = 0.5
    pdf, s = vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.3]]}})
    assert not vbn._inference._last_fallback
    assert abs(_mean(vbn, pdf, s) - 0.5) < 0.12


def test_do_served_amortized(vbn):
    # do(x0) on a root == conditioning on it; the interventionally trained
    # net (the default) serves it in one forward pass, no fallback.
    pdf, s = vbn.infer_posterior({"target": "x2", "do": {"x0": [[1.0]]}})
    assert not vbn._inference._last_fallback
    assert abs(_mean(vbn, pdf, s) - 0.5) < 0.1


def test_do_falls_back_when_observational():
    v = _fit_lin_gauss(interventional=False)
    pdf, s = v.infer_posterior({"target": "x2", "do": {"x0": [[1.0]]}})
    assert v._inference._last_fallback
    assert "do-intervention" in v._inference._last_reason
    assert abs(_mean(v, pdf, s) - 0.5) < 0.08


def test_amortized_do_differs_from_conditioning_under_confounding():
    """x0 -> x1, x0 -> x2, x1 -> x2: p(x2 | do(x1=v)) has mean c*v while
    p(x2 | x1=v) has mean (c + b*a/(a^2+s1^2))*v — the do-mask channel
    must sever the backdoor through x0."""
    g = np.random.default_rng(3)
    n = 8000
    a, b, c, s1 = 1.0, 1.0, 0.5, 0.5
    x0 = g.normal(size=n)
    x1 = a * x0 + s1 * g.normal(size=n)
    x2 = b * x0 + c * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x1"), ("x0", "x2"), ("x1", "x2")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "amortized",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in G.nodes},
        epochs=80,
        batch_size=512,
        hidden_dims=[64, 64],
        n_do_sets=16,
    )
    v.fit(df)
    v.set_inference_method("amortized", n_samples=S)
    val = 2.0
    do_mean = 0.5 * val  # c*v = 1.0
    cond_mean = (c + b * a / (a * a + s1 * s1)) * val  # 1.3*v = 2.6
    pdf, s = v.infer_posterior({"target": "x2", "do": {"x1": [[val]]}})
    assert not v._inference._last_fallback
    m_do = _mean(v, pdf, s)
    pdf, s = v.infer_posterior({"target": "x2", "evidence": {"x1": [[val]]}})
    assert not v._inference._last_fallback
    m_cond = _mean(v, pdf, s)
    assert abs(m_do - do_mean) < 0.45, (m_do, do_mean)
    assert abs(m_cond - cond_mean) < 0.45, (m_cond, cond_mean)
    # the two answers are far apart (gap 1.6): the net distinguishes them
    assert m_cond - m_do > 0.8


def test_unfitted_amortizer_falls_back():
    g = np.random.default_rng(0)
    df = pd.DataFrame(
        {"a": g.normal(size=500), "b": g.normal(size=500)}
    )
    df["b"] += 0.7 * df["a"]
    v = VBN(nx.DiGraph([("a", "b")]), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in "ab"},
    )
    v.fit(df)
    v.set_inference_method("amortized", n_samples=128)
    pdf, s = v.infer_posterior({"target": "b", "evidence": {"a": [[1.0]]}})
    assert v._inference._last_fallback
    assert np.all(np.isfinite(np.asarray(pdf)))


def test_categorical_amortized_pmf():
    g = np.random.default_rng(0)
    n = 4000
    a = g.integers(0, 3, n)
    b = (a + (g.random(n) < 0.2)) % 3
    df = pd.DataFrame({"a": a.astype(float), "b": b.astype(float)})
    v = VBN(nx.DiGraph([("a", "b")]), seed=0)
    v.set_learning_method(
        "amortized",
        nodes_cpds={
            k: {**defaults.cpd("categorical_table"), "n_classes": 3}
            for k in "ab"
        },
        epochs=80,
        batch_size=512,
        hidden_dims=[64],
    )
    v.fit(df)
    v.set_inference_method("amortized")
    pdf, s = v.infer_posterior({"target": "b", "evidence": {"a": [[1.0]]}})
    probs = np.asarray(pdf).ravel()
    assert probs.shape == (3,)
    assert abs(probs.sum() - 1.0) < 1e-4
    # p(b=1|a=1)=0.8, p(b=2|a=1)=0.2
    assert abs(probs[1] - 0.8) < 0.1
    assert abs(probs[2] - 0.2) < 0.1
    support = np.asarray(s)
    assert support.shape == (1, 3, 1)


def test_amortized_save_load_roundtrip(vbn):
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        vbn.save(path)
        w = VBN.load(path)
        assert w.amortized is not None
        assert w.amortized["spec"].signature() == vbn.amortized["spec"].signature()
        w.set_inference_method("amortized", n_samples=S)
        pdf, s = w.infer_posterior(
            {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}}
        )
        assert not w._inference._last_fallback
        assert abs(_mean(w, pdf, s) - 0.5) < 0.08


def test_amortized_in_fused_dispatch(vbn):
    res = vbn.infer_posterior_many(
        [
            {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}},
            {"target": "x0", "evidence": {"x2": [[0.3]]}},
        ]
    )
    assert len(res) == 2
    assert abs(_mean(vbn, *res[0]) - 0.5) < 0.08
    assert abs(_mean(vbn, *res[1]) - 0.5) < 0.12


def test_observational_model_rows():
    """n_obs_sets adds do-free model-generated rows: the learner trains
    and still recovers the analytic posterior; the generated block's do
    masks are all zero (learning/amortized.py::_model_rows)."""
    from vectorizedbayesiannetwork_tpu.learning.amortized import (
        AmortizedLearner,
        build_spec,
    )

    v = _fit_lin_gauss(seed=3, epochs=40, n_obs_sets=3, n_do_sets=2)
    pdf, s = v.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}}
    )
    assert abs(_mean(v, pdf, s) - 0.5) < 0.07

    learner = AmortizedLearner(n_do_sets=2, n_obs_sets=3)
    spec = build_spec(v, (16,), "relu", 1e-3, interventional=True)
    rows = np.concatenate(
        [np.zeros((256, 1), np.float32) for _ in spec.topo], axis=-1
    )
    rng = np.random.default_rng(0)
    vals, obs, dos = learner._model_rows(v, spec, rows, rng, 2, 3)
    m_int = 256 * 2
    assert vals.shape[0] == 256 * 5
    assert (dos[m_int:] == 0).all()  # observational block: no do flags
    assert dos[:m_int].any()  # interventional block: real do-sets
    assert (obs >= dos).all()  # do'd values are always visible
