"""Update-policy sweep: every policy updates without refitting from scratch.

Modeled on the reference's ``tests/test_update.py:27-40`` (which
monkeypatches ``cpd.fit`` to prove updates never call fit) — here the
functional analogue asserts fit is not re-entered and state evolves.
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import UPDATE_REGISTRY, VBN, defaults


def make_vbn(cpd="gaussian_nn"):
    v = VBN(make_chain_graph(), seed=0)
    conf = defaults.cpd(cpd)
    conf["fit"] = {**conf["fit"], "epochs": 5, "batch_size": 512}
    v.set_learning_method(
        "node_wise", nodes_cpds={k: dict(conf) for k in ["x0", "x1", "x2"]}
    )
    v.fit(make_chain_df(n=800))
    return v


@pytest.mark.parametrize("name", sorted(UPDATE_REGISTRY))
def test_every_policy_runs(name):
    cpd = "linear_gaussian" if name == "streaming_stats" else "gaussian_nn"
    v = make_vbn(cpd)
    before = np.asarray(
        v.params["x2"]["weight" if cpd == "linear_gaussian" else "net"]
        if cpd == "linear_gaussian"
        else v.params["x2"]["net"]["layers"][0]["w"]
    ).copy()
    v.update(make_chain_df(n=200, seed=1), update_method=name)
    after = np.asarray(
        v.params["x2"]["weight"]
        if cpd == "linear_gaussian"
        else v.params["x2"]["net"]["layers"][0]["w"]
    )
    assert not np.allclose(before, after)  # params actually moved


def test_update_never_calls_fit(monkeypatch):
    v = make_vbn("gaussian_nn")

    def boom(*a, **k):
        raise AssertionError("update must not call fit")

    for node in v.nodes:
        monkeypatch.setattr(type(v.nodes[node]), "fit", boom, raising=True)
    v.update(make_chain_df(n=100, seed=2), update_method="online_sgd")


def test_update_rejects_training_keys():
    v = make_vbn("gaussian_nn")
    with pytest.raises(ValueError, match="per-CPD"):
        v.update(make_chain_df(n=100), update_method="online_sgd", lr=0.1)


def test_ema_rejects_closed_form():
    v = make_vbn("linear_gaussian")
    with pytest.raises(NotImplementedError):
        v.update(make_chain_df(n=100), update_method="ema")


def test_replay_buffer_accumulates():
    v = make_vbn("gaussian_nn")
    v.update(
        make_chain_df(n=100, seed=1),
        update_method="replay_buffer",
        max_size=150,
    )
    v.update(make_chain_df(n=100, seed=2))
    buf_p, buf_x = v._update_policy._buffer["x2"]
    assert buf_x.shape[0] == 150  # FIFO capped


def test_streaming_stats_refits_closed_form():
    v = make_vbn("linear_gaussian")
    # shift the data distribution; refit should track it
    import pandas as pd

    g = np.random.default_rng(5)
    n = 1000
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 2.0 * x0 + 0.5 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    v.update(df, update_method="streaming_stats")
    w = np.asarray(v.params["x2"]["weight"]).ravel()
    assert abs(w[0] - 2.0) < 0.05


def test_update_requires_first_method():
    v = make_vbn("gaussian_nn")
    v2 = VBN(make_chain_graph(), seed=0)
    v2.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]},
    )
    v2.fit(make_chain_df(n=200))
    with pytest.raises(RuntimeError, match="update_method"):
        v2.update(make_chain_df(n=50))


def test_fused_update_matches_eager_bitwise(monkeypatch):
    """The whole-network compiled update and the eager per-node loop must
    produce identical params (same key-stream consumption, same math)."""
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults
    from vectorizedbayesiannetwork_tpu.core.base import BaseCPD

    def build():
        g = np.random.default_rng(0)
        n = 1200
        x0 = g.normal(size=n)
        x1 = 0.7 * x0 + 0.2 * g.normal(size=n)
        df = pd.DataFrame({"x0": x0, "x1": x1})
        v = VBN(nx.DiGraph([("x0", "x1")]), seed=0)
        v.set_learning_method(
            "node_wise",
            nodes_cpds={
                "x0": defaults.cpd("linear_gaussian"),
                "x1": defaults.cpd("gaussian_nn"),
            },
        )
        v.fit(df)
        return v, df

    v1, df = build()
    v1.update(df.iloc[:256], update_method="online_sgd")
    assert "_update_prog_cache" in v1.__dict__ and v1._update_prog_cache

    v2, df = build()
    monkeypatch.setattr(BaseCPD, "update_program", lambda self, conf: None)
    for cls in type(v2.cpd_spec("x0")).__mro__:
        if "update_program" in cls.__dict__ and cls is not BaseCPD:
            monkeypatch.setattr(cls, "update_program", lambda self, conf: None)
    for cls in type(v2.cpd_spec("x1")).__mro__:
        if "update_program" in cls.__dict__ and cls is not BaseCPD:
            monkeypatch.setattr(cls, "update_program", lambda self, conf: None)
    v2.update(df.iloc[:256], update_method="online_sgd")
    assert not v2.__dict__.get("_update_prog_cache")

    import jax

    for node in ["x0", "x1"]:
        a = jax.tree_util.tree_leaves(v1.params[node])
        b = jax.tree_util.tree_leaves(v2.params[node])
        for la, lb in zip(a, b):
            if la is None or lb is None:
                continue
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_update_categorical_precheck():
    """Out-of-support rows raise from the fused path's host precheck."""
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(1)
    a = g.integers(0, 3, size=800)
    b = (a + g.integers(0, 2, size=800)) % 3
    df = pd.DataFrame({"a": a, "b": b}, dtype=float)
    v = VBN(nx.DiGraph([("a", "b")]), seed=0)
    conf = dict(defaults.cpd("categorical_table"), n_classes=3)
    conf2 = dict(conf)
    conf2["parent_n_classes"] = [3]
    v.set_learning_method("node_wise", nodes_cpds={"a": conf, "b": conf2})
    v.fit(df)
    v.update(df.iloc[:100], update_method="streaming_stats")
    assert v.__dict__.get("_update_prog_cache")
    bad = df.iloc[:50].copy()
    bad.loc[bad.index[0], "b"] = 7.0
    with pytest.raises(ValueError):
        v.update(bad)


def test_fused_update_emb_matches_eager(monkeypatch):
    """categorical_embedded_softmax's pure update program == eager update."""
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    def build():
        g = np.random.default_rng(3)
        a = g.integers(0, 3, size=900)
        b = (a + g.integers(0, 2, size=900)) % 3
        df = pd.DataFrame({"a": a, "b": b}, dtype=float)
        v = VBN(nx.DiGraph([("a", "b")]), seed=0)
        ca = dict(
            defaults.cpd("categorical_embedded_softmax"), n_classes=3
        )
        cb = dict(ca)
        cb["parent_n_classes"] = [3]
        v.set_learning_method("node_wise", nodes_cpds={"a": ca, "b": cb})
        v.fit(df)
        return v, df

    v1, df = build()
    v1.update(df.iloc[:200], update_method="online_sgd")
    assert v1.__dict__.get("_update_prog_cache")

    v2, df = build()
    from vectorizedbayesiannetwork_tpu.models.categorical_embedded_softmax import (
        CategoricalEmbeddedSoftmaxCPD,
    )

    monkeypatch.setattr(
        CategoricalEmbeddedSoftmaxCPD,
        "update_program",
        lambda self, conf: None,
    )
    v2.update(df.iloc[:200], update_method="online_sgd")

    import jax

    for node in ["a", "b"]:
        for la, lb in zip(
            jax.tree_util.tree_leaves(v1.params[node]),
            jax.tree_util.tree_leaves(v2.params[node]),
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-7
            )
