"""CPDHandle façade tests (parity: reference cpd_handle behaviors)."""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import VBN, defaults


@pytest.fixture(scope="module")
def vbn():
    v = VBN(make_chain_graph(), seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            "x0": defaults.cpd("linear_gaussian"),
            "x1": defaults.cpd("linear_gaussian"),
            "x2": {**defaults.cpd("mdn"), "n_components": 2,
                   "fit": {"epochs": 10, "batch_size": 512, "lr": 1e-2,
                           "weight_decay": 0.0}},
        },
    )
    v.fit(make_chain_df(n=800))
    return v


def test_dict_parent_coercion(vbn):
    h = vbn.get_cpd("x2")
    s1 = h.sample({"x0": [0.2], "x1": [-0.1]}, n_samples=32)
    assert np.asarray(s1).shape == (1, 32, 1)
    with pytest.raises(ValueError, match="Missing parent"):
        h.sample({"x0": [0.2]}, 8)
    with pytest.raises(ValueError, match="requires parent"):
        h.sample(None, 8)


def test_conditional_duck_typing(vbn):
    assert vbn.get_cpd("x0").conditional()["type"] == "normal_params"
    cond = vbn.get_cpd("x2").conditional({"x0": [0.2], "x1": [-0.1]})
    assert cond["type"] == "mixture_params"
    w = np.asarray(cond["weights"])
    assert np.allclose(w.sum(-1), 1.0, atol=1e-5)


def test_summary_and_export(vbn):
    s = vbn.get_cpd("x2").summary()
    assert s["cpd"] == "mdn" and s["parents"] == ["x0", "x1"]
    assert s["n_parameters"] > 0
    conf = vbn.get_cpd("x2").export_config()
    assert conf["cpd"] == "mdn" and conf["n_components"] == 2


def test_pdf_and_forward(vbn):
    h = vbn.get_cpd("x0")
    pdf = np.asarray(h.pdf([[0.0]], None))
    assert pdf.shape == (1, 1) and pdf[0, 0] > 0
    out = h.forward(None, 16)
    assert out.samples.shape == (1, 16, 1)
    assert np.allclose(np.asarray(out.pdf), np.exp(np.asarray(out.log_prob)))


def test_clone_cpd(vbn):
    spec, params = vbn.get_cpd("x0").clone_cpd()
    import jax

    s = spec.sample(params, jax.random.PRNGKey(0), None, 8)
    assert np.asarray(s).shape == (1, 8, 1)


def test_get_cpds(vbn):
    handles = vbn.get_cpds()
    assert set(handles) == {"x0", "x1", "x2"}
