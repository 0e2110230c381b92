"""Fit-time grouping: same-signature NN nodes train as one vmapped scan.

``node_wise`` groups nodes whose CPD class, dims, static config, and fit
hyperparams all match and calls ``fit_many`` (``models/_train.py::
fit_minibatch_nll_many``). Grouping must be a pure performance transform:
same per-node keys, same data order, so fitted params match the sequential
path up to batched-GEMM float associativity.
"""

import os

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import jax

from vectorizedbayesiannetwork_tpu import VBN, defaults

N_SIBLINGS = 4


def _df(n=600, seed=0):
    g = np.random.default_rng(seed)
    z = g.normal(size=n)
    cols = {"z": z}
    for i in range(N_SIBLINGS):
        cols[f"y{i}"] = (0.3 + 0.2 * i) * z + 0.1 * g.normal(size=n)
    return pd.DataFrame(cols)


def _fit(cpd_name, grouping):
    os.environ["VBN_FIT_GROUP"] = grouping
    try:
        G = nx.DiGraph([("z", f"y{i}") for i in range(N_SIBLINGS)])
        cfg = dict(defaults.cpd(cpd_name))
        cfg["fit"] = {**cfg["fit"], "epochs": 4, "batch_size": 128}
        if "hidden_dims" in cfg:
            cfg["hidden_dims"] = [16]
        v = VBN(G, seed=0)
        v.set_learning_method(
            "node_wise",
            nodes_cpds={
                "z": defaults.cpd("linear_gaussian"),
                **{f"y{i}": cfg for i in range(N_SIBLINGS)},
            },
        )
        v.fit(_df())
        return v
    finally:
        os.environ.pop("VBN_FIT_GROUP", None)


@pytest.mark.parametrize("cpd_name", ["gaussian_nn", "mdn"])
def test_grouped_fit_matches_sequential(cpd_name):
    vg = _fit(cpd_name, "always")
    vs = _fit(cpd_name, "never")
    for i in range(N_SIBLINGS):
        node = f"y{i}"
        pg = jax.tree_util.tree_leaves(vg.params[node]["net"])
        ps = jax.tree_util.tree_leaves(vs.params[node]["net"])
        for a, b in zip(pg, ps):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
            )


def test_grouped_fit_inference_works():
    v = _fit("gaussian_nn", "always")
    v.set_inference_method("likelihood_weighting", n_samples=128)
    pdf, s = v.infer_posterior({"target": "y1", "evidence": {"z": [[1.0]]}})
    assert np.all(np.isfinite(np.asarray(pdf)))
    assert np.asarray(s).shape == (1, 128, 1)


def test_update_stays_sequential():
    # fit_many declines when optimizer state exists; update() path must
    # keep working after a grouped initial fit
    v = _fit("gaussian_nn", "always")
    v.update(_df(seed=1).iloc[:128], update_method="online_sgd")
    v.set_inference_method("monte_carlo_marginalization", n_samples=64)
    pdf, s = v.infer_posterior({"target": "y0", "evidence": {"z": [[0.5]]}})
    assert np.all(np.isfinite(np.asarray(pdf)))
