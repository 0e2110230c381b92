"""Registry-sweep CPD tests: shape / finiteness / contract checks for every
registered CPD family, plus statistical-correctness checks.

Modeled on the reference's ``tests/test_cpds.py:10-131`` (SURVEY.md §4).
"""

import jax
import numpy as np
import pytest

import vectorizedbayesiannetwork_tpu as vt
from vectorizedbayesiannetwork_tpu import CPD_REGISTRY

B, S = 4, 16

# Per-family constructor kwargs + whether the family needs discrete data.
FAMILIES = {
    "linear_gaussian": ({}, False),
    "gaussian_nn": ({"hidden_dims": [16]}, False),
    "mdn": ({"n_components": 3, "hidden_dims": [16]}, False),
    "rff_gaussian": ({"n_features": 32}, False),
    "kde": ({"max_points": 128}, False),
    "softmax_nn": ({"n_classes": 6, "hidden_dims": [16]}, False),
    "categorical_table": ({"n_classes": 3}, True),
    "categorical_embedded_softmax": (
        {"n_classes": 3, "embedding_dim": 4, "hidden_dims": [16]},
        True,
    ),
}

FIT_KW = {"epochs": 3, "batch_size": 256, "lr": 1e-2}


def make_data(discrete, n=400, input_dim=2, seed=0):
    g = np.random.default_rng(seed)
    if discrete:
        parents = g.integers(0, 3, size=(n, input_dim)).astype(np.float32)
        x = ((parents.sum(axis=1, keepdims=True) + g.integers(0, 2, (n, 1))) % 3).astype(
            np.float32
        )
    else:
        parents = g.normal(size=(n, input_dim)).astype(np.float32)
        w = np.array([[0.8], [-0.5]], np.float32)[:input_dim]
        x = parents @ w + 0.2 * g.normal(size=(n, 1)).astype(np.float32)
    return parents, x


def fitted_cpd(name, input_dim=2):
    kwargs, discrete = FAMILIES[name]
    parents, x = make_data(discrete, input_dim=max(input_dim, 1))
    if input_dim == 0:
        parents = None
    cpd = CPD_REGISTRY[name](input_dim, 1, seed=0, **kwargs)
    key = jax.random.PRNGKey(0)
    params = cpd.init(key)
    params = cpd.fit(params, key, parents, x, **FIT_KW)
    return cpd, params, parents, x


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_cpd_contract_with_parents(name):
    cpd, params, parents, x = fitted_cpd(name, input_dim=2)
    key = jax.random.PRNGKey(1)
    pb = parents[:B]  # [B, 2]
    samples = cpd.sample(params, key, pb, S)
    assert samples.shape == (B, S, 1)
    assert np.all(np.isfinite(np.asarray(samples)))
    lp = cpd.log_prob(params, samples, pb)
    assert lp.shape == (B, S)
    assert np.all(np.isfinite(np.asarray(lp)))
    out = cpd.forward(params, key, pb, S)
    assert out.samples.shape == (B, S, 1)
    assert out.pdf.shape == (B, S)
    assert np.all(np.asarray(out.pdf) >= 0)


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_cpd_contract_root(name):
    cpd, params, _, x = fitted_cpd(name, input_dim=0)
    key = jax.random.PRNGKey(2)
    samples = cpd.sample(params, key, None, S)
    assert samples.shape == (1, S, 1)
    lp = cpd.log_prob(params, samples, None)
    assert lp.shape == (1, S)
    assert np.all(np.isfinite(np.asarray(lp)))


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_cpd_3d_parents(name):
    cpd, params, parents, _ = fitted_cpd(name, input_dim=2)
    key = jax.random.PRNGKey(3)
    p3 = np.repeat(parents[:B][:, None, :], S, axis=1)  # [B, S, 2]
    samples = cpd.sample(params, key, p3, S)
    assert samples.shape == (B, S, 1)
    lp = cpd.log_prob(params, samples, p3)
    assert lp.shape == (B, S)


def test_linear_gaussian_fit_recovery():
    cpd, params, parents, x = fitted_cpd("linear_gaussian")
    w = np.asarray(params["weight"]).ravel()
    assert np.allclose(w, [0.8, -0.5], atol=0.05)


def test_gaussian_nn_learns_conditional_mean():
    kwargs, _ = FAMILIES["gaussian_nn"]
    parents, x = make_data(False, n=2000)
    cpd = CPD_REGISTRY["gaussian_nn"](2, 1, seed=0, **kwargs)
    key = jax.random.PRNGKey(0)
    params = cpd.init(key)
    params = cpd.fit(
        params, key, parents, x, epochs=200, batch_size=512, lr=1e-2
    )
    test_p = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 1.0]], np.float32)
    loc, scale = cpd.conditional_params(params, test_p)
    expect = test_p @ np.array([[0.8], [-0.5]], np.float32)
    assert np.allclose(np.asarray(loc), expect, atol=0.1)
    assert np.all(np.asarray(scale) < 0.5)


def test_mdn_mixture_log_prob_integrates():
    # MDN on bimodal data: held-out NLL should beat a single Gaussian's.
    g = np.random.default_rng(0)
    n = 2000
    comp = g.integers(0, 2, n)
    x = np.where(comp == 0, -2.0, 2.0) + 0.3 * g.normal(size=n)
    x = x.astype(np.float32)[:, None]
    cpd = CPD_REGISTRY["mdn"](0, 1, seed=0, n_components=3, hidden_dims=[16])
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, None, x, epochs=300, batch_size=512, lr=2e-2)
    lp = cpd.log_prob(params, x[:200].reshape(1, 200, 1), None)
    mdn_nll = -float(np.mean(np.asarray(lp)))
    # single-gaussian NLL on same data
    mu, sd = x.mean(), x.std()
    ref_nll = float(
        np.mean(0.5 * ((x[:200] - mu) / sd) ** 2 + np.log(sd) + 0.5 * np.log(2 * np.pi))
    )
    assert mdn_nll < ref_nll - 0.3


def test_categorical_table_exact_cpt():
    # Deterministic x = parent mod 3: table should recover near-delta rows.
    g = np.random.default_rng(0)
    parents = g.integers(0, 3, size=(500, 1)).astype(np.float32)
    x = (parents % 3).astype(np.float32)
    cpd = CPD_REGISTRY["categorical_table"](1, 1, seed=0, n_classes=3, alpha=0.0)
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, parents, x)
    probs = np.asarray(
        cpd.categorical_probs(params, np.array([[0.0], [1.0], [2.0]], np.float32))
    )
    assert probs.shape == (3, 3)
    assert np.allclose(probs, np.eye(3), atol=1e-5)


def test_categorical_table_smoothing():
    parents = np.zeros((10, 1), np.float32)
    x = np.zeros((10, 1), np.float32)
    cpd = CPD_REGISTRY["categorical_table"](
        1, 1, seed=0, n_classes=2, alpha=1.0, alpha_mode="per_class"
    )
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, parents, x)
    probs = np.asarray(cpd.categorical_probs(params, np.array([[0.0]], np.float32)))
    # counts: [10+1, 0+1] -> [11/12, 1/12]
    assert np.allclose(probs, [[11 / 12, 1 / 12]], atol=1e-5)


def test_kde_log_prob_density():
    g = np.random.default_rng(0)
    x = g.normal(size=(1000, 1)).astype(np.float32)
    cpd = CPD_REGISTRY["kde"](0, 1, seed=0, bandwidth=0.3, max_points=512)
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, None, x)
    test_x = np.array([[[0.0]], [[3.5]]], np.float32)  # [2,1,1]
    lp = np.asarray(cpd.log_prob(params, test_x, None))
    assert lp[0, 0] > lp[1, 0]  # density higher at the mode
    # ~N(0,1+bw^2) at 0: log pdf ~ -0.96
    assert abs(lp[0, 0] - (-0.5 * np.log(2 * np.pi * (1 + 0.3**2)))) < 0.25


def test_kde_update_respects_max_points():
    g = np.random.default_rng(0)
    cpd = CPD_REGISTRY["kde"](0, 1, seed=0, max_points=64)
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, None, g.normal(size=(50, 1)).astype(np.float32))
    assert float(np.sum(np.asarray(params["valid"]))) == 50
    params = cpd.update(params, key, None, g.normal(size=(50, 1)).astype(np.float32))
    assert float(np.sum(np.asarray(params["valid"]))) == 64
    assert params["data_x"].shape == (64, 1)


def test_softmax_nn_discrete_detection():
    g = np.random.default_rng(0)
    parents = g.normal(size=(600, 1)).astype(np.float32)
    x = (parents > 0).astype(np.float32)  # exactly 2 unique values
    cpd = CPD_REGISTRY["softmax_nn"](1, 1, seed=0, n_classes=2, hidden_dims=[16])
    key = jax.random.PRNGKey(0)
    params = cpd.fit(
        cpd.init(key), key, parents, x, epochs=100, batch_size=256, lr=1e-2
    )
    assert bool(np.asarray(params["bins"]["is_discrete"])[0] == 1.0)
    samples = np.asarray(cpd.sample(params, key, np.array([[2.0]], np.float32), 200))
    assert set(np.unique(samples)).issubset({0.0, 1.0})
    assert samples.mean() > 0.9  # parent 2.0 -> class 1
    probs = np.asarray(cpd.categorical_probs(params, np.array([[2.0]], np.float32)))
    assert probs[0, 1] > 0.9


def test_softmax_nn_continuous_binned_density():
    g = np.random.default_rng(0)
    x = g.normal(size=(2000, 1)).astype(np.float32)
    cpd = CPD_REGISTRY["softmax_nn"](
        0, 1, seed=0, n_classes=8, binning="quantile", within_bin="triangular"
    )
    key = jax.random.PRNGKey(0)
    params = cpd.fit(cpd.init(key), key, None, x)
    lp = np.asarray(
        cpd.log_prob(params, np.array([[[0.0]], [[2.5]]], np.float32), None)
    )
    assert np.all(np.isfinite(lp))
    assert lp[0, 0] > lp[1, 0]
    # outside the observed range: -inf without clipping
    lp_out = np.asarray(cpd.log_prob(params, np.array([[[99.0]]], np.float32), None))
    assert lp_out[0, 0] == -np.inf


def test_cat_emb_softmax_learns_mapping():
    g = np.random.default_rng(0)
    parents = g.integers(0, 3, size=(1500, 1)).astype(np.float32)
    x = (parents % 3).astype(np.float32)
    cpd = CPD_REGISTRY["categorical_embedded_softmax"](
        1, 1, seed=0, n_classes=3, embedding_dim=4, hidden_dims=[16]
    )
    key = jax.random.PRNGKey(0)
    params = cpd.fit(
        cpd.init(key), key, parents, x, epochs=150, batch_size=512, lr=1e-2
    )
    probs = np.asarray(
        cpd.categorical_probs(params, np.array([[0.0], [1.0], [2.0]], np.float32))
    )
    assert np.all(np.diag(probs) > 0.8)


def test_nn_cpd_optimizer_persists():
    cpd, params, parents, x = fitted_cpd("gaussian_nn")
    assert params["opt"] is not None
    step0 = float(np.asarray(params["opt"]["step"]))
    params2 = cpd.update(params, jax.random.PRNGKey(9), parents, x, n_steps=1)
    step1 = float(np.asarray(params2["opt"]["step"]))
    assert step1 > step0  # Adam moments carried across update calls
