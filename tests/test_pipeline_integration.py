"""End-to-end pipeline: fit -> infer -> do-infer -> sample -> persistence.

Parity with the reference's ``tests/test_pipeline_integration.py:6-57`` and
statistical-correctness tests (``tests/test_cpds.py:105-131``,
``tests/test_sampling.py:57-75``): linear-Gaussian recovery of true
coefficients, analytic posterior means, and causal do-effects.
"""

import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import VBN, defaults


@pytest.fixture(scope="module")
def fitted():
    vbn = VBN(make_chain_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    vbn.fit(make_chain_df())
    return vbn


def test_linear_gaussian_recovery(fitted):
    w = np.asarray(fitted.params["x2"]["weight"]).ravel()
    assert abs(w[0] - 0.5) < 0.05
    assert abs(w[1] + 0.2) < 0.05
    assert abs(float(fitted.params["x2"]["bias"][0])) < 0.05
    assert abs(float(np.sqrt(fitted.params["x2"]["var"][0])) - 0.1) < 0.03


def test_mcm_posterior_matches_analytic(fitted):
    fitted.set_inference_method(
        "monte_carlo_marginalization", n_samples=2048
    )
    pdf, samples = fitted.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
    )
    assert pdf.shape == (1, 2048)
    assert samples.shape == (1, 2048, 1)
    assert np.all(np.isfinite(np.asarray(pdf)))
    mean = float(np.mean(np.asarray(samples)))
    assert abs(mean - (0.5 * 0.3 - 0.2 * -0.2)) < 0.02


def test_do_intervention_effect(fitted):
    fitted.set_sampling_method("ancestral")
    s1 = np.asarray(
        fitted.sample({"target": "x2", "evidence": {}, "do": {"x0": [[1.0]]}},
                      n_samples=4096)
    )
    s0 = np.asarray(
        fitted.sample({"target": "x2", "evidence": {}, "do": {"x0": [[-1.0]]}},
                      n_samples=4096)
    )
    effect = float(np.mean(s1) - np.mean(s0))
    assert abs(effect - 1.0) < 0.05  # 0.5 * (1 - (-1))


def test_do_on_target_is_delta(fitted):
    fitted.set_inference_method("monte_carlo_marginalization", n_samples=64)
    pdf, samples = fitted.infer_posterior(
        {"target": "x2", "evidence": {}, "do": {"x2": [[0.7]]}}
    )
    assert np.allclose(np.asarray(samples), 0.7)
    assert np.allclose(np.asarray(pdf), 1.0)


def test_importance_sampling_inverts(fitted):
    # p(x0 | x2=0.5): posterior mean should be pulled toward positive x0.
    fitted.set_inference_method("importance_sampling", n_samples=4096)
    w, s = fitted.infer_posterior({"target": "x0", "evidence": {"x2": [[0.5]]}})
    stats = fitted._posterior_stats(w, s)
    # analytic: prior x0~N(0,1); likelihood x2|x0 ~ N(0.5 x0, 0.1^2+0.2^2*1)
    # posterior mean = 0.5*0.5 / (0.5^2 + 0.1^2 + 0.04) ~ 0.86
    assert float(stats["mean"][0, 0]) > 0.5
    assert np.all(np.asarray(stats["ess"]) > 1.0)


def test_batched_queries(fitted):
    fitted.set_inference_method("monte_carlo_marginalization", n_samples=256)
    ev = {"x0": [[0.3], [1.0], [-1.0]], "x1": [[-0.2], [0.0], [0.5]]}
    pdf, samples = fitted.infer_posterior({"target": "x2", "evidence": ev})
    assert pdf.shape == (3, 256)
    means = np.mean(np.asarray(samples), axis=1).ravel()
    expect = [0.5 * 0.3 - 0.2 * -0.2, 0.5, -0.5 - 0.1]
    assert np.allclose(means, expect, atol=0.05)


def test_save_load_roundtrip(fitted, tmp_path):
    fitted.set_inference_method("monte_carlo_marginalization", n_samples=128)
    fitted.set_sampling_method("ancestral")
    path = str(tmp_path / "ckpt")
    fitted.save(path)
    vbn2 = VBN.load(path)
    pdf, samples = vbn2.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
    )
    assert pdf.shape == (1, 128)
    s = vbn2.sample({"target": "x2", "evidence": {}}, n_samples=32)
    assert s.shape == (1, 32, 1)
    for node in ["x0", "x1", "x2"]:
        np.testing.assert_allclose(
            np.asarray(fitted.params[node]["bias"]),
            np.asarray(vbn2.params[node]["bias"]),
        )


def test_infer_relative(fitted):
    fitted.set_inference_method("monte_carlo_marginalization", n_samples=512)
    out = fitted.infer_relative({"target": "x2", "evidence": {"x0": [[1.0]]}})
    assert out["target"] == "x2"
    assert abs(float(out["delta_mean"][0, 0]) - 0.5) < 0.1
    assert "effective_sample_size" in out["query_stats"]


def test_outputs_finite_and_detached(fitted):
    fitted.set_inference_method("likelihood_weighting", n_samples=256)
    w, s = fitted.infer_posterior({"target": "x0", "evidence": {"x2": [[0.2]]}})
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.isfinite(np.asarray(s)))
    # weights normalized
    assert np.allclose(np.asarray(w).sum(axis=1), 1.0, atol=1e-4)
