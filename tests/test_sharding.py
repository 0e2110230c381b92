"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The JAX analogue of the reference's dummy-backend testing trick
(SURVEY.md §4): all sharded programs must compile AND produce results
equal to the unsharded ones.
"""

import jax
import numpy as np
import pytest

from conftest import make_chain_df, make_chain_graph
from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.parallel.mesh import make_mesh
from vectorizedbayesiannetwork_tpu.parallel.train import (
    gaussian_nn_dp_step,
    linear_gaussian_fit_step,
    shard_rows,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(n_data=2, devices=jax.devices()[:8])


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


def test_sharded_inference_matches_unsharded(vbn, mesh):
    q = {"target": "x0", "evidence": {"x2": [[0.3], [0.5]]}}
    vbn.set_inference_method("importance_sampling", n_samples=128)
    vbn.set_mesh(None)
    vbn._keys.set_state(1000)
    w1, s1 = vbn.infer_posterior(q)
    vbn.set_mesh(mesh)
    vbn._keys.set_state(1000)
    w2, s2 = vbn.infer_posterior(q)
    vbn.set_mesh(None)
    # partitionable threefry: same key -> same bits regardless of sharding
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_sharded_sampling_and_stats(vbn, mesh):
    vbn.set_mesh(mesh)
    vbn.set_sampling_method("ancestral")
    s = vbn.sample({"target": "x2", "evidence": {}}, n_samples=512)
    assert np.isfinite(np.asarray(s)).all()
    vbn.set_inference_method("likelihood_weighting", n_samples=256)
    w, smp = vbn.infer_posterior({"target": "x0", "evidence": {"x2": [[0.4]]}})
    stats = vbn._posterior_stats(w, smp)
    assert np.isfinite(np.asarray(stats["mean"])).all()
    vbn.set_mesh(None)


def test_dp_fit_matches_single_device(mesh):
    g = np.random.default_rng(0)
    n = 1024
    parents = g.normal(size=(n, 2)).astype(np.float32)
    x = (
        parents @ np.array([[0.5], [-0.2]], np.float32)
        + 0.05 * g.normal(size=(n, 1)).astype(np.float32)
    )
    p_sh, x_sh = shard_rows(mesh, parents, x)
    fit = linear_gaussian_fit_step(mesh, p_sh, x_sh)
    np.testing.assert_allclose(
        np.asarray(fit["weight"]).ravel(), [0.5, -0.2], atol=0.02
    )
    # equals the library's lstsq fit
    from vectorizedbayesiannetwork_tpu import CPD_REGISTRY

    cpd = CPD_REGISTRY["linear_gaussian"](2, 1, seed=0)
    params = cpd.fit(cpd.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), parents, x)
    np.testing.assert_allclose(
        np.asarray(fit["weight"]), np.asarray(params["weight"]), atol=1e-3
    )


def test_dp_nn_grad_step(mesh):
    from vectorizedbayesiannetwork_tpu import CPD_REGISTRY

    g = np.random.default_rng(0)
    parents = g.normal(size=(512, 2)).astype(np.float32)
    x = (parents @ np.array([[0.5], [-0.2]], np.float32)).astype(np.float32)
    cpd = CPD_REGISTRY["gaussian_nn"](2, 1, seed=0, hidden_dims=[8])
    net0 = cpd.init(jax.random.PRNGKey(0))["net"]
    p_sh, x_sh = shard_rows(mesh, parents, x)
    net1, opt = gaussian_nn_dp_step(mesh, cpd, net0, None, p_sh, x_sh)
    # gradient step moved the params
    assert not np.allclose(
        np.asarray(net0["layers"][0]["w"]), np.asarray(net1["layers"][0]["w"])
    )
    assert float(np.asarray(opt["step"])) == 1.0


def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out[0]).shape == (4, 1024)
    ge.dryrun_multichip(8)


def test_ris_resampling_under_mesh(vbn, mesh):
    """RIS's resample step must stay mesh-compatible: under a mesh the
    sweep uses the ppermute-ring distributed resampling
    (ops/resample_distributed.py) with per-shard sorted gathers."""
    vbn.set_mesh(mesh)
    try:
        vbn.set_inference_method(
            "resampled_importance_sampling",
            n_samples=2048,
            ess_threshold=0.9,
        )
        ev = {"x2": np.array([[0.6], [0.2]], np.float32)}
        pdf, samples = vbn.infer_posterior(
            {"target": "x0", "evidence": ev}
        )
        assert np.asarray(pdf).shape == (2, 2048)
        assert np.isfinite(np.asarray(pdf)).all()
        assert np.isfinite(np.asarray(samples)).all()
    finally:
        vbn.set_mesh(None)


@pytest.mark.parametrize(
    "method,kw",
    [
        ("gibbs", {"burn_in": 2, "thinning": 1}),
        ("hmc", {"burn_in": 2, "n_leapfrog": 3}),
        ("nuts", {"burn_in": 2, "max_depth": 3}),
    ],
)
def test_mcmc_chains_sharded_match_unsharded(vbn, mesh, method, kw):
    """MCMC samplers under the mesh: compile, run, and (partitionable
    threefry) produce the SAME chains as unsharded at equal seeds
    (round-2 VERDICT next #7)."""
    q = {"target": "x2", "evidence": {"x0": [[0.1], [-0.1]]}}
    vbn.set_sampling_method(method, **kw)
    vbn.set_mesh(None)
    vbn._keys.set_state(777)
    s1 = np.asarray(vbn.sample(q, n_samples=16))
    vbn.set_mesh(mesh)
    vbn._keys.set_state(777)
    s2 = np.asarray(vbn.sample(q, n_samples=16))
    vbn.set_mesh(None)
    assert np.isfinite(s1).all() and np.isfinite(s2).all()
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_fused_update_dispatch_under_mesh_matches_unsharded(mesh):
    """The whole-network fused update dispatch under a mesh equals the
    unsharded update (data-parallel sufficient-stats psum reduction
    point, SURVEY.md §5.8)."""

    def fresh():
        v = VBN(make_chain_graph(), seed=0)
        v.set_learning_method(
            "node_wise",
            nodes_cpds={
                k: defaults.cpd("linear_gaussian")
                for k in ["x0", "x1", "x2"]
            },
        )
        v.fit(make_chain_df())
        return v

    g = np.random.default_rng(5)
    x0 = g.normal(size=64)
    upd = {
        "x0": x0.reshape(-1, 1).astype(np.float32),
        "x1": (0.8 * x0 + 0.1 * g.normal(size=64))
        .reshape(-1, 1)
        .astype(np.float32),
    }
    upd["x2"] = (
        (0.5 * upd["x1"][:, 0] + 0.1 * g.normal(size=64))
        .reshape(-1, 1)
        .astype(np.float32)
    )

    v1 = fresh()
    v1.update(upd, update_method="streaming_stats")
    v2 = fresh()
    v2.set_mesh(mesh)
    v2.update(upd, update_method="streaming_stats")
    v2.set_mesh(None)
    for node in ["x0", "x1", "x2"]:
        p1, p2 = v1.params[node], v2.params[node]
        for k in p1:
            np.testing.assert_allclose(
                np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-4, err_msg=f"{node}.{k}"
            )
