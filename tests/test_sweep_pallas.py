"""Fused Pallas categorical sweep: bit-level + statistical correctness.

The kernel (ops/sweep_pallas.py) runs the whole LW topo sweep in VMEM.
In interpret mode the in-kernel PRNG has no lowering, so tests inject an
external uniform field and check the kernel against an independent numpy
implementation of the same inverse-CDF sweep (bit-level), and the
weighted posterior against exact enumeration (statistical).
"""

import networkx as nx
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from benchmarking.data_gen import generate_dataset
from benchmarking.exact import exact_posterior
from benchmarking.networks import asia
from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.core.base import Query
from vectorizedbayesiannetwork_tpu.core.plan import get_plan
from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
    _stacked_counts,
    categorical_sweep_fused,
    categorical_sweep_supported,
    plan_tuple_for,
)

B, S = 4, 2048


@pytest.fixture(scope="module")
def fitted():
    bn = asia()
    data = generate_dataset(bn, 4096, seed=0)
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    vbn = VBN(g, seed=0)
    conf = {}
    for node in bn.nodes:
        c = dict(defaults.cpd("categorical_table"), n_classes=bn.card(node))
        if bn.parents[node]:
            c["parent_n_classes"] = [bn.card(p) for p in bn.parents[node]]
        conf[node] = c
    vbn.set_learning_method("node_wise", nodes_cpds=conf)
    vbn.fit(
        {k: np.asarray(v, np.float32).reshape(-1, 1) for k, v in data.items()}
    )
    query = Query(
        target="dysp",
        evidence={
            "smoke": np.ones((B, 1), np.float32),
            "asia": np.zeros((B, 1), np.float32),
        },
        do={},
    )
    plan = get_plan(vbn, query)
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    return bn, vbn, plan, cpds, params


def _numpy_reference(plan_struct, counts_np, fixed_idx, u):
    """Independent inverse-CDF sweep (same semantics, plain numpy)."""
    (
        n_nodes,
        parent_idx,
        ev_mask,
        do_mask,
        target_idx,
        offs,
        pstates,
        cards,
        strides,
    ) = plan_struct
    b, n, s = u.shape
    vals = np.zeros((n_nodes, b, s), np.int64)
    logw = np.zeros((b, s))
    lpt = np.zeros((b, s))
    for i in range(n_nodes):
        tbl = counts_np[offs[i] : offs[i] + pstates[i], : cards[i]]
        if parent_idx[i]:
            pidx = sum(
                vals[p] * strides[i][k]
                for k, p in enumerate(parent_idx[i])
            )
        else:
            pidx = np.zeros((b, s), np.int64)
        rowp = tbl[pidx]  # [b, s, c]
        total = rowp.sum(-1)
        if ev_mask[i] or do_mask[i]:
            v = np.broadcast_to(fixed_idx[:, i][:, None], (b, s)).astype(
                np.int64
            )
        else:
            thresh = u[:, i] * total
            cum = np.cumsum(rowp, axis=-1)
            v = (cum[..., :-1] <= thresh[..., None]).sum(-1)
        vals[i] = v
        sel = np.take_along_axis(rowp, v[..., None], axis=-1)[..., 0]
        lp = np.log(np.maximum(sel / np.maximum(total, 1e-12), 1e-12))
        if ev_mask[i]:
            logw += lp
        if i == target_idx:
            lpt = lp
    return logw, vals[target_idx].astype(np.float32), lpt


def test_supported_gate(fitted):
    bn, vbn, plan, cpds, params = fitted
    assert categorical_sweep_supported(plan, cpds, 2048)
    assert not categorical_sweep_supported(plan, cpds, 1000)  # not /1024


def test_matches_numpy_reference(fitted):
    bn, vbn, plan, cpds, params = fitted
    plan_struct, total_rows, cmax = plan_tuple_for(plan, cpds)
    counts = _stacked_counts(cpds, params, total_rows, cmax)
    rng = np.random.default_rng(3)
    u = rng.uniform(
        1e-6, 1.0 - 1e-6, size=(B, plan.n_nodes, S)
    ).astype(np.float32)
    fixed_idx = np.zeros((B, plan.n_nodes), np.int32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            name = plan.topo_order[i]
            fixed_idx[:, i] = 1 if name == "smoke" else 0
    logw, tgt, lpt, _red = categorical_sweep_fused(
        jax.random.PRNGKey(0),
        jnp.asarray(fixed_idx),
        counts,
        plan_struct,
        S,
        interpret=True,
        u_ext=jnp.asarray(u),
    )
    ref_logw, ref_tgt, ref_lpt = _numpy_reference(
        plan_struct, np.asarray(counts), fixed_idx, u.astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(tgt), ref_tgt)
    np.testing.assert_allclose(np.asarray(logw), ref_logw, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lpt), ref_lpt, atol=1e-4)


def test_posterior_matches_exact(fitted):
    bn, vbn, plan, cpds, params = fitted
    plan_struct, total_rows, cmax = plan_tuple_for(plan, cpds)
    counts = _stacked_counts(cpds, params, total_rows, cmax)
    rng = np.random.default_rng(11)
    s = 1 << 14
    u = rng.uniform(1e-6, 1.0 - 1e-6, size=(1, plan.n_nodes, s)).astype(
        np.float32
    )
    fixed_idx = np.zeros((1, plan.n_nodes), np.int32)
    for i in range(plan.n_nodes):
        if plan.topo_order[i] == "smoke":
            fixed_idx[0, i] = 1
    logw, tgt, _, _red = categorical_sweep_fused(
        jax.random.PRNGKey(0),
        jnp.asarray(fixed_idx),
        counts,
        plan_struct,
        s,
        interpret=True,
        u_ext=jnp.asarray(u),
    )
    w = np.exp(np.asarray(logw)[0] - np.asarray(logw)[0].max())
    t = np.asarray(tgt)[0]
    p1 = float(w[t > 0.5].sum() / w.sum())
    # the fitted-CPT exact posterior (fit error excluded by using the
    # same VBN's CPTs via enumeration over the true bn is close enough
    # at 4096 fit rows)
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    assert abs(p1 - float(exact[1])) < 0.05


# ---------------------------------------------------------------------------
# Linear-Gaussian fused sweep
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lg_fitted():
    from conftest import make_chain_df, make_chain_graph

    vbn = VBN(make_chain_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    vbn.fit(make_chain_df())
    query = Query(
        target="x2",
        evidence={"x0": np.full((B, 1), 0.5, np.float32)},
        do={},
    )
    plan = get_plan(vbn, query)
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    return vbn, plan, cpds, params


def test_lg_matches_numpy_reference(lg_fitted):
    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        lg_param_table,
        lg_plan_tuple_for,
        lg_sweep_fused,
        lg_sweep_supported,
    )

    vbn, plan, cpds, params = lg_fitted
    assert lg_sweep_supported(plan, cpds, 2048)
    plan_struct, dmax = lg_plan_tuple_for(plan, cpds)
    ptab = lg_param_table(
        cpds, params, dmax, tuple(c.min_scale for c in cpds)
    )
    rng = np.random.default_rng(5)
    n = plan.n_nodes
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, 2 * n, S)).astype(np.float32)
    fixed = np.zeros((B, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
    logw, tgt, lpt, _red = lg_sweep_fused(
        jax.random.PRNGKey(0),
        jnp.asarray(fixed),
        ptab,
        plan_struct,
        dmax,
        S,
        interpret=True,
        u_ext=jnp.asarray(u),
    )
    # numpy reference with identical Box-Muller draws
    n_nodes, parent_idx, ev_mask, do_mask, target_idx = plan_struct
    pt = np.asarray(ptab, np.float64)
    vals = np.zeros((n_nodes, B, S))
    ref_logw = np.zeros((B, S))
    ref_lpt = np.zeros((B, S))
    for i in range(n_nodes):
        loc = np.full((B, S), pt[i, dmax])
        for k, p in enumerate(parent_idx[i]):
            loc = loc + vals[p] * pt[i, k]
        sigma = pt[i, dmax + 1]
        if ev_mask[i] or do_mask[i]:
            v = np.broadcast_to(fixed[:, i][:, None], (B, S)).astype(
                np.float64
            )
        else:
            u1 = u[:, 2 * i].astype(np.float64)
            u2 = u[:, 2 * i + 1].astype(np.float64)
            z = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
            v = loc + sigma * z
        vals[i] = v
        zz = (v - loc) / sigma
        lp = -0.5 * zz**2 - np.log(sigma) - 0.9189385332046727
        if ev_mask[i]:
            ref_logw += lp
        if i == target_idx:
            ref_lpt = lp
    np.testing.assert_allclose(np.asarray(tgt), vals[target_idx], atol=2e-4)
    np.testing.assert_allclose(np.asarray(logw), ref_logw, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lpt), ref_lpt, atol=2e-3)


def test_lg_posterior_matches_closed_form(lg_fitted):
    """LW posterior mean via the fused LG sweep vs exact conditioning."""
    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        lg_param_table,
        lg_plan_tuple_for,
        lg_sweep_fused,
    )

    vbn, plan, cpds, params = lg_fitted
    plan_struct, dmax = lg_plan_tuple_for(plan, cpds)
    ptab = lg_param_table(
        cpds, params, dmax, tuple(c.min_scale for c in cpds)
    )
    rng = np.random.default_rng(9)
    s = 1 << 14
    n = plan.n_nodes
    u = rng.uniform(1e-6, 1 - 1e-6, size=(1, 2 * n, s)).astype(np.float32)
    fixed = np.zeros((1, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
    logw, tgt, _, _red = lg_sweep_fused(
        jax.random.PRNGKey(1),
        jnp.asarray(fixed),
        ptab,
        plan_struct,
        dmax,
        s,
        interpret=True,
        u_ext=jnp.asarray(u),
    )
    w = np.exp(np.asarray(logw)[0] - np.asarray(logw)[0].max())
    mean = float((w * np.asarray(tgt)[0]).sum() / w.sum())
    # collider x0 -> x2 <- x1, evidence on x0 only (ancestral evidence):
    # E[x2 | x0=0.5] = b_t + w_{x0}*0.5 + w_{x1}*E[x1]
    pt = np.asarray(ptab)
    t = plan.target_idx
    expect = pt[t, dmax]
    for k, p in enumerate(plan.parent_idx[t]):
        p_mean = 0.5 if plan.evidence_mask[p] else pt[p, dmax]
        expect += pt[t, k] * p_mean
    assert abs(mean - expect) < 0.05


# ---------------------------------------------------------------------------
# In-kernel posterior reductions (round-3 VERDICT next #3)
# ---------------------------------------------------------------------------

def test_pmf_reduction_matches_streams(fitted):
    """want=('pmf_logw',) must equal the host-side weighted histogram of
    the streamed (logw, tgt) outputs at identical uniforms."""
    bn, vbn, plan, cpds, params = fitted
    plan_struct, total_rows, cmax = plan_tuple_for(plan, cpds)
    counts = _stacked_counts(cpds, params, total_rows, cmax)
    rng = np.random.default_rng(7)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, plan.n_nodes, S)).astype(
        np.float32
    )
    fixed_idx = np.zeros((B, plan.n_nodes), np.int32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i] and plan.topo_order[i] == "smoke":
            fixed_idx[:, i] = 1
    logw, tgt, _, _ = categorical_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed_idx), counts,
        plan_struct, S, interpret=True, u_ext=jnp.asarray(u),
        want=("logw", "tgt"),
    )
    _, _, _, red = categorical_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed_idx), counts,
        plan_struct, S, interpret=True, u_ext=jnp.asarray(u),
        want=("pmf_logw",),
    )
    sums, m = np.asarray(red[0]), np.asarray(red[1])
    logw_np, tgt_np = np.asarray(logw), np.asarray(tgt)
    tcard = cpds[plan.target_idx].resolved_classes
    # host-side reference: pmf_c = sum_s exp(logw - m) [tgt == c]
    for bi in range(B):
        w = np.exp(logw_np[bi].astype(np.float64) - m[bi])
        for c in range(tcard):
            expect = w[tgt_np[bi] == c].sum()
            np.testing.assert_allclose(
                sums[bi, c], expect, rtol=2e-4, err_msg=f"b={bi} c={c}"
            )
    # lanes past the target's support stay zero (unnormalized rows)
    assert np.allclose(sums[:, tcard:], 0.0)


def test_lg_moments_reduction_matches_streams(lg_fitted):
    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        lg_param_table,
        lg_plan_tuple_for,
        lg_sweep_fused,
    )

    vbn, plan, cpds, params = lg_fitted
    plan_struct, dmax = lg_plan_tuple_for(plan, cpds)
    ptab = lg_param_table(cpds, params, dmax, tuple(c.min_scale for c in cpds))
    rng = np.random.default_rng(13)
    n = plan.n_nodes
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, 2 * n, S)).astype(np.float32)
    fixed = np.zeros((B, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
    logw, tgt, _, _ = lg_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed), ptab, plan_struct,
        dmax, S, interpret=True, u_ext=jnp.asarray(u),
        want=("logw", "tgt"),
    )
    _, _, _, red = lg_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed), ptab, plan_struct,
        dmax, S, interpret=True, u_ext=jnp.asarray(u), want=("mom_logw",),
    )
    sums, m = np.asarray(red[0]), np.asarray(red[1])
    logw_np = np.asarray(logw).astype(np.float64)
    x = np.asarray(tgt).astype(np.float64)
    for bi in range(B):
        e = np.exp(logw_np[bi] - m[bi])
        np.testing.assert_allclose(sums[bi, 0], e.sum(), rtol=2e-4)
        np.testing.assert_allclose(sums[bi, 1], (e * x[bi]).sum(), rtol=2e-3)
        np.testing.assert_allclose(
            sums[bi, 2], (e * x[bi] ** 2).sum(), rtol=2e-3
        )
    # weighted mean/std against the stream-derived values
    mean = sums[:, 1] / sums[:, 0]
    w = np.exp(logw_np - m[:, None])
    ref_mean = (w * x).sum(1) / w.sum(1)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-3)


# ---------------------------------------------------------------------------
# Mesh composition via shard_map (round-3 VERDICT next #1)
# ---------------------------------------------------------------------------

def _fused_fn_for(vbn, query, s, want, mesh):
    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        make_fused_sweep_fn,
    )

    plan = get_plan(vbn, query)
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    b = next(iter(query.evidence.values())).shape[0]
    raw = make_fused_sweep_fn(
        plan, cpds, s, want=want, mesh=mesh, batch=b
    )
    return raw, plan, params


def test_sharded_fused_sweep_matches_exact(fitted):
    """The fused kernel under an 8-device ('data','particle') CPU mesh
    (interpret mode): per-shard draws, pmax/psum-combined pmf reduction;
    posterior must match exact enumeration statistically and the
    unsharded kernel's posterior within MC error."""
    from vectorizedbayesiannetwork_tpu.parallel.mesh import make_mesh

    bn, vbn, plan, cpds, params = fitted
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_data=2, devices=jax.devices()[:8])
    s = 1 << 14
    bq = 4
    query = Query(
        target="dysp",
        evidence={
            "smoke": np.ones((bq, 1), np.float32),
            "asia": np.zeros((bq, 1), np.float32),
        },
        do={},
    )
    raw_sh, plan_q, params_q = _fused_fn_for(
        vbn, query, s, ("pmf_logw",), mesh
    )
    raw_un, _, _ = _fused_fn_for(vbn, query, s, ("pmf_logw",), None)
    assert raw_sh is not None and raw_un is not None
    from vectorizedbayesiannetwork_tpu.core.plan import pack_fixed_values

    fixed = pack_fixed_values(query, plan_q, bq, clamp_obs=True)
    _, _, _, red_sh = jax.jit(raw_sh)(
        params_q, jax.random.PRNGKey(0), fixed
    )
    _, _, _, red_un = jax.jit(raw_un)(
        params_q, jax.random.PRNGKey(0), fixed
    )
    pmf_sh = np.asarray(red_sh[0])[:, :2]
    pmf_sh = pmf_sh / pmf_sh.sum(axis=1, keepdims=True)
    pmf_un = np.asarray(red_un[0])[:, :2]
    pmf_un = pmf_un / pmf_un.sum(axis=1, keepdims=True)
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    assert abs(pmf_sh[0, 1] - float(exact[1])) < 0.05
    assert abs(pmf_sh[0, 1] - pmf_un[0, 1]) < 0.04
    # every batch row answers the same query: rows agree to MC error
    assert np.ptp(pmf_sh[:, 1]) < 0.05


def test_sharded_fused_streams_finite(fitted):
    """Stream outputs ([B, S] logw/tgt) under the mesh: correct global
    shapes, finite, and weighted posterior still matches enumeration."""
    from vectorizedbayesiannetwork_tpu.parallel.mesh import make_mesh

    bn, vbn, plan, cpds, params = fitted
    mesh = make_mesh(n_data=2, devices=jax.devices()[:8])
    s = 1 << 14
    bq = 2
    query = Query(
        target="dysp",
        evidence={"smoke": np.ones((bq, 1), np.float32)},
        do={},
    )
    raw, plan_q, params_q = _fused_fn_for(vbn, query, s, ("logw",), mesh)
    assert raw is not None
    from vectorizedbayesiannetwork_tpu.core.plan import pack_fixed_values

    fixed = pack_fixed_values(query, plan_q, bq, clamp_obs=True)
    logw, tgt, _, _ = jax.jit(raw)(params_q, jax.random.PRNGKey(3), fixed)
    assert logw.shape == (bq, s) and tgt.shape == (bq, s)
    logw_np, tgt_np = np.asarray(logw), np.asarray(tgt)
    assert np.isfinite(logw_np).all()
    w = np.exp(logw_np[0] - logw_np[0].max())
    p1 = float(w[tgt_np[0] > 0.5].sum() / w.sum())
    exact = exact_posterior(bn, "dysp", {"smoke": 1})
    assert abs(p1 - float(exact[1])) < 0.05


def test_gate_reason_and_log(fitted, capsys):
    """Near-miss configs produce a one-line path/reason diagnostic
    (round-3 VERDICT next #9)."""
    import os

    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        categorical_sweep_reason,
        make_fused_sweep_fn,
    )

    bn, vbn, plan, cpds, params = fitted
    assert categorical_sweep_reason(plan, cpds, 2048) is None
    r = categorical_sweep_reason(plan, cpds, 1000)
    assert r is not None and "1024" in r
    os.environ["VBN_SWEEP_LOG"] = "1"
    try:
        assert make_fused_sweep_fn(plan, cpds, 1000) is None
        out = capsys.readouterr().out
        assert "[fused-sweep]" in out and "path=xla" in out
        assert "1024" in out
        assert make_fused_sweep_fn(plan, cpds, 2048) is not None
        out = capsys.readouterr().out
        assert "path=pallas-categorical" in out
    finally:
        del os.environ["VBN_SWEEP_LOG"]


# ---------------------------------------------------------------------------
# Static fused pmf/moments serving through the public API
# ---------------------------------------------------------------------------

def test_static_fused_pmf_serving(fitted, monkeypatch):
    """vbn.infer_posterior_pmf on a NON-dynamic LW method rides the
    in-kernel reduction (interpret mode via VBN_FUSED_SWEEP=always)."""
    bn, vbn, plan, cpds, params = fitted
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    vbn.set_inference_method("likelihood_weighting", n_samples=1 << 14)
    q = {
        "target": "dysp",
        "evidence": {
            "smoke": np.ones((4, 1), np.float32),
            "asia": np.zeros((4, 1), np.float32),
        },
    }
    out = vbn.infer_posterior_pmf([q], n_classes=2)
    assert out is not None
    pmf, spans = out
    assert pmf.shape == (4, 2)
    assert len(spans) == 1 and spans[0][:2] == (0, 4)
    pmf = pmf / pmf.sum(axis=1, keepdims=True)
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    assert abs(pmf[0, 1] - float(exact[1])) < 0.05


def test_static_fused_moments_serving(lg_fitted, monkeypatch):
    """vbn.infer_posterior_moments on a NON-dynamic MCM method: the
    in-kernel (sum_w, sum_wx, sum_wx2) reduction must agree with the
    stream path's _posterior_stats within MC error."""
    vbn, plan, cpds, params = lg_fitted
    q = {
        "target": "x2",
        "evidence": {"x0": np.full((2, 1), 0.5, np.float32)},
    }
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=1 << 14)
    out = vbn.infer_posterior_moments([q])
    assert out is not None
    mom, spans = out
    assert mom.shape == (2, 2)
    monkeypatch.setenv("VBN_FUSED_SWEEP", "never")
    w, smp = vbn.infer_posterior(q)
    stats = vbn._posterior_stats(w, smp)
    assert abs(mom[0, 0] - float(np.asarray(stats["mean"])[0, 0])) < 0.05
    assert abs(mom[0, 1] - float(np.asarray(stats["std"])[0, 0])) < 0.05
