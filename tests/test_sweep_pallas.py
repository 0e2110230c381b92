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
    logw, tgt, lpt = categorical_sweep_fused(
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
    logw, tgt, _ = categorical_sweep_fused(
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
    logw, tgt, lpt = lg_sweep_fused(
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
    logw, tgt, _ = lg_sweep_fused(
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
