"""Scan-form mask-dynamic fused sweep (ops/sweep_scan_pallas.py).

The kernel drives the topo sweep from metadata arrays (O(1) compile in
node count) with runtime evidence/do masks. In interpret mode the tests
inject an external uniform field; the contract is BIT-equality of draws
with the unrolled fused kernel (same inverse-CDF walk, same uniforms)
and with the independent numpy sweep, per heterogeneous query row.
"""

import networkx as nx
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from benchmarking.data_gen import generate_dataset
from benchmarking.networks import asia, random_bn
from test_sweep_pallas import _numpy_reference
from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.core.base import Query
from vectorizedbayesiannetwork_tpu.core.plan import get_plan
from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
    _stacked_counts,
    categorical_sweep_fused,
    plan_tuple_for,
)
from vectorizedbayesiannetwork_tpu.ops.sweep_scan_pallas import (
    _flat_counts,
    categorical_sweep_scan,
    make_scan_sweep_fn,
    scan_batch_fits,
    scan_struct_for,
    scan_sweep_reason,
)

B, S = 4, 2048


def _fit_vbn(bn, seed=0, rows=4096):
    data = generate_dataset(bn, rows, seed=seed)
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    vbn = VBN(g, seed=seed)
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
    return vbn


@pytest.fixture(scope="module")
def fitted():
    bn = asia()
    vbn = _fit_vbn(bn)
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


def _mask_arrays(plan, b):
    ev = np.zeros((b, plan.n_nodes), np.float32)
    do = np.zeros((b, plan.n_nodes), np.float32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            ev[:, i] = 1.0
        if plan.do_mask[i]:
            do[:, i] = 1.0
    tgt = np.full((b,), plan.target_idx, np.int32)
    return ev, do, tgt


def _packed(fixed_idx, ev, do):
    return (
        fixed_idx.astype(np.int32)
        | np.where(ev > 0, 1 << 16, 0).astype(np.int32)
        | np.where(do > 0, 1 << 17, 0).astype(np.int32)
    )


def test_gate_reasons(fitted):
    bn, vbn, plan, cpds, params = fitted
    assert scan_sweep_reason(plan, cpds, 2048) is None
    assert "1024" in scan_sweep_reason(plan, cpds, 1000)
    assert scan_batch_fits(plan, 64)
    assert not scan_batch_fits(plan, 10**7)


def test_scan_matches_unrolled_bitwise(fitted):
    """Same uniforms => same draws, weights, and target densities as the
    unrolled fused kernel (the walk is the same arithmetic sequence)."""
    bn, vbn, plan, cpds, params = fitted
    plan_struct, total_rows, cmax = plan_tuple_for(plan, cpds)
    counts = _stacked_counts(cpds, params, total_rows, cmax)
    struct = scan_struct_for(plan, cpds)
    flat = _flat_counts(cpds, params)
    rng = np.random.default_rng(3)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, plan.n_nodes, S)).astype(
        np.float32
    )
    fixed_idx = np.zeros((B, plan.n_nodes), np.int32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            fixed_idx[:, i] = 1 if plan.topo_order[i] == "smoke" else 0
    ev, do, tgt = _mask_arrays(plan, B)

    logw_u, tgt_u, lpt_u, _ = categorical_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed_idx), counts, plan_struct,
        S, interpret=True, u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    logw_s, tgt_s, lpt_s, _ = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    np.testing.assert_array_equal(np.asarray(tgt_s), np.asarray(tgt_u))
    np.testing.assert_allclose(
        np.asarray(logw_s), np.asarray(logw_u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lpt_s), np.asarray(lpt_u), atol=1e-6
    )


def test_scan_heterogeneous_rows_match_numpy():
    """Rows with DIFFERENT evidence patterns and targets in one dispatch:
    each row must match the independent numpy sweep run with that row's
    masks (the mask-dynamic contract)."""
    bn = random_bn(n_nodes=24, max_card=4, seed=7)
    vbn = _fit_vbn(bn, seed=1)
    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[0], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    struct = scan_struct_for(plan, cpds)
    flat = _flat_counts(cpds, params)
    n = plan.n_nodes
    b = 5
    rng = np.random.default_rng(9)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(b, n, S)).astype(np.float32)
    ev = np.zeros((b, n), np.float32)
    do = np.zeros((b, n), np.float32)
    fixed_idx = np.zeros((b, n), np.int32)
    tgt = np.zeros((b,), np.int32)
    cards = [c.resolved_classes for c in cpds]
    for r in range(b):
        picks = rng.choice(n, size=4, replace=False)
        tgt[r] = picks[0]
        ev[r, picks[1]] = 1.0
        ev[r, picks[2]] = 1.0
        do[r, picks[3]] = 1.0
        for i in (picks[1], picks[2], picks[3]):
            fixed_idx[r, i] = rng.integers(0, cards[i])

    logw, tgtv, lpt, _ = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    # per-row numpy reference with that row's masks baked into the struct
    (eoff, rows_a, cards_a, pids, strides, total_e, pmax, cmax) = struct
    # rebuild the unrolled-kernel-style struct per row
    row_offs = []
    at = 0
    for i in range(n):
        row_offs.append(at)
        at += rows_a[i]
    counts_np = np.zeros((at, max(cards_a)), np.float64)
    flat_np = np.asarray(flat, np.float64)
    for i in range(n):
        blk = flat_np[eoff[i] : eoff[i] + rows_a[i] * cards_a[i]]
        counts_np[
            row_offs[i] : row_offs[i] + rows_a[i], : cards_a[i]
        ] = blk.reshape(rows_a[i], cards_a[i])
    for r in range(b):
        ps = (
            n,
            tuple(tuple(p for p in pids[i][: len(plan.parent_idx[i])])
                  for i in range(n)),
            tuple(bool(ev[r, i]) for i in range(n)),
            tuple(bool(do[r, i]) for i in range(n)),
            int(tgt[r]),
            tuple(row_offs),
            tuple(rows_a),
            tuple(cards_a),
            tuple(strides),
        )
        ref_logw, ref_tgt, ref_lpt = _numpy_reference(
            ps, counts_np, fixed_idx[r : r + 1], u[r : r + 1].astype(np.float64)
        )
        np.testing.assert_array_equal(np.asarray(tgtv)[r], ref_tgt[0])
        np.testing.assert_allclose(
            np.asarray(logw)[r], ref_logw[0], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lpt)[r], ref_lpt[0], atol=1e-4
        )


def test_scan_pmf_reduction_matches_streams(fitted):
    bn, vbn, plan, cpds, params = fitted
    struct = scan_struct_for(plan, cpds)
    flat = _flat_counts(cpds, params)
    rng = np.random.default_rng(13)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, plan.n_nodes, S)).astype(
        np.float32
    )
    fixed_idx = np.zeros((B, plan.n_nodes), np.int32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            fixed_idx[:, i] = 1 if plan.topo_order[i] == "smoke" else 0
    ev, do, tgt = _mask_arrays(plan, B)
    logw, tgtv, _, _ = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt"),
    )
    _, _, _, red = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("pmf_logw",),
    )
    sums, m = red
    w = np.exp(np.asarray(logw) - np.asarray(m)[:, None])
    t = np.asarray(tgtv).astype(np.int32)
    c = int(cpds[plan.target_idx].resolved_classes)
    expect = np.zeros((B, c))
    for j in range(c):
        expect[:, j] = (w * (t == j)).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(sums)[:, :c], expect, rtol=1e-4, atol=1e-5
    )


def test_make_scan_sweep_fn_raw(fitted):
    """The program-level maker: packs masks, clips values, returns the
    want streams (interpret mode, real PRNG path via external u)."""
    bn, vbn, plan, cpds, params = fitted
    raw = make_scan_sweep_fn(plan, cpds, 2048, want=("logw", "tgt"))
    assert raw is not None
    ev, do, tgt = _mask_arrays(plan, B)
    fixed = np.zeros((B, plan.n_nodes), np.float32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            fixed[:, i] = 1.0 if plan.topo_order[i] == "smoke" else 0.0
    logw, tgtv, lpt, red = raw(
        params, jax.random.PRNGKey(0), jnp.asarray(fixed),
        jnp.asarray(ev), jnp.asarray(do), jnp.asarray(tgt),
    )
    assert logw.shape == (B, 2048) and tgtv.shape == (B, 2048)
    assert lpt is None and red is None
    assert np.isfinite(np.asarray(logw)).all()
    w = np.exp(np.asarray(logw)[0] - np.asarray(logw)[0].max())
    t = np.asarray(tgtv)[0]
    from benchmarking.exact import exact_posterior

    p1 = float(w[t > 0.5].sum() / w.sum())
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    assert abs(p1 - float(exact[1])) < 0.07


def test_scan_sharded_matches_exact(fitted):
    """shard_map composition on the ('data','particle') CPU mesh: the
    psum-combined pmf reduction matches exact enumeration."""
    from benchmarking.exact import exact_posterior
    from vectorizedbayesiannetwork_tpu.parallel.mesh import make_mesh

    bn, vbn, plan, cpds, params = fitted
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(n_data=2, n_particle=4)
    raw = make_scan_sweep_fn(
        plan, cpds, 1 << 14, want=("pmf_logw",), mesh=mesh
    )
    assert raw is not None
    b = 2
    ev, do, tgt = _mask_arrays(plan, b)
    fixed = np.zeros((b, plan.n_nodes), np.float32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            fixed[:, i] = 1.0 if plan.topo_order[i] == "smoke" else 0.0
    _, _, _, red = raw(
        params, jax.random.PRNGKey(2), jnp.asarray(fixed),
        jnp.asarray(ev), jnp.asarray(do), jnp.asarray(tgt),
    )
    sums, _m = red
    c = int(cpds[plan.target_idx].resolved_classes)
    pmf = np.asarray(sums)[:, :c]
    pmf = pmf / pmf.sum(axis=1, keepdims=True)
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    np.testing.assert_allclose(pmf[0], np.asarray(exact), atol=0.06)


# ---------------------------------------------------------------------------
# Linear-Gaussian scan-form sweep
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lg_fitted():
    from conftest import make_chain_df, make_chain_graph
    from vectorizedbayesiannetwork_tpu import VBN, defaults

    vbn = VBN(make_chain_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    vbn.fit(make_chain_df())
    plan = get_plan(
        vbn,
        Query(
            target="x2",
            evidence={"x0": np.full((B, 1), 0.5, np.float32)},
            do={},
        ),
    )
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    return vbn, plan, cpds, params


def test_lg_scan_matches_unrolled_bitwise(lg_fitted):
    from vectorizedbayesiannetwork_tpu.ops.sweep_pallas import (
        lg_param_table,
        lg_plan_tuple_for,
        lg_sweep_fused,
    )
    from vectorizedbayesiannetwork_tpu.ops.sweep_scan_pallas import (
        lg_ptab_flat,
        lg_scan_struct_for,
        lg_sweep_scan,
    )

    vbn, plan, cpds, params = lg_fitted
    n = plan.n_nodes
    plan_struct, dmax = lg_plan_tuple_for(plan, cpds)
    ptab = lg_param_table(cpds, params, dmax, tuple(c.min_scale for c in cpds))
    struct = lg_scan_struct_for(plan, cpds)
    ptab_f = lg_ptab_flat(cpds, params, struct[2])
    rng = np.random.default_rng(5)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, 2 * n, S)).astype(np.float32)
    fixed = np.zeros((B, n), np.float32)
    ev = np.zeros((B, n), np.float32)
    do = np.zeros((B, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
            ev[:, i] = 1.0
    flags = (np.where(ev > 0, 1, 0) | np.where(do > 0, 2, 0)).astype(np.int32)
    tgt = np.full((B,), plan.target_idx, np.int32)

    logw_u, tgt_u, lpt_u, _ = lg_sweep_fused(
        jax.random.PRNGKey(0), jnp.asarray(fixed), ptab, plan_struct,
        dmax, S, interpret=True, u_ext=jnp.asarray(u),
        want=("logw", "tgt", "lpt"),
    )
    logw_s, tgt_s, lpt_s, _ = lg_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(fixed), jnp.asarray(flags),
        jnp.asarray(tgt), ptab_f, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    np.testing.assert_allclose(
        np.asarray(tgt_s), np.asarray(tgt_u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(logw_s), np.asarray(logw_u), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lpt_s), np.asarray(lpt_u), atol=1e-5
    )


def test_lg_scan_raw_posterior(lg_fitted):
    """make_scan_sweep_fn falls through to the LG kernel; the weighted
    posterior mean matches the closed-form chain value."""
    vbn, plan, cpds, params = lg_fitted
    raw = make_scan_sweep_fn(plan, cpds, 4096, want=("logw", "tgt"))
    assert raw is not None
    n = plan.n_nodes
    fixed = np.zeros((B, n), np.float32)
    ev = np.zeros((B, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
            ev[:, i] = 1.0
    do = np.zeros((B, n), np.float32)
    tgt = np.full((B,), plan.target_idx, np.int32)
    logw, tgtv, _, _ = raw(
        params, jax.random.PRNGKey(1), jnp.asarray(fixed), jnp.asarray(ev),
        jnp.asarray(do), jnp.asarray(tgt),
    )
    w = np.exp(np.asarray(logw)[0] - np.asarray(logw)[0].max())
    x = np.asarray(tgtv)[0]
    mean = (w * x).sum() / w.sum()
    # conftest testbed: x2 = 0.5*x0 - 0.2*x1; x0 = 0.5 observed, x1 latent
    expect = 0.5 * 0.5
    assert abs(mean - expect) < 0.08, (mean, expect)


def test_lg_scan_moments_reduction(lg_fitted):
    from vectorizedbayesiannetwork_tpu.ops.sweep_scan_pallas import (
        lg_ptab_flat,
        lg_scan_struct_for,
        lg_sweep_scan,
    )

    vbn, plan, cpds, params = lg_fitted
    n = plan.n_nodes
    struct = lg_scan_struct_for(plan, cpds)
    ptab_f = lg_ptab_flat(cpds, params, struct[2])
    rng = np.random.default_rng(7)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(B, 2 * n, S)).astype(np.float32)
    fixed = np.zeros((B, n), np.float32)
    ev = np.zeros((B, n), np.float32)
    for i in range(n):
        if plan.evidence_mask[i]:
            fixed[:, i] = 0.5
            ev[:, i] = 1.0
    flags = np.where(ev > 0, 1, 0).astype(np.int32)
    tgt = np.full((B,), plan.target_idx, np.int32)
    logw, tgtv, _, _ = lg_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(fixed), jnp.asarray(flags),
        jnp.asarray(tgt), ptab_f, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt"),
    )
    _, _, _, red = lg_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(fixed), jnp.asarray(flags),
        jnp.asarray(tgt), ptab_f, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("mom_logw",),
    )
    sums, m = red
    w = np.exp(np.asarray(logw) - np.asarray(m)[:, None])
    x = np.asarray(tgtv)
    expect = np.stack(
        [w.sum(1), (w * x).sum(1), (w * x * x).sum(1)], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(sums)[:, :3], expect, rtol=1e-4, atol=1e-4
    )


def test_scan_chunked_batches(fitted, monkeypatch):
    """Oversized batches self-chunk into SMEM-sized dispatches (the
    link/munin serving-bucket case): posteriors stay exact per row."""
    import vectorizedbayesiannetwork_tpu.ops.sweep_scan_pallas as ssp
    from benchmarking.exact import exact_posterior

    bn, vbn, plan, cpds, params = fitted
    # shrink the budget to the smallest value the table gate still
    # accepts, so a 40-row batch needs multiple chunks
    monkeypatch.setattr(
        ssp, "_SMEM_BUDGET", 2 * ssp._table_bytes(plan, cpds)
    )
    assert ssp._chunk_cap(
        lambda b: ssp.scan_batch_fits(plan, b, cpds), 40
    ) < 40
    raw = make_scan_sweep_fn(plan, cpds, 1 << 13, want=("pmf_logw",))
    assert raw is not None
    b = 40
    ev, do, tgt = _mask_arrays(plan, b)
    fixed = np.zeros((b, plan.n_nodes), np.float32)
    for i in range(plan.n_nodes):
        if plan.evidence_mask[i]:
            fixed[:, i] = 1.0 if plan.topo_order[i] == "smoke" else 0.0
    _, _, _, red = raw(
        params, jax.random.PRNGKey(4), jnp.asarray(fixed),
        jnp.asarray(ev), jnp.asarray(do), jnp.asarray(tgt),
    )
    sums, m = red
    assert sums.shape[0] == b and m.shape[0] == b
    pmf = np.asarray(sums)[:, :2]
    pmf = pmf / pmf.sum(axis=1, keepdims=True)
    gt = np.asarray(exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0}))
    # chunks draw from DIFFERENT folded keys: rows across chunk
    # boundaries must all be near-exact yet not bit-identical clones
    np.testing.assert_allclose(pmf, np.tile(gt, (b, 1)), atol=0.05)
    assert not np.allclose(pmf[0], pmf[-1], atol=1e-12)


def test_scan_large_cardinality_fori_path():
    """cmax > 8 disables the static class unroll — the dynamic fori
    walk must produce the same draws as the numpy reference."""
    bn = random_bn(n_nodes=10, max_card=12, seed=13)
    assert max(len(s) for s in bn.states.values()) > 8
    vbn = _fit_vbn(bn, seed=2)
    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[-1], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    struct = scan_struct_for(plan, cpds)
    assert struct[7] > 8  # cmax: the fori path is actually exercised
    flat = _flat_counts(cpds, params)
    n = plan.n_nodes
    rng = np.random.default_rng(17)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(2, n, S)).astype(np.float32)
    ev = np.zeros((2, n), np.float32)
    do = np.zeros((2, n), np.float32)
    fixed_idx = np.zeros((2, n), np.int32)
    cards = [c.resolved_classes for c in cpds]
    ev[:, 0] = 1.0
    fixed_idx[:, 0] = cards[0] - 1
    tgt = np.full((2,), plan.target_idx, np.int32)
    logw, tgtv, lpt, _ = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    (eoff, rows_a, cards_a, pids, strides, total_e, pmax, cmax) = struct
    row_offs = []
    at = 0
    for i in range(n):
        row_offs.append(at)
        at += rows_a[i]
    counts_np = np.zeros((at, max(cards_a)), np.float64)
    flat_np = np.asarray(flat, np.float64)
    for i in range(n):
        blk = flat_np[eoff[i] : eoff[i] + rows_a[i] * cards_a[i]]
        counts_np[
            row_offs[i] : row_offs[i] + rows_a[i], : cards_a[i]
        ] = blk.reshape(rows_a[i], cards_a[i])
    ps = (
        n,
        tuple(tuple(p for p in pids[i][: len(plan.parent_idx[i])])
              for i in range(n)),
        tuple(bool(ev[0, i]) for i in range(n)),
        tuple(bool(do[0, i]) for i in range(n)),
        int(tgt[0]),
        tuple(row_offs),
        tuple(rows_a),
        tuple(cards_a),
        tuple(strides),
    )
    ref_logw, ref_tgt, ref_lpt = _numpy_reference(
        ps, counts_np, fixed_idx[:1], u[:1].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(tgtv)[0], ref_tgt[0])
    np.testing.assert_allclose(np.asarray(logw)[0], ref_logw[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(lpt)[0], ref_lpt[0], atol=1e-4)


def test_scan_high_cardinality_gate_and_draws():
    """Cards ABOVE 64 (the reference's barley/pathfinder class: card 67,
    63) ride the fused scan path — the class walk is a fori_loop, so the
    budget is the 128 reduction lanes, not 64 (round-4 VERDICT next #3).
    Draws at card 80 must match the numpy reference; card > 128 and
    SMEM-oversized tables (the mildew regime) must gate OFF with precise
    reasons."""
    bn = random_bn(n_nodes=6, max_card=80, max_indegree=1, seed=0)
    assert max(len(s) for s in bn.states.values()) > 64
    vbn = _fit_vbn(bn, seed=3)
    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[-1], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    assert scan_sweep_reason(plan, cpds, 2048) is None
    struct = scan_struct_for(plan, cpds)
    assert struct[7] > 64  # cmax: high-card walk actually exercised
    flat = _flat_counts(cpds, params)
    n = plan.n_nodes
    rng = np.random.default_rng(29)
    u = rng.uniform(1e-6, 1 - 1e-6, size=(2, n, S)).astype(np.float32)
    ev = np.zeros((2, n), np.float32)
    do = np.zeros((2, n), np.float32)
    fixed_idx = np.zeros((2, n), np.int32)
    cards = [c.resolved_classes for c in cpds]
    ev[:, 0] = 1.0
    fixed_idx[:, 0] = cards[0] - 1
    tgt = np.full((2,), plan.target_idx, np.int32)
    logw, tgtv, lpt, _ = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("logw", "tgt", "lpt"),
    )
    (eoff, rows_a, cards_a, pids, strides, total_e, pmax, cmax) = struct
    row_offs = []
    at = 0
    for i in range(n):
        row_offs.append(at)
        at += rows_a[i]
    counts_np = np.zeros((at, max(cards_a)), np.float64)
    flat_np = np.asarray(flat, np.float64)
    for i in range(n):
        blk = flat_np[eoff[i] : eoff[i] + rows_a[i] * cards_a[i]]
        counts_np[
            row_offs[i] : row_offs[i] + rows_a[i], : cards_a[i]
        ] = blk.reshape(rows_a[i], cards_a[i])
    ps = (
        n,
        tuple(tuple(p for p in pids[i][: len(plan.parent_idx[i])])
              for i in range(n)),
        tuple(bool(ev[0, i]) for i in range(n)),
        tuple(bool(do[0, i]) for i in range(n)),
        int(tgt[0]),
        tuple(row_offs),
        tuple(rows_a),
        tuple(cards_a),
        tuple(strides),
    )
    ref_logw, ref_tgt, ref_lpt = _numpy_reference(
        ps, counts_np, fixed_idx[:1], u[:1].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(tgtv)[0], ref_tgt[0])
    np.testing.assert_allclose(np.asarray(logw)[0], ref_logw[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(lpt)[0], ref_lpt[0], atol=1e-4)

    # In-kernel pmf histogram at card > 64: lanes 0..card-1 of the
    # reduction row must equal the host-side weighted bincount.
    _, _, _, red = categorical_sweep_scan(
        jax.random.PRNGKey(0), jnp.asarray(_packed(fixed_idx, ev, do)),
        jnp.asarray(tgt), flat, struct, S, interpret=True,
        u_ext=jnp.asarray(u), want=("pmf_logw",),
    )
    sums, mshift = red
    k_t = cards_a[int(tgt[0])]
    w = np.exp(ref_logw[0] - np.asarray(mshift)[0])
    expect = np.bincount(ref_tgt[0].astype(int), weights=w, minlength=k_t)
    np.testing.assert_allclose(
        np.asarray(sums)[0, :k_t], expect, rtol=1e-4, atol=1e-5
    )

    # card > 128 gates off with the class-budget reason
    bn2 = random_bn(n_nodes=4, max_card=160, max_indegree=1, seed=1)
    if max(len(s) for s in bn2.states.values()) > 128:
        vbn2 = _fit_vbn(bn2, seed=4, rows=512)
        topo2 = tuple(vbn2.dag.topological_order())
        plan2 = get_plan(vbn2, Query(target=topo2[-1], evidence={}, do={}))
        cpds2 = tuple(vbn2.cpd_spec(n) for n in plan2.topo_order)
        reason = scan_sweep_reason(plan2, cpds2, 2048)
        assert reason is not None and "classes > 128" in reason

    # SMEM-oversized table (mildew: 540k entries) gates off with the
    # budget reason even when every card fits the walk
    from benchmarking.highcard import mildew

    bnm = mildew()
    vbnm = _fit_vbn(bnm, seed=5, rows=512)
    topom = tuple(vbnm.dag.topological_order())
    planm = get_plan(vbnm, Query(target=topom[-1], evidence={}, do={}))
    cpdsm = tuple(vbnm.cpd_spec(n) for n in planm.topo_order)
    reason = scan_sweep_reason(planm, cpdsm, 2048)
    assert reason is not None and "SMEM" in reason
