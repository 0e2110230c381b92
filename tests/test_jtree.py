"""Compiled junction-tree calibration (inference/_jtree.py).

Exactness pins: the jtree program must agree with joint-support
enumeration (asia, incl. do-queries) and with host variable elimination
on the FITTED CPTs (insurance, 27 nodes — outside enumeration range),
and the categorical_exact method must serve latent-parent mid-size
queries exactly instead of delegating to sampling (round-3 VERDICT
next #4).
"""

import networkx as nx
import numpy as np
import pytest

import jax

from benchmarking.data_gen import generate_dataset
from benchmarking.exact import exact_posterior
from benchmarking.midsize import insurance
from benchmarking.networks import asia
from benchmarking.bif import DiscreteBN
from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.core.base import Query
from vectorizedbayesiannetwork_tpu.core.plan import get_plan
from vectorizedbayesiannetwork_tpu.inference._dynamic_base import (
    pack_dynamic_inputs,
)
from vectorizedbayesiannetwork_tpu.inference._exact_enum import (
    _node_cards,
    make_exact_enum_fn,
)
from vectorizedbayesiannetwork_tpu.inference._jtree import (
    build_jtree,
    make_jtree_fn,
)


def _fit_vbn(bn, n_rows=2048, seed=0):
    data = generate_dataset(bn, n_rows, seed=seed)
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


def _fitted_bn(vbn, bn):
    """DiscreteBN carrying the VBN's FITTED CPTs (for exact host VE)."""
    out = DiscreteBN(name=bn.name + "_fitted")
    out.nodes = list(bn.nodes)
    out.states = {n: list(bn.states[n]) for n in bn.nodes}
    out.parents = {n: list(bn.parents[n]) for n in bn.nodes}
    from vectorizedbayesiannetwork_tpu.inference._exact_enum import (
        _mixed_radix_digits,
    )

    for node in bn.nodes:
        cpd = vbn.cpd_spec(node)
        params = vbn.params[node]
        parents = bn.parents[node]
        if parents:
            combos = _mixed_radix_digits(
                int(np.prod([bn.card(p) for p in parents])),
                [bn.card(p) for p in parents],
            ).astype(np.float32)
            probs = np.asarray(cpd.categorical_probs(params, combos))
        else:
            probs = np.asarray(cpd.categorical_probs(params, None))
        k = bn.card(node)
        shape = tuple(bn.card(p) for p in parents) + (k,)
        out.cpts[node] = probs[..., :k].reshape(shape).astype(np.float64)
    return out


def _plan_and_parts(vbn):
    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[0], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    return plan, cpds, params


@pytest.fixture(scope="module")
def asia_fit():
    bn = asia()
    return bn, _fit_vbn(bn)


@pytest.fixture(scope="module")
def insurance_fit():
    bn = insurance()
    return bn, _fit_vbn(bn, n_rows=4096)


def test_structure_covers_families(insurance_fit):
    bn, vbn = insurance_fit
    plan, cpds, _ = _plan_and_parts(vbn)
    cards = _node_cards(plan, cpds)
    tree = build_jtree(plan, cards, 1 << 16)
    assert tree is not None
    # every CPT family fits inside its home clique
    for i in range(plan.n_nodes):
        fam = {i} | set(plan.parent_idx[i])
        assert fam <= set(tree.cliques[tree.factor_home[i]])
    # running intersection: every tree edge's separator is non-trivial
    for c, p in enumerate(tree.parent):
        if p >= 0:
            assert set(tree.cliques[c]) & set(tree.cliques[p])


@pytest.mark.parametrize(
    "evidence,do",
    [
        ({"smoke": 1, "asia": 0}, {}),
        ({"xray": 1}, {}),
        ({}, {"bronc": 1}),
        ({"smoke": 0}, {"lung": 1}),
    ],
)
def test_matches_enumeration_on_asia(asia_fit, evidence, do):
    bn, vbn = asia_fit
    plan, cpds, params = _plan_and_parts(vbn)
    cards = _node_cards(plan, cpds)
    tree = build_jtree(plan, cards, 1 << 16)
    k = max(cards)
    q = Query(
        target="dysp",
        evidence={k2: np.full((1, 1), float(v), np.float32)
                  for k2, v in evidence.items()},
        do={k2: np.full((1, 1), float(v), np.float32)
            for k2, v in do.items()},
    )
    inputs, spans, b_tot, _ = pack_dynamic_inputs(plan, [q], clamp_obs=True)
    jt = jax.jit(make_jtree_fn(plan, cpds, k, tree))
    en = jax.jit(make_exact_enum_fn(plan, cpds, k))
    pmf_jt = np.asarray(jt(params, inputs)[0])[:b_tot]
    pmf_en = np.asarray(en(params, inputs)[0])[:b_tot]
    pmf_jt = pmf_jt / pmf_jt.sum(axis=1, keepdims=True)
    pmf_en = pmf_en / pmf_en.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(pmf_jt, pmf_en, atol=2e-5)


def test_matches_host_ve_on_insurance(insurance_fit):
    """27 nodes: enumeration impossible; jtree must equal exact VE on the
    fitted CPTs."""
    bn, vbn = insurance_fit
    plan, cpds, params = _plan_and_parts(vbn)
    cards = _node_cards(plan, cpds)
    tree = build_jtree(plan, cards, 1 << 16)
    assert tree is not None
    fitted = _fitted_bn(vbn, bn)
    k = max(cards)
    jt = jax.jit(make_jtree_fn(plan, cpds, k, tree))
    rng = np.random.default_rng(0)
    for trial in range(4):
        target = str(rng.choice([n for n in bn.nodes]))
        ev_nodes = [n for n in bn.nodes if n != target]
        picks = rng.choice(len(ev_nodes), size=3, replace=False)
        evidence = {
            ev_nodes[i]: int(rng.integers(0, bn.card(ev_nodes[i])))
            for i in picks
        }
        q = Query(
            target=target,
            evidence={
                n: np.full((1, 1), float(v), np.float32)
                for n, v in evidence.items()
            },
            do={},
        )
        inputs, spans, b_tot, _ = pack_dynamic_inputs(
            plan, [q], clamp_obs=True
        )
        pmf = np.asarray(jt(params, inputs)[0])[:b_tot]
        pmf = (pmf / pmf.sum(axis=1, keepdims=True))[0, : bn.card(target)]
        ve = exact_posterior(fitted, target, evidence)
        np.testing.assert_allclose(
            pmf, ve, atol=5e-5,
            err_msg=f"trial {trial}: {target} | {evidence}",
        )


def test_categorical_exact_serves_insurance_without_sampling(insurance_fit):
    """The categorical_exact method answers latent-parent mid-size
    queries EXACTLY (no LW delegation): single-query API and the fused
    pmf dispatch both ride the jtree program."""
    bn, vbn = insurance_fit
    fitted = _fitted_bn(vbn, bn)
    vbn.set_inference_method("categorical_exact")
    target = "PropCost"
    evidence = {"Age": 1, "Accident": 2}
    probs, samples = vbn.infer_posterior(
        {
            "target": target,
            "evidence": {
                n: np.full((1, 1), float(v), np.float32)
                for n, v in evidence.items()
            },
        }
    )
    assert not vbn._inference._last_fallback
    ve = exact_posterior(fitted, target, evidence)
    np.testing.assert_allclose(
        np.asarray(probs)[0], ve, atol=5e-5
    )
    sup = np.asarray(samples)[0, :, 0]
    np.testing.assert_allclose(sup, np.arange(bn.card(target)), atol=1e-6)

    # fused pmf dispatch (the benchmark serving path)
    k_max = max(bn.card(n) for n in bn.nodes)
    out = vbn.infer_posterior_pmf(
        [
            {
                "target": target,
                "evidence": {
                    n: np.full((1, 1), float(v), np.float32)
                    for n, v in evidence.items()
                },
            }
        ],
        n_classes=k_max,
    )
    assert out is not None and not vbn._inference._last_fallback
    pmf, spans = out
    row = pmf[0, : bn.card(target)]
    row = row / row.sum()
    np.testing.assert_allclose(row, ve, atol=5e-5)
