"""Large discrete fixtures (benchmarking/large_discrete.py).

Scale pins for the 56-76-node accuracy regime (round-3 VERDICT next #5):
node/arc counts match bnlearn's metadata, parameterizations are
deterministic, exact VE ground truth works, and the compiled junction
tree stays within budget so vbn_ct_ce serves these nets exactly.
"""

import numpy as np
import pytest

from benchmarking.exact import exact_posterior
from benchmarking.large_discrete import hailfinder, hepar2, win95pts
from benchmarking.networks import acquire


@pytest.mark.parametrize(
    "mk,n_nodes,n_edges,max_card",
    [(hailfinder, 56, 66, 11), (hepar2, 70, 123, 4), (win95pts, 76, 112, 2)],
)
def test_scale_pins(mk, n_nodes, n_edges, max_card):
    bn = mk()
    assert len(bn.nodes) == n_nodes
    assert len(bn.edges()) == n_edges
    assert max(bn.card(n) for n in bn.nodes) == max_card
    bn.validate()
    bn2 = mk()
    for node in bn.nodes:
        np.testing.assert_array_equal(bn.cpts[node], bn2.cpts[node])


def test_hailfinder_canonical_anchors():
    """Spot-check canonical hailfinder topology facts."""
    bn = hailfinder()
    assert set(bn.parents["CombVerMo"]) == {
        "N07muVerMo", "SubjVertMo", "QGVertMotion"
    }
    assert bn.parents["Scenario"] == ["Date"]
    assert bn.card("Scenario") == 11 and bn.card("Date") == 6
    assert set(bn.parents["PlainsFcst"]) == {
        "CapInScen", "InsSclInScen", "CurPropConv", "ScnRelPlFcst"
    }
    assert set(bn.parents["R5Fcst"]) == {"MountainFcst", "N34StarFcst"}
    # 12 Scenario-conditioned observables + 4 ScenRel* mediators
    scen_children = [n for n in bn.nodes if bn.parents[n] == ["Scenario"]]
    assert len(scen_children) == 16


def test_builtin_acquire_includes_large():
    nets = acquire("builtin", names=["hailfinder", "hepar2", "win95pts"])
    assert [b.name for b in nets] == ["hailfinder", "hepar2", "win95pts"]


@pytest.mark.parametrize("mk", [hailfinder, hepar2, win95pts])
def test_ve_ground_truth_is_proper(mk):
    bn = mk()
    rng = np.random.default_rng(0)
    tgt = str(rng.choice(bn.nodes))
    evn = [n for n in bn.nodes if n != tgt]
    picks = rng.choice(len(evn), size=3, replace=False)
    ev = {evn[i]: int(rng.integers(0, bn.card(evn[i]))) for i in picks}
    p = exact_posterior(bn, tgt, ev)
    assert p.shape == (bn.card(tgt),)
    assert abs(float(np.sum(p)) - 1.0) < 1e-6
    assert (p >= 0).all()


@pytest.mark.parametrize("mk", [hailfinder, hepar2, win95pts])
def test_jtree_within_budget(mk):
    """The compiled junction tree must cover these nets so vbn_ct_ce
    serves them EXACTLY (no sampling delegation)."""
    import networkx as nx

    from vectorizedbayesiannetwork_tpu import VBN, defaults
    from vectorizedbayesiannetwork_tpu.core.base import Query
    from vectorizedbayesiannetwork_tpu.core.plan import get_plan
    from vectorizedbayesiannetwork_tpu.inference._exact_enum import (
        _node_cards,
    )
    from vectorizedbayesiannetwork_tpu.inference._jtree import build_jtree

    bn = mk()
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
    data = {
        k: np.zeros((8, 1), np.float32) for k in bn.nodes
    }  # structure only: cards are declared, values irrelevant here
    vbn.fit(data)
    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[0], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    cards = _node_cards(plan, cpds)
    tree = build_jtree(plan, cards, 1 << 16)
    assert tree is not None
    assert tree.max_states <= 1 << 16
