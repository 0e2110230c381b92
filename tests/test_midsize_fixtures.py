"""Mid-size canonical fixtures: structure pins + VE ground-truth sanity.

The insurance/alarm fixtures (benchmarking/midsize.py) must keep the
canonical published structures — 27 nodes / 52 edges and 37 nodes / 46
edges — and stay within exact-VE range so the accuracy suite has a
mid-size regime between the 8-node textbook nets and the 128-node
timing-only runs (round-2 VERDICT next #9).
"""

import numpy as np
import pytest

from benchmarking.exact import exact_posterior
from benchmarking.midsize import alarm, insurance
from benchmarking.networks import acquire


@pytest.mark.parametrize(
    "mk,n_nodes,n_edges,max_card",
    [(insurance, 27, 52, 5), (alarm, 37, 46, 4)],
)
def test_canonical_structure(mk, n_nodes, n_edges, max_card):
    bn = mk()
    assert len(bn.nodes) == n_nodes
    assert len(bn.edges()) == n_edges
    assert max(bn.card(n) for n in bn.nodes) == max_card
    bn.validate()
    # deterministic parameterization
    bn2 = mk()
    for node in bn.nodes:
        np.testing.assert_array_equal(bn.cpts[node], bn2.cpts[node])


def test_builtin_acquire_includes_midsize():
    nets = acquire("builtin", names=["insurance", "alarm"])
    assert [b.name for b in nets] == ["insurance", "alarm"]


@pytest.mark.parametrize("mk", [insurance, alarm])
def test_ve_ground_truth_is_proper(mk):
    bn = mk()
    tgt = bn.nodes[0]
    ev = {bn.nodes[-1]: 0}
    p = exact_posterior(bn, tgt, ev)
    assert p.shape == (bn.card(tgt),)
    assert abs(float(np.sum(p)) - 1.0) < 1e-6
    assert (p >= 0).all()
