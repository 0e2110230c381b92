"""CLG benchmark class: exact mixture posterior vs Monte-Carlo truth."""

import numpy as np
import pytest

from benchmarking.clg_bn import CLGaussianBN, random_clgaussian


@pytest.fixture(scope="module")
def bn():
    return random_clgaussian(7, seed=5)


def test_roundtrip_json(bn):
    again = CLGaussianBN.from_json(bn.to_json())
    assert again.nodes == bn.nodes and again.types == bn.types


def test_posterior_vs_monte_carlo(bn):
    data = bn.sample(400_000, seed=9)
    # discrete target given discrete evidence (rejection)
    disc = [v for v in bn.nodes if bn.types[v] == "discrete"]
    cont = [v for v in bn.nodes if bn.types[v] == "continuous"]
    t, e = disc[-1], disc[0]
    if t == e:
        pytest.skip("net too small")
    sel = data[e].astype(int) == 1
    mc = np.bincount(
        data[t][sel].astype(int), minlength=bn.cards[t]
    ) / max(1, sel.sum())
    exact = np.asarray(bn.posterior(t, {e: 1})["probs"])
    np.testing.assert_allclose(exact, mc, atol=0.01)

    # continuous target given discrete evidence
    ct = cont[-1]
    rec = bn.posterior(ct, {e: 1})
    np.testing.assert_allclose(rec["mean"], data[ct][sel].mean(), atol=0.02)
    np.testing.assert_allclose(rec["std"], data[ct][sel].std(), rtol=0.03)

    # continuous target given continuous evidence (importance check via
    # narrow window rejection)
    ce = cont[0]
    if ce == ct:
        pytest.skip("net too small")
    v0 = float(np.median(data[ce]))
    win = (data[ce] > v0 - 0.05) & (data[ce] < v0 + 0.05)
    rec = bn.posterior(ct, {ce: v0})
    np.testing.assert_allclose(rec["mean"], data[ct][win].mean(), atol=0.05)

    # do() on a discrete node: compare against sampling the mutilated net
    # (rejection would be wrong for interventions)
    d0 = disc[0]
    rec = bn.posterior(ct, do={d0: 1})
    forced = CLGaussianBN.from_json(bn.to_json())
    shape = np.asarray(forced.cpts[d0]).shape
    point = np.zeros(shape[-1])
    point[1] = 1.0
    forced.cpts[d0] = np.broadcast_to(point, shape).tolist()
    data3 = forced.sample(200_000, seed=12)
    np.testing.assert_allclose(rec["mean"], data3[ct].mean(), atol=0.03)
