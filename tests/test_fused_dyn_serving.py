"""Fused mask-dynamic serving: the scan-form Pallas kernel behind the
public dynamic_masks=True paths (LW / MCM / IS), interpret mode.

``VBN_FUSED_SWEEP=always`` forces the kernel off-TPU; n_samples must be
a multiple of 1024 (the kernel gate), so these tests run at S=2048 and
pin posteriors against exact enumeration — the same contract the XLA
dynamic sweep satisfies.
"""

import numpy as np
import pytest

from benchmarking.exact import ancestral_sample, exact_posterior
from benchmarking.data_gen import domain_schema
from benchmarking.models.vbn_tpu import VBNTpuBenchmarkModel
from benchmarking.networks import asia, random_bn

S = 2048


def _fit_model(bn, method, seed=0, n_samples=S):
    data = {
        k: v.astype(np.float32).reshape(-1, 1)
        for k, v in ancestral_sample(bn, 20000, seed).items()
    }
    m = VBNTpuBenchmarkModel(
        domain_schema(bn),
        seed=seed,
        config={
            "inference": {
                "name": method,
                "n_samples": n_samples,
                "dynamic_masks": True,
            }
        },
    )
    m.fit(data)
    return m


def _pmf_from(pdf, samples, k, weighted=True):
    # MCM's pdf is the target's own density, not an importance weight —
    # its weighted histogram is biased toward high-density classes, for
    # us AND for the torch reference's identical epilogue
    # (/root/reference/benchmarking/models/vbn.py:202-242); exactness is
    # checked on the UNWEIGHTED histogram for MCM.
    s = np.rint(np.asarray(samples)[0, :, 0]).astype(int)
    w = np.asarray(pdf)[0] if weighted else None
    pmf = np.bincount(np.clip(s, 0, k - 1), weights=w, minlength=k)
    return pmf / pmf.sum()


@pytest.mark.parametrize(
    "method",
    ["likelihood_weighting", "monte_carlo_marginalization",
     "importance_sampling"],
)
def test_fused_dyn_matches_exact(monkeypatch, method):
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = asia()
    m = _fit_model(bn, method)
    pairs = [
        ("dysp", {"smoke": 1, "asia": 0}),
        ("bronc", {"dysp": 1}),
        ("lung", {}),
    ]
    weighted = method != "monte_carlo_marginalization"
    if not weighted:
        # MCM clamps evidence without weighting, so diagnosis-direction
        # queries (evidence downstream of the target) cannot condition
        # ancestors — identical behavior on the XLA dynamic path and in
        # the reference (monte_carlo_marginalization.py:60-92). Pin MCM
        # on prediction-direction queries only.
        pairs = [("dysp", {"smoke": 1, "asia": 0}), ("lung", {})]
    for target, ev in pairs:
        pdf, samples = m.vbn.infer_posterior(
            {
                "target": target,
                "evidence": {k: [[float(v)]] for k, v in ev.items()},
            }
        )
        k = len(bn.states[target])
        pmf = _pmf_from(pdf, samples, k, weighted=weighted)
        gt = exact_posterior(bn, target, ev)
        np.testing.assert_allclose(pmf, gt, atol=0.06)


def test_fused_dyn_one_program_heterogeneous(monkeypatch):
    """Row-fused dispatch with heterogeneous targets/evidence rides ONE
    compiled fused program; every query matches exact enumeration."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = random_bn(20, max_indegree=3, max_card=3, seed=5)
    m = _fit_model(bn, "likelihood_weighting")
    method = m.vbn._inference
    method._fn_cache.clear()
    queries = [
        {"target": bn.nodes[-1],
         "evidence": {bn.nodes[0]: [[0.0]]}},
        {"target": bn.nodes[0],
         "evidence": {bn.nodes[-1]: [[1.0]], bn.nodes[3]: [[0.0]]}},
        {"target": bn.nodes[4], "evidence": {}},
    ]
    res = m.vbn.infer_posterior_many(queries)
    assert len(method._fn_cache) == 1
    evs = [{bn.nodes[0]: 0},
           {bn.nodes[-1]: 1, bn.nodes[3]: 0},
           {}]
    for (pdf, samples), q, ev in zip(res, queries, evs):
        k = len(bn.states[q["target"]])
        pmf = _pmf_from(pdf, samples, k)
        gt = exact_posterior(bn, q["target"], ev)
        np.testing.assert_allclose(pmf, gt, atol=0.07)


def test_fused_dyn_do_and_padding(monkeypatch):
    """do-interventions and padded batch rows through the fused path."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = asia()
    m = _fit_model(bn, "monte_carlo_marginalization")
    pdf, samples = m.vbn.infer_posterior(
        {"target": "dysp", "do": {"smoke": [[1.0]]}, "evidence": {}}
    )
    pmf = _pmf_from(pdf, samples, 2, weighted=False)
    # smoke is a root: do(smoke=1) == conditioning on smoke=1
    gt = exact_posterior(bn, "dysp", {"smoke": 1})
    np.testing.assert_allclose(pmf, gt, atol=0.06)
    # do on the target itself: degenerate delta
    pdf, samples = m.vbn.infer_posterior(
        {"target": "dysp", "do": {"dysp": [[1.0]]}, "evidence": {}}
    )
    assert np.allclose(np.asarray(samples), 1.0)
    assert np.allclose(np.asarray(pdf), 1.0)


def test_fused_dyn_is_fallback_still_works(monkeypatch):
    """IS's per-row in-graph ESS fallback composes with the fused sweep:
    adversarial (off-manifold) evidence rows still return sane
    posteriors and flag the fallback."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = asia()
    m = _fit_model(bn, "importance_sampling")
    pdf, samples = m.vbn.infer_posterior(
        {
            "target": "dysp",
            "evidence": {
                "asia": [[1.0]], "tub": [[1.0]], "xray": [[1.0]],
                "smoke": [[1.0]], "lung": [[1.0]],
            },
        }
    )
    assert np.isfinite(np.asarray(pdf)).all()
    pmf = _pmf_from(pdf, samples, 2)
    gt = exact_posterior(
        bn, "dysp",
        {"asia": 1, "tub": 1, "xray": 1, "smoke": 1, "lung": 1},
    )
    np.testing.assert_allclose(pmf, gt, atol=0.08)


def test_fused_dyn_lg_posterior(monkeypatch):
    """The LG scan kernel behind dynamic_masks=True on a gaussian net."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(0)
    n = 8000
    x0 = g.normal(size=n)
    x1 = 2.0 * x0 + 0.5 + 0.3 * g.normal(size=n)
    x2 = -1.0 * x1 + 1.0 + 0.2 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x1"), ("x1", "x2")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in G.nodes},
    )
    v.fit(df)
    v.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    pdf, samples = v.infer_posterior(
        {"target": "x2", "evidence": {"x0": [[0.5]]}}
    )
    w = np.asarray(pdf)[0]
    x = np.asarray(samples)[0, :, 0]
    mean = (w * x).sum() / w.sum()
    expect = -1.0 * (2.0 * 0.5 + 0.5) + 1.0
    assert abs(mean - expect) < 0.06, (mean, expect)
    # diagnosis direction exercises the evidence weights
    pdf, samples = v.infer_posterior(
        {"target": "x0", "evidence": {"x2": [[-0.5]]}}
    )
    assert np.isfinite(np.asarray(pdf)).all()


def test_static_plan_scan_fallback_beyond_unrolled_budget(monkeypatch):
    """STATIC plans past the unrolled kernel's node budget ride the scan
    kernel with plan masks as runtime arrays (same outputs)."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    import vectorizedbayesiannetwork_tpu.ops.sweep_pallas as sp

    monkeypatch.setattr(sp, "_MAX_NODES", 4)  # force the unrolled gate off
    bn = asia()
    data = {
        k: v.astype(np.float32).reshape(-1, 1)
        for k, v in ancestral_sample(bn, 20000, 0).items()
    }
    m = VBNTpuBenchmarkModel(
        domain_schema(bn),
        seed=0,
        config={
            "inference": {"name": "likelihood_weighting", "n_samples": S}
        },
    )
    m.fit(data)
    pdf, samples = m.vbn.infer_posterior(
        {
            "target": "dysp",
            "evidence": {"smoke": [[1.0]], "asia": [[0.0]]},
        }
    )
    pmf = _pmf_from(pdf, samples, 2)
    gt = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    np.testing.assert_allclose(pmf, gt, atol=0.06)
    # the in-kernel pmf serving API also rides the scan fallback
    out = m.vbn.infer_posterior_pmf(
        [{"target": "dysp", "evidence": {"smoke": [[1.0]], "asia": [[0.0]]}}],
        n_classes=2,
    )
    assert out is not None
    pmf2, _ = out
    pmf2 = pmf2 / pmf2.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(pmf2[0], gt, atol=0.06)


def test_dyn_inkernel_pmf_reduction_matches_stream(monkeypatch):
    """LW dynamic pmf serving rides the IN-KERNEL reduction (only [B, k]
    summary rows reach HBM — no [B, S] streams); its normalized rows
    must match the stream+einsum path's and exact enumeration."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = asia()
    m = _fit_model(bn, "likelihood_weighting")
    lw = m.vbn._inference
    plan = lw._canonical_plan(m.vbn)
    cpds = lw._cpds(m.vbn, plan)
    # the reduction raw must be available for this all-categorical net
    assert lw._dyn_red_raw(plan, cpds, S, (True,), m.vbn, "pmf") is not None
    queries = [
        {"target": "dysp", "evidence": {"smoke": [[1.0]], "asia": [[0.0]]}},
        {"target": "bronc", "evidence": {"dysp": [[1.0]]}},
        {"target": "lung", "evidence": {}},
    ]
    rows, spans = m.vbn.infer_posterior_pmf(
        queries, n_classes=2, pad_bucket=8
    )
    # reduced rows come back normalized
    np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-5)
    for (lo, hi, _t), (target, ev) in zip(
        spans,
        [("dysp", {"smoke": 1, "asia": 0}), ("bronc", {"dysp": 1}),
         ("lung", {})],
    ):
        gt = exact_posterior(bn, target, ev)
        np.testing.assert_allclose(rows[lo], gt, atol=0.06)


def test_dyn_inkernel_moments_reduction(monkeypatch):
    """LW dynamic moments serving via the in-kernel (w, wx, wx^2) lanes:
    mean/std match the stream-path host reduction statistically."""
    monkeypatch.setenv("VBN_FUSED_SWEEP", "always")
    bn = asia()
    m = _fit_model(bn, "likelihood_weighting")
    q = [{"target": "dysp", "evidence": {"smoke": [[1.0]]}}]
    mom, spans = m.vbn.infer_posterior_moments(q, pad_bucket=8)
    assert mom.shape == (1, 2)
    # target is binary: mean == p(dysp=1 | smoke=1), std = sqrt(p(1-p))
    gt = exact_posterior(bn, "dysp", {"smoke": 1})
    assert abs(float(mom[0, 0]) - gt[1]) < 0.06
    assert abs(float(mom[0, 1]) - np.sqrt(gt[1] * (1 - gt[1]))) < 0.06
