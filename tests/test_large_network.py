"""Large-network validation: bnlearn link/munin scale on the scan sweep.

SURVEY.md §7 flags 1000-node networks (link 724n, munin 1041n) as a compile
-time hazard for unrolled sweeps. The scan-form discrete sweep is O(1) in
node count at trace time; this test pins that a link-sized random network
fits and answers weighted posterior queries end-to-end on CPU in test-suite
time. (The real bnlearn files need egress; `random_bn` provides the same
scale and structure class.)
"""

import time

import numpy as np

from benchmarking.data_gen import domain_schema
from benchmarking.exact import ancestral_sample
from benchmarking.models.vbn_tpu import VBNTpuBenchmarkModel
from benchmarking.networks import random_bn


class _Q:
    def __init__(self, i, target, evidence):
        self.query_id = f"q{i}"
        self.target = target
        self.evidence = evidence
        self.skeleton_id = "s"


def test_link_scale_network_end_to_end():
    n_nodes = 724  # = bnlearn "link"
    bn = random_bn(n_nodes, max_indegree=3, max_card=3, seed=5)
    data = {
        k: v.astype(np.float32).reshape(-1, 1)
        for k, v in ancestral_sample(bn, 2000, 0).items()
    }
    m = VBNTpuBenchmarkModel(
        domain_schema(bn),
        seed=0,
        config={
            "inference": {"name": "likelihood_weighting", "n_samples": 256}
        },
    )
    t0 = time.time()
    m.fit(data)
    fit_s = time.time() - t0

    target = bn.nodes[-1]
    ev = bn.nodes[0]
    t0 = time.time()
    res = m.answer_inference_queries(
        [_Q(0, target, {ev: 0}), _Q(1, target, {ev: 1})]
    )
    infer_s = time.time() - t0
    for r in res:
        assert r["ok"], r
        probs = np.asarray(r["probs"])
        assert np.all(np.isfinite(probs))
        assert abs(probs.sum() - 1.0) < 1e-3
    # scan path must keep compile+run tractable at this scale
    assert fit_s < 600, f"fit took {fit_s:.0f}s"
    assert infer_s < 600, f"inference took {infer_s:.0f}s"
