"""Gibbs sampler micro-bench: the round-3 sampler-table workload.

1024 draws (burn 50, thin 5, 8 candidates, 1 chain) on the 3-node LG
flagship with evidence on x0 — identical to the BENCH_NOTES round-3
row (40.7 ms on v5e vs torch 332.8 ms = 8.2x, the weakest sampler row).
Round 5 hoists ALL per-step RNG out of the scan
(``sampling/gibbs.py``); this measures the same workload on-chip, plus
the torch reference when ``--ref`` is given.

Run: python -m benchmarking.gibbs_micro [--ref]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _model():
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(0)
    n = 4096
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    vbn = VBN(G, seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)
    return vbn


def main() -> None:
    vbn = _model()
    vbn.set_sampling_method("gibbs")
    q = {"target": "x2", "evidence": {"x0": [[0.5]]}}
    kw = dict(n_samples=1024, burn_in=50, n_steps=5)
    s = vbn.sample(q, **kw)  # compile
    np.asarray(s)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(vbn.sample(q, **kw))  # asarray forces completion
        best = min(best, time.perf_counter() - t0)
    rec = {
        "workload": "gibbs 1024 draws burn50 thin5 K8, 3-node LG",
        "ms": round(best * 1e3, 2),
        "draws_per_s": round(1024 / best, 1),
        "r3_baseline_ms": 40.7,
        "ref_torch_ms_r3": 332.8,
    }
    if "--ref" in sys.argv:
        sys.path.insert(0, "/root/reference")
        import networkx as nx
        import pandas as pd
        import torch

        from vbn import VBN as RefVBN, defaults as ref_defaults

        g = np.random.default_rng(0)
        n = 4096
        x0 = g.normal(size=n)
        x1 = g.normal(size=n)
        x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
        df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
        rv = RefVBN(
            nx.DiGraph([("x0", "x2"), ("x1", "x2")]), seed=0, device="cpu"
        )
        rv.set_learning_method(
            "node_wise",
            nodes_cpds={
                k: ref_defaults.cpd("linear_gaussian") for k in df.columns
            },
        )
        rv.fit(df)
        rv.set_sampling_method("gibbs")
        rq = {"target": "x2", "evidence": {"x0": torch.tensor([[0.5]])}}
        rv.sample(rq, n_samples=64)  # warm
        best_r = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rv.sample(rq, n_samples=1024, burn_in=50, n_steps=5)
            best_r = min(best_r, time.perf_counter() - t0)
        rec["ref_torch_ms"] = round(best_r * 1e3, 2)
        rec["speedup"] = round(best_r / best, 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
