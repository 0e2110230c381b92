"""Measure the host-sync-free weighted-inference paths (is/ris/lbp) on TPU.

Run: python -m benchmarking.sync_fix_study
"""

from __future__ import annotations

import json
import time

import numpy as np


from benchmarking._timing import measure as _measure  # noqa: E402


def main() -> None:
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
    B, S = 8, 1 << 20
    ev = np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32)
    q_diag = {"target": "x0", "evidence": {"x2": ev}}

    vbn = VBN(G, seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)

    for method in (
        "importance_sampling",
        "likelihood_weighting",
        "resampled_importance_sampling",
        "lbp",
    ):
        vbn.set_inference_method(method, n_samples=S)
        dt = _measure(lambda: vbn.infer_posterior(q_diag))
        print(
            json.dumps(
                {
                    "config": f"linear_gaussian + {method}",
                    "particles": S,
                    "ms_per_batch": round(dt * 1e3, 2),
                    "queries_per_s": round(B / dt, 1),
                }
            ),
            flush=True,
        )

    # gaussian_nn + mdn + IS (BASELINE config 2)
    G2 = nx.DiGraph([("a", "c"), ("b", "c"), ("c", "d")])
    a = g.normal(size=n)
    b = g.normal(size=n)
    c = np.tanh(a) + 0.5 * b + 0.1 * g.normal(size=n)
    d = c**2 + 0.1 * g.normal(size=n)
    df2 = pd.DataFrame({"a": a, "b": b, "c": c, "d": d})
    vbn2 = VBN(G2, seed=0)
    vbn2.set_learning_method(
        "node_wise",
        nodes_cpds={
            "a": defaults.cpd("gaussian_nn"),
            "b": defaults.cpd("gaussian_nn"),
            "c": defaults.cpd("mdn"),
            "d": defaults.cpd("mdn"),
        },
    )
    vbn2.fit(df2)
    S2 = 1 << 18
    vbn2.set_inference_method("importance_sampling", n_samples=S2)
    q2 = {"target": "a", "evidence": {"d": ev}}
    dt = _measure(lambda: vbn2.infer_posterior(q2))
    print(
        json.dumps(
            {
                "config": "gaussian_nn+mdn + is (diagnosis)",
                "particles": S2,
                "ms_per_batch": round(dt * 1e3, 2),
                "queries_per_s": round(B / dt, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
