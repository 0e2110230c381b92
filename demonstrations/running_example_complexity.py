"""Running example: end-to-end cost accounting for one posterior query.

Parity: demonstrations/running_example_complexity.py — walks the asymptotic
cost model from vbn/configs/README.md ("Computational Complexity (Batched)")
for the TPU build: MCM time O(Q*S*(topo(N,E)+C_eval)) becomes one compiled
program whose wall clock is dominated by HBM bandwidth at large S.
"""

import time

import numpy as np

import _path  # noqa: F401  (repo-checkout sys.path bootstrap)
from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    import networkx as nx
    import pandas as pd

    g = np.random.default_rng(0)
    n = 2000
    x0, x1 = g.normal(size=n), g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    vbn = VBN(nx.DiGraph([("x0", "x2"), ("x1", "x2")]), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)
    q = {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
    print(f"{'S (particles)':>14} {'first (ms)':>12} {'steady (ms)':>12} "
          f"{'particles/s':>14}")
    for s in [1024, 16384, 262144]:
        vbn.set_inference_method("monte_carlo_marginalization", n_samples=s)
        t0 = time.perf_counter()
        vbn.infer_posterior(q)
        first = (time.perf_counter() - t0) * 1000
        t0 = time.perf_counter()
        for _ in range(3):
            vbn.infer_posterior(q)
        steady = (time.perf_counter() - t0) / 3 * 1000
        print(f"{s:>14} {first:>12.1f} {steady:>12.2f} "
              f"{s / (steady / 1000):>14.2e}")


if __name__ == "__main__":
    main()
