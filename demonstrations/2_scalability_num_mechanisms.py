"""Fit/inference scaling with the number of mechanisms (nodes).

Parity: demonstrations/2_scalability_num_mechanisms.py — measures wall
clock of node_wise fit and one batched posterior as the chain length grows.
On TPU the compiled sweep amortizes per-node Python overhead to zero at
serve time; the numbers here show compile-once-then-fast behavior.
"""

import time

import numpy as np
import pandas as pd

import _path  # noqa: F401  (repo-checkout sys.path bootstrap)
from vectorizedbayesiannetwork_tpu import VBN, defaults


def chain(n_nodes: int, n_rows: int = 1000, seed: int = 0):
    import networkx as nx

    g = np.random.default_rng(seed)
    cols = {}
    prev = None
    edges = []
    for i in range(n_nodes):
        name = f"v{i}"
        noise = g.normal(size=n_rows)
        cols[name] = 0.8 * cols[f"v{i-1}"] + 0.3 * noise if i else noise
        if i:
            edges.append((f"v{i-1}", name))
    return nx.DiGraph(edges), pd.DataFrame(cols)


def main() -> None:
    for n_nodes in [5, 10, 20, 40]:
        G, df = chain(n_nodes)
        vbn = VBN(G, seed=0)
        vbn.set_learning_method(
            "node_wise",
            nodes_cpds={c: defaults.cpd("linear_gaussian") for c in df.columns},
        )
        t0 = time.perf_counter()
        vbn.fit(df)
        fit_s = time.perf_counter() - t0
        vbn.set_inference_method("likelihood_weighting", n_samples=512)
        q = {"target": f"v{n_nodes-1}", "evidence": {"v0": [[1.0]]}}
        t0 = time.perf_counter()
        vbn.infer_posterior(q)  # compile
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            vbn.infer_posterior(q)
        serve_s = (time.perf_counter() - t0) / 5
        print(f"nodes={n_nodes:3d} fit={fit_s:6.2f}s compile={compile_s:6.2f}s "
              f"serve={serve_s*1000:7.2f}ms/query-batch")


if __name__ == "__main__":
    main()
