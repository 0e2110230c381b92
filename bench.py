"""Headline benchmark: posterior queries/s at 1M particles (BASELINE.json).

Workload: the flagship 3-node linear-Gaussian DAG (README minimal example
config), monte-carlo-marginalization posterior with S=1,048,576 particles
per query — the north-star metric "posterior queries/s/chip at 1M
particles". Throughput framing: each system runs at its own best serving
batch — B=256 here (v5e saturates around there; B=512 exceeds HBM), B=8
for the torch reference on CPU (it is memory-bound and DEGRADES with
batch: measured 15.2 q/s at B=8 vs 5.7 q/s at B=128).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup over the reference torch implementation
(/root/reference) running the identical per-query workload on this host's
CPU (the reference has no published numbers to compare against —
SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B = 256  # TPU serving batch (throughput-optimal; B=512 exceeds HBM)
B_REF = 8  # reference's best batch — larger batches DEGRADE its q/s
S = 1 << 20  # 1M particles
REPS = 12


def _sync(out) -> None:
    """Force REAL device completion: fetch one element of one output leaf.

    ``jax.block_until_ready`` through the axon TPU tunnel returns after the
    dispatch ACK, not after execution (measured 0.25 ms "ready" on a 65 ms
    kernel) — fetching a scalar waits for everything submitted before it,
    since the device executes programs in order.
    """
    import jax

    leaf = [
        x
        for x in jax.tree_util.tree_leaves(out)
        if hasattr(x, "dtype") and hasattr(x, "shape")
    ][0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def bench_tpu() -> float:
    from __graft_entry__ import _flagship

    vbn = _flagship(n=4096)
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=S)
    ev = {
        "x0": np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32),
        "x1": np.linspace(1, -1, B).reshape(B, 1).astype(np.float32),
    }
    query = {"target": "x2", "evidence": ev}
    _sync(vbn.infer_posterior(query))  # compile
    _sync(vbn.infer_posterior(query))  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = vbn.infer_posterior(query)
    _sync(out)
    dt = time.perf_counter() - t0
    return (B * REPS) / dt


def bench_reference_cpu() -> float:
    """Reference torch VBN on CPU, identical workload (1 rep)."""
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
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    vbn = RefVBN(G, seed=0, device="cpu")
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: ref_defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    vbn.fit(df)
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=S)
    ev = {
        "x0": torch.linspace(-1, 1, B_REF).reshape(B_REF, 1),
        "x1": torch.linspace(1, -1, B_REF).reshape(B_REF, 1),
    }
    query = {"target": "x2", "evidence": ev}
    vbn.infer_posterior(query)  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        vbn.infer_posterior(query)
        best = min(best, time.perf_counter() - t0)
    return B_REF / best


def main() -> None:
    qps = bench_tpu()
    vs = None
    try:
        ref_qps = bench_reference_cpu()
        vs = qps / ref_qps
    except Exception as exc:  # reference env missing -> report absolute only
        print(f"# reference comparison unavailable: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "posterior_queries_per_s_at_1M_particles",
                "value": round(qps, 3),
                "unit": "queries/s",
                "vs_baseline": None if vs is None else round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
