"""1M-particle link-scale serving: B-sweep with exact-GT accuracy.

Round-4 VERDICT weak #6: the "unlocked" 1M-particle link-scale regime
was one BENCH_NOTES line (47.4 ms/query at B=8), no artifact, no
accuracy evidence, no batch sweep. This driver serves LW posteriors on
the bounded-treewidth 724-node fixture at S=1,048,576 particles across
a batch sweep, comparing every pmf row against exact VE ground truth —
the regime the XLA scan cannot represent at all (its carried state at
724 nodes x 1M particles is 24.3 GB > 16 GB HBM; the fused scan kernel
never materializes per-particle state in HBM).

Run on the TPU host:  python -m benchmarking.linkscale_1m
Writes benchmarking/results/linkscale_1m.json.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import networkx as nx

    from benchmarking.data_gen import generate_dataset
    from benchmarking.exact import exact_posterior, min_fill_order
    from benchmarking.networks import random_bn_treewidth
    from vectorizedbayesiannetwork_tpu import VBN, defaults

    S = 1 << 20
    bn = random_bn_treewidth(724, seed=0)
    data = generate_dataset(bn, 4096, seed=0)
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
    vbn.fit(
        {k: np.asarray(v, np.float32).reshape(-1, 1) for k, v in data.items()},
        verbosity=0,
    )
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )

    # Heterogeneous query set (distinct targets + 2-node evidence each)
    order = min_fill_order(bn)
    rng = np.random.default_rng(7)
    queries, gts = [], []
    nodes = list(bn.nodes)
    while len(queries) < 96:
        t = nodes[int(rng.integers(0, len(nodes)))]
        pool = [n for n in nodes if n != t]
        evn = [pool[int(i)] for i in rng.choice(len(pool), 2, replace=False)]
        ev = {n: int(rng.integers(0, bn.card(n))) for n in evn}
        try:
            gt = exact_posterior(bn, t, ev, elim_order=order)
        except Exception:
            continue
        queries.append(
            {
                "target": t,
                "evidence": {
                    n: np.full((1, 1), float(v), np.float32)
                    for n, v in ev.items()
                },
            }
        )
        gts.append(gt)

    k_max = max(bn.card(n) for n in bn.nodes)
    rows_out = []
    for b in (8, 32, 96):
        qs = queries[:b]
        # warm (compile + steady)
        vbn.infer_posterior_pmf(qs, n_classes=k_max, pad_bucket=b)
        vbn.infer_posterior_pmf(qs, n_classes=k_max, pad_bucket=b)
        best = float("inf")
        out = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = vbn.infer_posterior_pmf(qs, n_classes=k_max, pad_bucket=b)
            best = min(best, time.perf_counter() - t0)
        pmf_rows, spans = out
        kls = []
        for (lo, hi, _ti), gt, q in zip(spans, gts, qs):
            r = pmf_rows[lo][: len(gt)].astype(np.float64)
            r = r / max(r.sum(), 1e-30)
            kls.append(
                float(
                    np.sum(
                        gt
                        * np.log(
                            np.maximum(gt, 1e-12) / np.maximum(r, 1e-12)
                        )
                    )
                )
            )
        rows_out.append(
            {
                "B": b,
                "ms_per_query": round(1e3 * best / b, 2),
                "kl_vs_exact_median": round(float(np.median(kls)), 6),
                "kl_vs_exact_iqm": round(
                    float(
                        np.mean(
                            np.sort(kls)[len(kls) // 4 : -len(kls) // 4]
                            if len(kls) >= 8
                            else kls
                        )
                    ),
                    6,
                ),
            }
        )
        print(json.dumps(rows_out[-1]), flush=True)

    rec = {
        "workload": "randomtw_724n LW pmf serving at S=1,048,576",
        "n_queries_gt": len(gts),
        "sweep": rows_out,
    }
    os.makedirs("benchmarking/results", exist_ok=True)
    with open("benchmarking/results/linkscale_1m.json", "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()
