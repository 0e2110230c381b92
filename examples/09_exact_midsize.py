"""Exact mid-size inference via the compiled junction tree.

The ``categorical_exact`` method answers latent-parent queries on
networks far past joint-enumeration range (here: the 27-node insurance
structure) EXACTLY — the clique-tree calibration compiles to one XLA
program per network (``inference/_jtree.py``). The reference's exact
method must fall back to sampling for these queries
(``/root/reference/vbn/inference/categorical_exact.py:38-87``).
"""

import numpy as np

from _common import print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("09_exact_midsize")
    import networkx as nx

    from benchmarking.data_gen import generate_dataset
    from benchmarking.exact import exact_posterior
    from benchmarking.midsize import insurance

    bn = insurance()
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
        {
            k: np.asarray(v, np.float32).reshape(-1, 1)
            for k, v in data.items()
        }
    )

    vbn.set_inference_method("categorical_exact")
    target = "PropCost"
    evidence = {"Age": 1, "Accident": 2}
    probs, support = vbn.infer_posterior(
        {
            "target": target,
            "evidence": {
                n: np.full((1, 1), float(v), np.float32)
                for n, v in evidence.items()
            },
        }
    )
    probs = np.asarray(probs)[0]
    print(f"p({target} | {evidence}) [junction tree, device]:")
    print("  ", np.round(probs, 5))
    ve = exact_posterior(bn, target, evidence)
    print("host VE on the TRUE network (fit error excluded below):")
    print("  ", np.round(ve, 5))
    used_fallback = vbn._inference._last_fallback
    print(f"sampling fallback used: {used_fallback}  (expect False)")
    assert not used_fallback

    # Same engine through the fused pmf serving path (one dispatch for a
    # whole query batch):
    k_max = max(bn.card(n) for n in bn.nodes)
    out = vbn.infer_posterior_pmf(
        [
            {
                "target": t,
                "evidence": {
                    "Age": np.full((1, 1), 1.0, np.float32),
                },
            }
            for t in ("MedCost", "ILiCost", "Theft")
        ],
        n_classes=k_max,
    )
    pmf, spans = out
    for (lo, hi, _t), t in zip(spans, ("MedCost", "ILiCost", "Theft")):
        row = pmf[lo, : bn.card(t)]
        print(f"p({t} | Age=1) =", np.round(row / row.sum(), 4))


if __name__ == "__main__":
    main()
