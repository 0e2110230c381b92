"""High-cardinality and link-scale serving with exact ground truth.

Round-5 capabilities in one script:

* barley-class serving (48 nodes, cards to 67): the scan-form fused
  kernel's class walk runs to its 128-lane reduction budget, so the
  reference corpus's high-cardinality members ride the fused path
  (``ops/sweep_scan_pallas.py``; round-4 gated at 64 classes).
* link-scale accuracy (724 nodes): the bounded-treewidth generator
  (``benchmarking/networks.random_bn_treewidth``) makes exact VE ground
  truth tractable at any node count — the posterior pmf rows served by
  the mask-dynamic kernel are checked against exact inference, not just
  timed.

Both paths serve through ``infer_posterior_pmf``: on LW the posterior
histogram reduces IN KERNEL and only ``[B, k]`` rows reach the host.
"""

import numpy as np

from _common import print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def _fit(bn, rows=4096):
    import networkx as nx

    from benchmarking.data_gen import generate_dataset

    data = generate_dataset(bn, rows, seed=0)
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
        {k: np.asarray(v, np.float32).reshape(-1, 1) for k, v in data.items()}
    )
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=4096, dynamic_masks=True
    )
    return vbn


def main() -> None:
    print_env_header("11_highcard_linkscale")
    import os

    from benchmarking.exact import exact_posterior, min_fill_order
    from benchmarking.highcard import barley
    from benchmarking.networks import random_bn_treewidth

    # CI smoke shrinks the CPU-expensive shapes (the full sizes run on
    # TPU in seconds but cost minutes of XLA-CPU compile in the
    # examples pool); semantics identical.
    smoke = os.environ.get("VBN_EXAMPLE_SMOKE") == "1"
    link_n = 96 if smoke else 724

    # --- barley: a 67-class target served as one fused pmf row --------
    bn = barley()
    vbn = _fit(bn, rows=1024 if smoke else 4096)
    tgt = max(bn.nodes, key=bn.card)
    evn = next(n for n in bn.nodes if n != tgt)
    rows, _ = vbn.infer_posterior_pmf(
        [{"target": tgt, "evidence": {evn: [[1.0]]}}],
        n_classes=bn.card(tgt),
    )
    pmf = rows[0][: bn.card(tgt)]
    pmf = pmf / pmf.sum()
    gt = exact_posterior(bn, tgt, {evn: 1}, elim_order=min_fill_order(bn))
    kl = float(
        np.sum(gt * np.log(np.maximum(gt, 1e-12) / np.maximum(pmf, 1e-12)))
    )
    print(
        f"barley: card-{bn.card(tgt)} target, "
        f"KL(exact || served) = {kl:.4f}"
    )

    # --- link scale: bounded-treewidth class with exact GT ------------
    bn = random_bn_treewidth(link_n, seed=0)
    vbn = _fit(bn, rows=2048)
    order = min_fill_order(bn)
    tgt, evn = bn.nodes[-1], bn.nodes[0]
    rows, _ = vbn.infer_posterior_pmf(
        [{"target": tgt, "evidence": {evn: [[0.0]]}}],
        n_classes=max(bn.card(n) for n in bn.nodes),
    )
    pmf = rows[0][: bn.card(tgt)]
    pmf = pmf / pmf.sum()
    gt = exact_posterior(bn, tgt, {evn: 0}, elim_order=order)
    kl = float(
        np.sum(gt * np.log(np.maximum(gt, 1e-12) / np.maximum(pmf, 1e-12)))
    )
    print(f"{link_n}-node link-class: KL(exact || served) = {kl:.4f}")


if __name__ == "__main__":
    main()
