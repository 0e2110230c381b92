"""Serving unpredictable query shapes: mask-dynamic programs + row fusion.

No reference counterpart (the reference is eager torch, so every query
shape costs the same). Under XLA, a compiled program normally specializes
on the query's evidence pattern and target — ideal when shapes repeat,
wasteful when every query is different.
``likelihood_weighting(dynamic_masks=True)`` compiles ONE program per
network: evidence/do masks and the target index cross as runtime arrays,
so brand-new query shapes never recompile, and ``infer_posterior_many``
row-fuses ANY mix of queries (different targets, evidence patterns, batch
sizes) into a single device dispatch.
"""

import numpy as np

from _common import make_linear_df, make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("08_dynamic_serving")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
    )
    vbn.fit(make_linear_df(4000))
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=2048, dynamic_masks=True
    )

    # Three structurally different queries — one compiled program serves
    # them all (and new patterns later will not recompile).
    queries = [
        {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}},
        {"target": "x0", "evidence": {"x2": [[0.3]]}},
        {"target": "x2", "evidence": {"x1": [[0.0]]}, "do": {"x0": [[1.0]]}},
    ]
    for q in queries:
        pdf, samples = vbn.infer_posterior(q)
        w = np.asarray(pdf)
        m = (w / w.sum(1, keepdims=True) * np.asarray(samples)[..., 0]).sum(1)
        print(f"  {q['target']} | {sorted(q['evidence'])}"
              f"{' do=' + str(sorted(q['do'])) if q.get('do') else ''}"
              f" -> mean {m[0]:+.3f}")

    # Row fusion: the same mixed batch in ONE device dispatch.
    outs = vbn.infer_posterior_many(queries)
    means = []
    for pdf, samples in outs:
        w = np.asarray(pdf)
        means.append(
            float(
                (w / w.sum(1, keepdims=True) * np.asarray(samples)[..., 0])
                .sum(1)[0]
            )
        )
    print(f"  row-fused means: {[round(m, 3) for m in means]}")
    # sanity: p(x2 | x0=1, x1=0) has analytic mean 0.5
    assert abs(means[0] - 0.5) < 0.1


if __name__ == "__main__":
    main()
