"""Amortized inference: train once, answer any posterior in one forward pass.

No reference counterpart (the reference's amortized learning is a
NotImplementedError stub, vbn/learning/amortized.py:6-14). The 'amortized'
learning method fits the CPDs node-wise, then trains a masked-evidence
posterior network; the 'amortized' inference method serves
p(target | evidence) — in ANY direction, including parent-given-child —
as a single batched MLP forward, falling back to Monte Carlo for
do-interventions.
"""

import numpy as np

from _common import make_linear_df, make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("07_amortized_inference")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "amortized",
        nodes_cpds={
            k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]
        },
        epochs=60,
        batch_size=512,
        hidden_dims=[64, 64],
    )
    vbn.fit(make_linear_df(n=6000))
    vbn.set_inference_method("amortized", n_samples=512)

    def report(label, query, analytic):
        pdf, samples = vbn.infer_posterior(query)
        stats = vbn._posterior_stats(pdf, samples)
        fb = " (fallback)" if vbn._inference._last_fallback else ""
        print(
            f"{label:34s} mean={float(np.asarray(stats['mean']).ravel()[0]):+.4f} "
            f"analytic={analytic:+.4f}{fb}"
        )

    # forward conditional: E[x2 | x0=1, x1=0] = 0.5
    report(
        "p(x2 | x0=1, x1=0)",
        {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}},
        0.5,
    )
    # INVERSE posterior: E[x0 | x2=0.3] = cov/var * 0.3 = 0.5/0.30*0.3
    report(
        "p(x0 | x2=0.3)",
        {"target": "x0", "evidence": {"x2": [[0.3]]}},
        0.5,
    )
    # do-intervention -> falls back to the Monte-Carlo chain
    report(
        "p(x2 | do(x0=1))",
        {"target": "x2", "do": {"x0": [[1.0]]}},
        0.5,
    )

    # Fused serving: many queries, one device dispatch.
    results = vbn.infer_posterior_many(
        [
            {"target": "x2", "evidence": {"x0": [[1.0]], "x1": [[0.0]]}},
            {"target": "x0", "evidence": {"x2": [[0.3]]}},
        ]
    )
    print(f"fused dispatch answered {len(results)} queries in one call")


if __name__ == "__main__":
    main()
