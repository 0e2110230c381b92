"""Posterior inference with several methods (parity: examples/02_infer_posterior.py)."""

import numpy as np

from _common import make_linear_df, make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("02_infer_posterior")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]},
    )
    vbn.fit(make_linear_df())
    query = {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
    for method in [
        "monte_carlo_marginalization",
        "importance_sampling",
        "gaussian_exact",
        "rao_blackwellized_marginalization",
    ]:
        vbn.set_inference_method(method, n_samples=512)
        pdf, samples = vbn.infer_posterior(query)
        stats = vbn._posterior_stats(pdf, samples)
        print(
            f"{method:40s} mean={float(stats['mean'][0, 0]):+.4f} "
            f"std={float(stats['std'][0, 0]):.4f} "
            f"ess={float(stats['ess'][0]):.1f}"
        )
    print("analytic conditional mean:", 0.5 * 0.3 - 0.2 * -0.2)


if __name__ == "__main__":
    main()
