"""Ancestral / Gibbs / HMC sampling (parity: examples/03_sampling.py)."""

import numpy as np

from _common import make_linear_df, make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("03_sampling")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]},
    )
    vbn.fit(make_linear_df())
    query = {"target": "x0", "evidence": {"x2": [[0.5]]}}
    for method, kwargs in [
        ("ancestral", {}),
        ("gibbs", {"burn_in": 20, "n_chains": 4}),
        ("hmc", {"burn_in": 20, "step_size": 0.2, "n_chains": 4}),
    ]:
        vbn.set_sampling_method(method)
        s = np.asarray(vbn.sample(query, n_samples=256, **kwargs))
        print(f"{method:10s} mean={s.mean():+.4f} std={s.std():.4f}")
    print("posterior p(x0|x2=0.5) analytic mean ~ +0.862 (ancestral = prior)")


if __name__ == "__main__":
    main()
