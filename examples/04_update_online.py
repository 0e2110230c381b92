"""Online updates under concept drift (parity: examples/04_update_online.py)."""

import numpy as np
import pandas as pd

from _common import make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def make_df(n, w, seed):
    g = np.random.default_rng(seed)
    x0, x1 = g.normal(size=n), g.normal(size=n)
    x2 = w * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    return pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})


def main() -> None:
    print_env_header("04_update_online")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]},
    )
    vbn.fit(make_df(2000, w=0.5, seed=0))
    print("initial w:", np.asarray(vbn.params["x2"]["weight"]).ravel())
    # drift: the true coefficient moves 0.5 -> 1.5
    for step in range(4):
        vbn.update(make_df(500, w=1.5, seed=step + 1),
                   update_method="streaming_stats")
        print(f"after update {step}:",
              np.asarray(vbn.params["x2"]["weight"]).ravel())


if __name__ == "__main__":
    main()
