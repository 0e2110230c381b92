"""Compare the four update policies (parity: examples/04_update_mechanisms_demo.py)."""

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
    print_env_header("04_update_mechanisms_demo")
    for policy in ["streaming_stats", "online_sgd", "ema", "replay_buffer"]:
        cpd = "linear_gaussian" if policy == "streaming_stats" else "gaussian_nn"
        conf = defaults.cpd(cpd)
        conf["fit"] = {**conf["fit"], "epochs": 20, "batch_size": 512}
        vbn = VBN(make_linear_graph(), seed=0)
        vbn.set_learning_method(
            "node_wise", nodes_cpds={k: dict(conf) for k in ["x0", "x1", "x2"]}
        )
        vbn.fit(make_df(2000, w=0.5, seed=0))
        for step in range(3):
            vbn.update(make_df(400, w=1.5, seed=step + 1), update_method=policy)
        loc, _ = vbn.get_cpd("x2").conditional_mean_std(
            {"x0": [1.0], "x1": [0.0]}
        )
        print(f"{policy:16s} E[x2 | x0=1, x1=0] = {float(np.asarray(loc).ravel()[0]):.3f} "
              "(drifting toward 1.5)")


if __name__ == "__main__":
    main()
