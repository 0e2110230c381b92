"""Update-policy behavior under drift (parity: demonstrations/4_updaes.py).

Tracks E[x2 | x0=1] across update rounds for each policy while the
generating coefficient drifts, showing EMA's smoothing vs online SGD's
responsiveness vs the replay buffer's retention.
"""

import numpy as np
import pandas as pd

import _path  # noqa: F401  (repo-checkout sys.path bootstrap)
from vectorizedbayesiannetwork_tpu import VBN, defaults


def make_df(n, w, seed):
    import numpy as np

    g = np.random.default_rng(seed)
    x0, x1 = g.normal(size=n), g.normal(size=n)
    x2 = w * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    return pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})


def main() -> None:
    import networkx as nx

    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    conf = defaults.cpd("gaussian_nn")
    conf["fit"] = {**conf["fit"], "epochs": 30, "batch_size": 512, "lr": 1e-2}
    conf["update"] = {**conf["update"], "n_steps": 5, "lr": 1e-2}
    for policy in ["online_sgd", "ema", "replay_buffer"]:
        vbn = VBN(G, seed=0)
        vbn.set_learning_method(
            "node_wise", nodes_cpds={k: dict(conf) for k in ["x0", "x1", "x2"]}
        )
        vbn.fit(make_df(2000, 0.5, 0))
        trace = []
        for step in range(5):
            vbn.update(make_df(400, 1.5, step + 1), update_method=policy)
            loc, _ = vbn.get_cpd("x2").conditional_mean_std(
                {"x0": [1.0], "x1": [0.0]}
            )
            trace.append(float(np.asarray(loc).ravel()[0]))
        print(f"{policy:14s} E[x2|x0=1] trace: "
              + " ".join(f"{v:.2f}" for v in trace) + "  (drift 0.5 -> 1.5)")


if __name__ == "__main__":
    main()
