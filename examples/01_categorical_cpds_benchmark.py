"""Categorical CPD families accuracy shoot-out (parity: examples/01_categorical_cpds_benchmark.py)."""

import numpy as np

from _common import make_discrete_df, print_env_header

from vectorizedbayesiannetwork_tpu import CPD_REGISTRY
import jax


def main() -> None:
    print_env_header("01_categorical_cpds_benchmark")
    df = make_discrete_df(4000)
    parents = df[["a", "b"]].to_numpy(np.float32)
    x = df[["c"]].to_numpy(np.float32)
    test = make_discrete_df(500, seed=9)
    tp = test[["a", "b"]].to_numpy(np.float32)
    tx = test[["c"]].to_numpy(np.float32)
    key = jax.random.PRNGKey(0)
    for name, kwargs, fit_kw in [
        ("categorical_table", {"n_classes": 4, "parent_n_classes": [3, 2]}, {}),
        ("categorical_embedded_softmax",
         {"n_classes": 4, "embedding_dim": 4, "hidden_dims": [32]},
         {"epochs": 80, "batch_size": 512, "lr": 1e-2}),
        ("softmax_nn", {"n_classes": 4, "hidden_dims": [32]},
         {"epochs": 80, "batch_size": 512, "lr": 1e-2}),
    ]:
        cpd = CPD_REGISTRY[name](2, 1, seed=0, **kwargs)
        params = cpd.fit(cpd.init(key), key, parents, x, **fit_kw)
        lp = cpd.log_prob(params, tx.reshape(-1, 1, 1), tp)
        nll = -float(np.mean(np.asarray(lp)))
        print(f"{name:30s} held-out NLL = {nll:.3f}")


if __name__ == "__main__":
    main()
