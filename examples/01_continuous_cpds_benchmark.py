"""Continuous CPD families accuracy shoot-out (parity: examples/01_continous_cpds_benchmark.py)."""

import numpy as np

from _common import print_env_header

from vectorizedbayesiannetwork_tpu import CPD_REGISTRY
import jax


def main() -> None:
    print_env_header("01_continuous_cpds_benchmark")
    g = np.random.default_rng(0)
    n = 3000
    parents = g.normal(size=(n, 2)).astype(np.float32)
    x = (
        np.sin(parents[:, :1]) * 1.5
        + 0.5 * parents[:, 1:]
        + 0.15 * g.normal(size=(n, 1)).astype(np.float32)
    )
    test_p = g.normal(size=(400, 2)).astype(np.float32)
    test_x = (
        np.sin(test_p[:, :1]) * 1.5
        + 0.5 * test_p[:, 1:]
        + 0.15 * g.normal(size=(400, 1)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)
    for name, kwargs, fit_kw in [
        ("linear_gaussian", {}, {}),
        ("gaussian_nn", {"hidden_dims": [32, 32]},
         {"epochs": 150, "batch_size": 512, "lr": 1e-2}),
        ("mdn", {"n_components": 5, "hidden_dims": [32, 32]},
         {"epochs": 150, "batch_size": 512, "lr": 1e-2}),
        ("rff_gaussian", {"n_features": 256}, {}),
        ("kde", {"max_points": 2048, "bandwidth": 0.25,
                 "parent_bandwidth": 0.5}, {}),
    ]:
        cpd = CPD_REGISTRY[name](2, 1, seed=0, **kwargs)
        params = cpd.fit(cpd.init(key), key, parents, x, **fit_kw)
        lp = cpd.log_prob(params, test_x[None], test_p[None].repeat(1, 0))
        # held-out NLL per point
        lp = cpd.log_prob(
            params, test_x.reshape(400, 1, 1), test_p
        )
        nll = -float(np.mean(np.asarray(lp)))
        print(f"{name:16s} held-out NLL = {nll:.3f} (lower is better)")


if __name__ == "__main__":
    main()
