"""Continuous-CPD conditional shapes (parity: demonstrations/1_continuous.py).

Fits each continuous family on heteroscedastic data and prints conditional
mean/std on a probe grid, showing which families capture nonlinearity.
"""

import os

os.environ.setdefault("VBN_SKIP_PLOTS", "1")

import jax
import numpy as np

import _path  # noqa: F401  (repo-checkout sys.path bootstrap)
from vectorizedbayesiannetwork_tpu import CPD_REGISTRY


def main() -> None:
    g = np.random.default_rng(0)
    n = 3000
    p = g.uniform(-2, 2, size=(n, 1)).astype(np.float32)
    x = (np.tanh(2 * p) + 0.05 * (1 + np.abs(p)) * g.normal(size=(n, 1))).astype(
        np.float32
    )
    key = jax.random.PRNGKey(0)
    probes = np.array([[-1.5], [0.0], [1.5]], np.float32)
    for name, kwargs, fit_kw in [
        ("linear_gaussian", {}, {}),
        ("gaussian_nn", {"hidden_dims": [32, 32]},
         {"epochs": 200, "batch_size": 512, "lr": 1e-2}),
        ("rff_gaussian", {"n_features": 128, "lengthscale": 0.7}, {}),
    ]:
        cpd = CPD_REGISTRY[name](1, 1, seed=0, **kwargs)
        params = cpd.fit(cpd.init(key), key, p, x, **fit_kw)
        loc, scale = cpd.conditional_params(params, probes)
        loc = np.asarray(loc).ravel()
        print(f"{name:16s} E[x|p=-1.5,0,1.5] = {np.round(loc, 3)} "
              f"(true ~ {np.round(np.tanh(2 * probes.ravel()), 3)})")


if __name__ == "__main__":
    main()
