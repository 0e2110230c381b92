"""Test harness config: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy (SURVEY.md §4): all tests run on
the CPU backend; multi-device sharding logic is exercised via
``--xla_force_host_platform_device_count=8`` (the JAX analogue of the
reference's dummy-backend trick). Must run before jax is first imported.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon TPU-tunnel hook
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("VBN_SKIP_PLOTS", "1")

import numpy as np
import pytest

# The axon sitecustomize hook imports jax and registers the TPU plugin at
# interpreter start — BEFORE this conftest runs — so the env vars above are
# too late for a bare ``pytest`` invocation (they do cover ``runtests.sh``,
# which strips the hook). Force the CPU backend through the config API,
# which works until the first backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.local_device_count() == 8, (
    "tests require the virtual 8-device CPU mesh; got "
    f"{jax.devices()}"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_chain_df(n=1500, seed=0):
    """x0 -> x2 <- x1 linear-Gaussian testbed used across test modules."""
    import pandas as pd

    g = np.random.default_rng(seed)
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    return pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})


def make_chain_graph():
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from([("x0", "x2"), ("x1", "x2")])
    return g
