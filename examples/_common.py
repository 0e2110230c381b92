"""Shared example helpers (parity: /root/reference/examples/_common.py)."""

from __future__ import annotations

import os
import sys

# Examples run headless by default; honor VBN_SKIP_PLOTS like the reference.
os.environ.setdefault("VBN_SKIP_PLOTS", "1")

# Allow running straight from a repo checkout without installation.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def seed_all(seed: int) -> None:
    np.random.seed(seed)


def print_env_header(example_name: str) -> None:
    import jax

    py_ver = sys.version.split()[0]
    print(
        f"{example_name} | Python {py_ver} | JAX {jax.__version__} | "
        f"backend {jax.default_backend()} | devices {len(jax.devices())}"
    )


def make_linear_df(n: int = 2000, seed: int = 0):
    import pandas as pd

    g = np.random.default_rng(seed)
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    return pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})


def make_linear_graph():
    import networkx as nx

    return nx.DiGraph([("x0", "x2"), ("x1", "x2")])


def make_discrete_df(n: int = 3000, seed: int = 0):
    import pandas as pd

    g = np.random.default_rng(seed)
    a = g.integers(0, 3, n)
    b = g.integers(0, 2, n)
    c = (a + 2 * b + g.integers(0, 2, n)) % 4
    return pd.DataFrame(
        {"a": a.astype(float), "b": b.astype(float), "c": c.astype(float)}
    )


def make_discrete_graph():
    import networkx as nx

    return nx.DiGraph([("a", "c"), ("b", "c")])
