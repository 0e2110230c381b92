"""Trustworthy device timing through the axon TPU tunnel.

``jax.block_until_ready`` through the tunnel returns after the dispatch is
ACKed, NOT after the device finishes (measured: 0.25 ms "block" on a 65 ms
kernel). Every timing helper here forces REAL completion by fetching a
scalar derived from the output to the host — the device executes programs
in submission order, so fetching the last rep's output waits for the whole
timed window.

Use ``measure(fn, reps)`` for steady-state per-call time and
``measure_pipelined(fn, reps)`` is an alias (same semantics — kept so call
sites read naturally where async pipelining is the point being measured).
"""

from __future__ import annotations

import time

import numpy as np


def sync(out) -> None:
    """Force completion of everything submitted so far.

    Fetches one element of one array leaf of ``out`` to the host; in-order
    device execution makes this a barrier for all previously enqueued work.
    """
    import jax

    leaves = [
        x
        for x in jax.tree_util.tree_leaves(out)
        if hasattr(x, "dtype") and hasattr(x, "shape")
    ]
    if not leaves:
        return
    leaf = leaves[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    np.asarray(leaf[idx] if idx else leaf)


def measure(fn, reps: int = 10) -> float:
    """Steady-state seconds per call (compile/warmup excluded)."""
    sync(fn())  # compile + warm
    sync(fn())  # warm again (first exec can include remote-compile tails)
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


measure_pipelined = measure
