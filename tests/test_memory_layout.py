"""Lane-padding memory regression tests (the round-2 HBM OOM class).

TPU arrays are tiled T(8, 128): the minor-most dim pads to 128 lanes and
the second-minor to 8 sublanes. A materialized op whose *every* possible
layout still pads badly (e.g. ``f32[201326592, 2]`` — no permutation avoids
an >=4x blow-up) can exceed HBM even when the logical size is small:
round 2's driver bench died AOT-allocating 96 GiB for exactly that shape
(VERDICT.md, ``BENCH_r02.json``). These tests trace the *actual* headline
benchmark programs at their real shapes (trace only — nothing executes,
so S=1M is cheap on CPU) and assert that no single op's best-layout padded
size exceeds a budget that the fixed programs stay far under but the
broken formulations blow through.
"""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest

import jax

from vectorizedbayesiannetwork_tpu import VBN, defaults

# The broken round-2 program materialized [3*B*S, 2] -> >=4x padded under
# its BEST layout (>=4.3 GiB) and 96 GiB under the one XLA chose. The fixed
# program's largest op is the packed [B, S, total_dim] concat at ~2.0 GiB
# best-layout. 3 GiB cleanly separates them.
BUDGET_BYTES = 3 << 30

B = 64
S = 1 << 20


def _best_layout_padded_bytes(aval) -> int:
    """Min over dim permutations of the T(8,128)-padded byte size."""
    shape = tuple(int(d) for d in getattr(aval, "shape", ()) or ())
    try:
        itemsize = np.dtype(aval.dtype).itemsize
    except Exception:
        return 0
    n = int(np.prod(shape)) if shape else 1
    if n == 0:
        return 0
    # degenerate dims are free: XLA drops size-1 dims in layout assignment
    shape = tuple(d for d in shape if d > 1)
    if len(shape) < 2:
        return n * itemsize  # 1-D/scalar: no sublane/lane pairing to pad
    best = None
    for lane in range(len(shape)):
        for sub in range(len(shape)):
            if sub == lane:
                continue
            rest = n // (shape[lane] * shape[sub])
            padded = (
                rest
                * (math.ceil(shape[lane] / 128) * 128)
                * (math.ceil(shape[sub] / 8) * 8)
            )
            best = padded if best is None else min(best, padded)
    return best * itemsize


def _max_op_bytes(closed_jaxpr):
    """(worst_bytes, description) over every eqn output, incl. subjaxprs."""
    worst = (0, "")
    stack = [closed_jaxpr.jaxpr]
    seen = set()
    while stack:
        j = stack.pop()
        if id(j) in seen:
            continue
        seen.add(id(j))
        for eqn in j.eqns:
            for v in eqn.outvars:
                b = _best_layout_padded_bytes(v.aval)
                if b > worst[0]:
                    worst = (b, f"{eqn.primitive.name} -> {v.aval}")
            for pv in eqn.params.values():
                for cand in pv if isinstance(pv, (list, tuple)) else [pv]:
                    inner = getattr(cand, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        stack.append(inner)
                    elif hasattr(cand, "eqns"):
                        stack.append(cand)
    return worst


def _asia_vbn():
    from benchmarking.data_gen import generate_dataset
    from benchmarking.networks import asia

    bn = asia()
    data = generate_dataset(bn, 1024, seed=0)
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    vbn = VBN(g, seed=0)
    conf = {}
    for node in bn.nodes:
        c = dict(defaults.cpd("categorical_table"), n_classes=bn.card(node))
        if bn.parents[node]:
            c["parent_n_classes"] = [bn.card(p) for p in bn.parents[node]]
        conf[node] = c
    vbn.set_learning_method("node_wise", nodes_cpds=conf)
    vbn.fit(
        {k: np.asarray(v, np.float32).reshape(-1, 1) for k, v in data.items()}
    )
    return vbn


@pytest.fixture(scope="module")
def asia_vbn():
    return _asia_vbn()


def _trace_program(prog):
    key = jax.random.PRNGKey(0)
    return jax.make_jaxpr(prog.fn)(prog.params, key, prog.fixed)


def _assert_within_budget(jaxpr):
    worst_bytes, desc = _max_op_bytes(jaxpr)
    assert worst_bytes <= BUDGET_BYTES, (
        f"op exceeds best-layout padded budget: {desc} = "
        f"{worst_bytes / (1 << 30):.1f} GiB > {BUDGET_BYTES / (1 << 30):.0f} GiB"
    )


def test_asia_headline_lw_fits(asia_vbn, monkeypatch):
    """The bench.py headline program (asia LW, B=64, S=1M, unrolled)."""
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "never")
    asia_vbn.set_inference_method("likelihood_weighting", n_samples=S)
    ev = {
        "smoke": (np.arange(B) % 2).reshape(B, 1).astype(np.float32),
        "asia": ((np.arange(B) // 2) % 2).reshape(B, 1).astype(np.float32),
    }
    method = asia_vbn._inference
    prog = method.make_program(
        asia_vbn,
        asia_vbn._normalize_query({"target": "dysp", "evidence": ev}),
        n_samples=S,
    )
    _assert_within_budget(_trace_program(prog))


def test_asia_scan_path_fits(asia_vbn, monkeypatch):
    """Same workload through the scan-form discrete sweep (large-net path)."""
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "always")
    asia_vbn.set_inference_method("likelihood_weighting", n_samples=S)
    ev = {
        "smoke": (np.arange(B) % 2).reshape(B, 1).astype(np.float32),
        "asia": ((np.arange(B) // 2) % 2).reshape(B, 1).astype(np.float32),
    }
    method = asia_vbn._inference
    prog = method.make_program(
        asia_vbn,
        asia_vbn._normalize_query({"target": "dysp", "evidence": ev}),
        n_samples=S,
    )
    _assert_within_budget(_trace_program(prog))


def test_asia_dynamic_lw_fits(asia_vbn, monkeypatch):
    """Mask-dynamic LW (serving path) at the same shapes."""
    monkeypatch.setenv("VBN_DISCRETE_SCAN", "never")
    asia_vbn.set_inference_method(
        "likelihood_weighting", n_samples=S, dynamic_masks=True
    )
    ev = {
        "smoke": (np.arange(B) % 2).reshape(B, 1).astype(np.float32),
        "asia": ((np.arange(B) // 2) % 2).reshape(B, 1).astype(np.float32),
    }
    method = asia_vbn._inference
    prog = method.make_program(
        asia_vbn,
        asia_vbn._normalize_query({"target": "dysp", "evidence": ev}),
        n_samples=S,
        dynamic_masks=True,
    )
    _assert_within_budget(_trace_program(prog))
