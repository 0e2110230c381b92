"""Profile host-side per-call overhead of the public infer_posterior path.

Run: python -m benchmarking.host_overhead
"""

from __future__ import annotations

import json
import time

import numpy as np


def _t(fn, reps=200):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults
    from vectorizedbayesiannetwork_tpu.core.plan import (
        get_plan,
        pack_fixed_values,
    )

    g = np.random.default_rng(0)
    n = 4096
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    B, S = 8, 1 << 20
    ev = np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32)
    q = {"target": "x0", "evidence": {"x2": ev}}

    vbn = VBN(G, seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)
    vbn.set_inference_method("importance_sampling", n_samples=S)
    vbn.infer_posterior(q)  # compile

    def emit(name, dt):
        print(json.dumps({"step": name, "us": round(dt * 1e6, 1)}), flush=True)

    emit("infer_posterior_total", _t(lambda: vbn.infer_posterior(q)))

    query = vbn._normalize_query(q)
    emit("normalize_query", _t(lambda: vbn._normalize_query(q)))
    plan = get_plan(vbn, query)
    emit("get_plan", _t(lambda: get_plan(vbn, query)))
    emit(
        "pack_fixed_values", _t(lambda: pack_fixed_values(query, plan, B))
    )
    m = vbn._inference
    emit("make_program", _t(lambda: m.make_program(vbn, query)))
    prog = m.make_program(vbn, query)
    emit(
        "program_key",
        _t(lambda: m._program_key(vbn, prog.plan, prog.tag)),
    )
    fn = m._fn_cache[m._program_key(vbn, prog.plan, prog.tag)]
    key = vbn.next_key()
    emit("next_key", _t(lambda: vbn.next_key()))
    emit("jit_dispatch", _t(lambda: fn(prog.params, key, prog.fixed)))
    emit("cpd_sigs", _t(lambda: tuple(
        vbn.cpd_spec(nd).static_signature() for nd in prog.plan.topo_order
    )))


if __name__ == "__main__":
    main()
