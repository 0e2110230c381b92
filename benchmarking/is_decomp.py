"""Decompose importance-sampling latency at 1M particles on the real chip.

Measures, for the flagship linear-Gaussian diagnosis query (target x0,
evidence x2, B=8, S=1M):
  a. full infer_posterior (public path, incl. ESS host sync + post)
  b. the jitted program alone (device time, block_until_ready)
  c. sweep only (no softmax/ESS)
  d. RNG only: threefry normal [B,S] x2 nodes
  e. MCM prediction for reference (the 2.3 ms fast path)

Run: python -m benchmarking.is_decomp
"""

from __future__ import annotations

import json
import time

import numpy as np


from benchmarking._timing import measure as _measure  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults
    from vectorizedbayesiannetwork_tpu.core.base import Query
    from vectorizedbayesiannetwork_tpu.core.plan import (
        get_plan,
        pack_fixed_values,
    )
    from vectorizedbayesiannetwork_tpu.inference._sweep import (
        node_values,
        sweep_trace,
    )

    g = np.random.default_rng(0)
    n = 4096
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    B, S = 8, 1 << 20
    vbn = VBN(G, seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)

    ev = np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32)
    q_diag = {"target": "x0", "evidence": {"x2": ev}}

    def emit(name, dt):
        print(json.dumps({"step": name, "ms": round(dt * 1e3, 3)}), flush=True)

    # e. MCM prediction reference
    vbn.set_inference_method("monte_carlo_marginalization", n_samples=S)
    q_pred = {
        "target": "x2",
        "evidence": {
            "x0": ev,
            "x1": np.linspace(1, -1, B).reshape(B, 1).astype(np.float32),
        },
    }
    emit("mcm_pred_full", _measure(lambda: vbn.infer_posterior(q_pred)))

    # a. public IS path
    vbn.set_inference_method("importance_sampling", n_samples=S)
    emit("is_full_public", _measure(lambda: vbn.infer_posterior(q_diag)))

    # b/c/d. program internals
    query = Query(target="x0", evidence={"x2": jnp.asarray(ev)}, do={})
    plan = get_plan(vbn, query)
    cpds = tuple(vbn.cpd_spec(nd) for nd in plan.topo_order)
    params = tuple(vbn.params[nd] for nd in plan.topo_order)
    fixed = pack_fixed_values(query, plan, B)
    t = plan.target_idx

    @jax.jit
    def prog(params_tuple, key, fixed_vals):
        packed, log_w = sweep_trace(
            plan, cpds, params_tuple, key, fixed_vals, S, weighted=True
        )
        weights = jax.nn.softmax(log_w, axis=1)
        ess = 1.0 / jnp.sum(weights**2, axis=1)
        return weights, node_values(plan, packed, t), ess

    key = jax.random.PRNGKey(0)
    emit("is_program_device", _measure(lambda: prog(params, key, fixed)))

    @jax.jit
    def sweep_only(params_tuple, key, fixed_vals):
        packed, log_w = sweep_trace(
            plan, cpds, params_tuple, key, fixed_vals, S, weighted=True
        )
        return packed, log_w

    emit("sweep_only", _measure(lambda: sweep_only(params, key, fixed)))

    @jax.jit
    def sweep_unweighted(params_tuple, key, fixed_vals):
        packed, log_w = sweep_trace(
            plan, cpds, params_tuple, key, fixed_vals, S, weighted=False
        )
        return packed, log_w

    emit(
        "sweep_unweighted", _measure(lambda: sweep_unweighted(params, key, fixed))
    )

    @jax.jit
    def rng_only(key):
        k0, k1 = jax.random.split(key)
        a = jax.random.normal(k0, (B, S))
        b = jax.random.normal(k1, (B, S))
        return a, b

    emit("rng_2x_normal_BS", _measure(lambda: rng_only(key)))

    @jax.jit
    def softmax_ess(log_w):
        w = jax.nn.softmax(log_w, axis=1)
        return w, 1.0 / jnp.sum(w**2, axis=1)

    lw = jax.random.normal(key, (B, S))
    emit("softmax_ess_only", _measure(lambda: softmax_ess(lw)))

    # host-sync cost: device->host of [B] floats
    w, s_, ess = prog(params, key, fixed)
    emit("ess_host_sync", _measure(lambda: np.asarray(ess)))


if __name__ == "__main__":
    main()
