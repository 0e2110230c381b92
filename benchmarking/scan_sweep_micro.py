"""Micro-benchmark: scan-form fused Pallas sweep vs the XLA discrete scan
at link/munin node counts (round-5 roadmap #2 — lifting the fused-sweep
node ceiling past the unrolled kernel's compile-time-bound 80 nodes).

Workload mirrors the committed link-scale bundle
(``benchmarking/out/r4_linkscale``): seeded random discrete networks
(cards 2-3, max in-degree 3 — the 724/1041-node bnlearn class analogue),
mask-dynamic LW programs, default 4096 particles.

Run on the TPU:  python -m benchmarking.scan_sweep_micro --nodes 724
"""

from __future__ import annotations

import argparse
import json
import time

import networkx as nx
import numpy as np

import jax
import jax.numpy as jnp

from benchmarking.data_gen import generate_dataset
from benchmarking.networks import random_bn
from benchmarking._timing import measure, sync
from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.core.base import Query
from vectorizedbayesiannetwork_tpu.core.plan import get_plan


def fit_vbn(bn, seed=0, rows=4096):
    data = generate_dataset(bn, rows, seed=seed)
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    vbn = VBN(g, seed=seed)
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


def rand_queries(bn, n_q, seed=0):
    rng = np.random.default_rng(seed)
    nodes = list(bn.nodes)
    qs = []
    for _ in range(n_q):
        picks = rng.choice(len(nodes), size=4, replace=False)
        tgt = nodes[picks[0]]
        ev = {
            nodes[p]: int(rng.integers(0, bn.card(nodes[p])))
            for p in picks[1:]
        }
        qs.append((tgt, ev))
    return qs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=724)
    ap.add_argument("--particles", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=96)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    bn = random_bn(n_nodes=args.nodes, max_card=3, seed=11)
    t0 = time.perf_counter()
    vbn = fit_vbn(bn)
    fit_s = time.perf_counter() - t0
    print(f"fit {args.nodes} nodes: {fit_s:.1f}s")

    topo = tuple(vbn.dag.topological_order())
    plan = get_plan(vbn, Query(target=topo[0], evidence={}, do={}))
    cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
    params = tuple(vbn.params[n] for n in plan.topo_order)
    node_to_idx = {n: i for i, n in enumerate(plan.topo_order)}
    n = plan.n_nodes
    s = args.particles

    qs = rand_queries(bn, args.queries, seed=3)
    b = len(qs)
    fixed = np.zeros((b, n), np.float32)
    ev = np.zeros((b, n), np.float32)
    do = np.zeros((b, n), np.float32)
    tgt = np.zeros((b,), np.int32)
    for r, (t, e) in enumerate(qs):
        tgt[r] = node_to_idx[t]
        for k, v in e.items():
            ev[r, node_to_idx[k]] = 1.0
            fixed[r, node_to_idx[k]] = v

    from vectorizedbayesiannetwork_tpu.ops.sweep_scan_pallas import (
        make_scan_sweep_fn,
        scan_batch_fits,
        scan_sweep_reason,
    )

    reason = scan_sweep_reason(plan, cpds, s)
    print(f"gate: {reason or 'OK'}; batch_fits({b}): "
          f"{scan_batch_fits(plan, b, cpds)}")
    results = {"nodes": args.nodes, "particles": s, "queries": b}

    if reason is None and scan_batch_fits(plan, b, cpds):
        raw = make_scan_sweep_fn(plan, cpds, s, want=("logw", "tgt"))
        fj = jax.jit(
            lambda p, k, f, e, d, t: raw(p, k, f, e, d, t)[:2]
        )
        a = (jnp.asarray(fixed), jnp.asarray(ev), jnp.asarray(do),
             jnp.asarray(tgt))
        t0 = time.perf_counter()
        out = fj(params, jax.random.PRNGKey(0), *a)
        sync(out)
        compile_s = time.perf_counter() - t0
        key = jax.random.PRNGKey(1)
        dt = measure(lambda: fj(params, key, *a), reps=args.reps)
        print(
            f"pallas-scan: compile {compile_s:.1f}s, "
            f"{1e3 * dt:.2f} ms/dispatch ({1e3 * dt / b:.3f} ms/query)"
        )
        results["pallas_compile_s"] = compile_s
        results["pallas_ms_per_query"] = 1e3 * dt / b

        # pmf-reduction mode (the serving path)
        raw_pmf = make_scan_sweep_fn(plan, cpds, s, want=("pmf_logw",))
        fp = jax.jit(lambda p, k, f, e, d, t: raw_pmf(p, k, f, e, d, t)[3])
        t0 = time.perf_counter()
        out = fp(params, jax.random.PRNGKey(0), *a)
        sync(out)
        compile_s = time.perf_counter() - t0
        dt = measure(lambda: fp(params, key, *a), reps=args.reps)
        print(
            f"pallas-scan pmf: compile {compile_s:.1f}s, "
            f"{1e3 * dt:.2f} ms/dispatch ({1e3 * dt / b:.3f} ms/query)"
        )
        results["pallas_pmf_ms_per_query"] = 1e3 * dt / b

    # XLA discrete scan path (what serves these nets today)
    from vectorizedbayesiannetwork_tpu.inference._dynamic_sweep import (
        dynamic_sweep_trace,
    )

    def xla_fn(p, k, f, e, d):
        packed, logw = dynamic_sweep_trace(plan, cpds, p, k, f, e, d, s)
        return logw

    fx = jax.jit(xla_fn)
    t0 = time.perf_counter()
    out = fx(params, jax.random.PRNGKey(0), jnp.asarray(fixed),
             jnp.asarray(ev), jnp.asarray(do))
    sync(out)
    compile_s = time.perf_counter() - t0
    key = jax.random.PRNGKey(1)
    dt = measure(
        lambda: fx(params, key, jnp.asarray(fixed), jnp.asarray(ev),
                   jnp.asarray(do)),
        reps=max(2, args.reps // 2),
    )
    print(
        f"xla-scan: compile {compile_s:.1f}s, "
        f"{1e3 * dt:.2f} ms/dispatch ({1e3 * dt / b:.3f} ms/query)"
    )
    results["xla_compile_s"] = compile_s
    results["xla_ms_per_query"] = 1e3 * dt / b
    print(json.dumps(results))


if __name__ == "__main__":
    main()
