"""Round-2 measurement batch (single process, single TPU grant).

1. Re-run the canonical discrete benchmark (per-row IS fallback + exact
   enumeration + full warmup in place) and the clgaussian benchmark
   (mixed-domain warmup fix).
2. Steady-state streaming-update latency (fused whole-network programs).
3. KDE configs at the 1M-particle BASELINE point (kde+LW, kde+RB,
   kde+Gibbs sampling).

Writes a JSON summary next to the bundles; intended to be committed into
BENCH_NOTES.md / results artifacts.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _sync(x) -> None:
    import jax

    leaf = [
        v for v in jax.tree_util.tree_leaves(x)
        if hasattr(v, "dtype") and hasattr(v, "shape")
    ][0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)


def rerun_benchmarks(discrete_bundle: str, clg_bundle: str) -> None:
    from ..bundles import BenchmarkBundle
    from ..pipeline import stage_report, stage_run
    from .r2_suite import CLG_MODELS, DISCRETE_MODELS, _print_aggregate

    for path, models in [
        (discrete_bundle, DISCRETE_MODELS),
        (clg_bundle, CLG_MODELS),
    ]:
        if not path:
            continue
        bundle = BenchmarkBundle.load(path)
        print(f"[rerun] {path}", flush=True)
        stage_run(bundle, models)
        stage_report(bundle)
        _print_aggregate(bundle)


def measure_updates() -> dict:
    """Steady-state update latency per policy on a 1,024-row batch."""
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    out = {}
    g = np.random.default_rng(0)
    n = 8192
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.6 * x0 - 0.3 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])

    def bench(tag, graph, nodes_cpds, data, policy, frame, reps=8):
        v = VBN(graph, seed=0)
        v.set_learning_method("node_wise", nodes_cpds=nodes_cpds)
        v.fit(data)
        v.update(frame, update_method=policy)  # compile
        v.update(frame)  # runtime warm
        _sync(v.params)
        t0 = time.perf_counter()
        for _ in range(reps):
            v.update(frame)
        _sync(v.params)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        fused = bool(v.__dict__.get("_update_prog_cache"))
        out[tag] = {"ms_per_update": round(ms, 3), "fused": fused}
        print(f"  {tag}: {ms:.2f} ms/update (fused={fused})", flush=True)

    batch = df.iloc[:1024]
    bench("lg_streaming_stats", G,
          {k: defaults.cpd("linear_gaussian") for k in G.nodes},
          df, "streaming_stats", batch)
    nn_conf = defaults.cpd("gaussian_nn")
    bench("nn_online_sgd", G, {k: dict(nn_conf) for k in G.nodes},
          df.iloc[:4096], "online_sgd", batch)
    bench("nn_ema", G, {k: dict(nn_conf) for k in G.nodes},
          df.iloc[:4096], "ema", batch)

    a = g.integers(0, 8, size=n)
    b = (a + g.integers(0, 4, size=n)) % 8
    dfd = pd.DataFrame({"a": a, "b": b}, dtype=float)
    Gd = nx.DiGraph([("a", "b")])
    ct = dict(defaults.cpd("categorical_table"), n_classes=8)
    ctb = dict(ct)
    ctb["parent_n_classes"] = [8]
    bench("ct_streaming_stats", Gd, {"a": ct, "b": ctb}, dfd,
          "streaming_stats", dfd.iloc[:1024])
    return out


def measure_kde_1m() -> dict:
    """KDE configs at S=1M (BASELINE config: kde + gibbs + RB marg)."""
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    out = {}
    g = np.random.default_rng(0)
    n = 4096
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.6 * x0 - 0.3 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    v = VBN(G, seed=0)
    v.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: dict(defaults.cpd("kde"), max_points=2048) for k in G.nodes
        },
    )
    v.fit(df)
    S = 1 << 20
    B = 8
    ev = {"x0": np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32)}
    q = {"target": "x2", "evidence": ev}

    def timed(tag, fn, reps=5):
        _sync(fn())
        _sync(fn())
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        _sync(r)
        ms = (time.perf_counter() - t0) * 1e3 / reps
        out[tag] = round(ms, 2)
        print(f"  {tag}: {ms:.1f} ms/call", flush=True)

    v.set_inference_method("likelihood_weighting", n_samples=S)
    timed("kde_lw_1M_B8", lambda: v.infer_posterior(q))
    v.set_inference_method(
        "rao_blackwellized_marginalization", n_samples=S, n_particles=S
    )
    timed("kde_rb_1M_B8", lambda: v.infer_posterior(q), reps=3)
    v.set_sampling_method("gibbs")
    timed(
        "kde_gibbs_sample_4096x256chains",
        lambda: v.sample({"target": "x2", "evidence": {}}, n_samples=4096),
        reps=3,
    )
    return out


def main() -> int:
    discrete = sys.argv[1] if len(sys.argv) > 1 else ""
    clg = sys.argv[2] if len(sys.argv) > 2 else ""
    rerun_benchmarks(discrete, clg)
    summary = {"updates": measure_updates(), "kde_1m": measure_kde_1m()}
    print(json.dumps(summary, indent=1), flush=True)
    with open("benchmarking/out/r2_measure.json", "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
