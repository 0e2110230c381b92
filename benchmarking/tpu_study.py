"""One-process TPU measurement across the BASELINE.json headline configs.

Run on the real chip:  python -m benchmarking.tpu_study
Writes BENCH_NOTES.md-ready JSON lines: config, particles, queries/s.

Covers the five BASELINE.json configs:
  1. linear_gaussian + MCM (README minimal example)       [headline]
  2. gaussian_nn + mdn + importance_sampling
  3. softmax_nn CPDs + ancestral sampling
  4. kde + gibbs and kde net w/ RB-capable linear target
  5. streaming updates on a wider DAG
plus a particle-count scaling sweep on the headline config.
"""

from __future__ import annotations

import json
import time

import numpy as np


from benchmarking._timing import measure as _measure  # noqa: E402


def main() -> None:
    import networkx as nx
    import pandas as pd

    from vectorizedbayesiannetwork_tpu import VBN, defaults

    g = np.random.default_rng(0)
    n = 4096
    x0 = g.normal(size=n)
    x1 = g.normal(size=n)
    x2 = 0.5 * x0 - 0.2 * x1 + 0.1 * g.normal(size=n)
    df = pd.DataFrame({"x0": x0, "x1": x1, "x2": x2})
    G = nx.DiGraph([("x0", "x2"), ("x1", "x2")])
    B = 8
    ev = {
        "x0": np.linspace(-1, 1, B).reshape(B, 1).astype(np.float32),
        "x1": np.linspace(1, -1, B).reshape(B, 1).astype(np.float32),
    }
    q_pred = {"target": "x2", "evidence": ev}
    q_diag = {"target": "x0", "evidence": {"x2": ev["x0"]}}

    def emit(config, s, dt, extra=None):
        rec = {
            "config": config,
            "particles": s,
            "batch": B,
            "ms_per_batch": round(dt * 1000, 2),
            "queries_per_s": round(B / dt, 1),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    # 1. headline + particle scaling
    vbn = VBN(G, seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in df.columns},
    )
    vbn.fit(df)
    for s in [1 << 14, 1 << 17, 1 << 20, 1 << 22]:
        vbn.set_inference_method("monte_carlo_marginalization", n_samples=s)
        dt = _measure(lambda: vbn.infer_posterior(q_pred))
        emit("linear_gaussian+mcm", s, dt)
    vbn.set_inference_method("importance_sampling", n_samples=1 << 20)
    dt = _measure(lambda: vbn.infer_posterior(q_diag))
    emit("linear_gaussian+is(diagnosis)", 1 << 20, dt)
    for s in [1 << 22, 1 << 20, 1 << 16]:
        vbn.set_inference_method(
            "resampled_importance_sampling", n_samples=s, ess_threshold=0.5
        )
        dt = _measure(lambda: vbn.infer_posterior(q_diag))
        emit("linear_gaussian+ris(systematic)", s, dt)
    vbn.set_inference_method(
        "resampled_importance_sampling",
        n_samples=1 << 20,
        ess_threshold=0.5,
        resample_method="multinomial",
    )
    dt = _measure(lambda: vbn.infer_posterior(q_diag))
    emit("linear_gaussian+ris(multinomial)", 1 << 20, dt)
    # Mask-dynamic programs: one program, every evidence pattern (serving
    # for unpredictable query shapes; ~1.5-2x the static sweep's FLOPs).
    vbn.set_inference_method(
        "likelihood_weighting", n_samples=1 << 20, dynamic_masks=True
    )
    dt = _measure(lambda: vbn.infer_posterior(q_diag))
    emit("linear_gaussian+lw(dynamic_masks)", 1 << 20, dt)
    vbn.set_inference_method(
        "monte_carlo_marginalization", n_samples=1 << 20, dynamic_masks=True
    )
    dt = _measure(lambda: vbn.infer_posterior(q_pred))
    emit("linear_gaussian+mcm(dynamic_masks)", 1 << 20, dt)
    vbn.set_inference_method(
        "importance_sampling", n_samples=1 << 20, dynamic_masks=True
    )
    dt = _measure(lambda: vbn.infer_posterior(q_diag))
    emit("linear_gaussian+is(dynamic_masks)", 1 << 20, dt)
    # Serving-batch throughput: the chip saturates around B=256 at 1M
    # particles (B=8 under-utilizes it; B=512 exceeds HBM).
    for bb in [64, 256]:
        evb = {
            "x0": np.linspace(-1, 1, bb).reshape(bb, 1).astype(np.float32),
            "x1": np.linspace(1, -1, bb).reshape(bb, 1).astype(np.float32),
        }
        qb = {"target": "x2", "evidence": evb}
        vbn.set_inference_method(
            "monte_carlo_marginalization", n_samples=1 << 20
        )
        dt = _measure(lambda: vbn.infer_posterior(qb), reps=6)
        print(
            json.dumps(
                {
                    "config": "linear_gaussian+mcm",
                    "particles": 1 << 20,
                    "batch": bb,
                    "ms_per_batch": round(dt * 1000, 2),
                    "queries_per_s": round(bb / dt, 1),
                }
            ),
            flush=True,
        )
    vbn.set_inference_method(
        "rao_blackwellized_marginalization",
        n_samples=512, n_particles=1 << 18,
    )
    dt = _measure(lambda: vbn.infer_posterior(q_pred))
    emit("linear_gaussian+rao_blackwellized", 1 << 18, dt)

    # 2. gaussian_nn + mdn + IS
    vbn2 = VBN(G, seed=0)
    fit_kw = {"epochs": 30, "batch_size": 1024, "lr": 1e-2, "weight_decay": 0.0}
    vbn2.set_learning_method(
        "node_wise",
        nodes_cpds={
            "x0": {**defaults.cpd("gaussian_nn"), "fit": fit_kw},
            "x1": {**defaults.cpd("gaussian_nn"), "fit": fit_kw},
            "x2": {**defaults.cpd("mdn"), "n_components": 3, "fit": fit_kw},
        },
    )
    t0 = time.perf_counter()
    vbn2.fit(df)
    emit("gaussian_nn+mdn fit", 0, time.perf_counter() - t0,
         {"queries_per_s": None})
    vbn2.set_inference_method("importance_sampling", n_samples=1 << 18)
    dt = _measure(lambda: vbn2.infer_posterior(q_diag))
    emit("gaussian_nn+mdn+is", 1 << 18, dt)

    # 3. softmax_nn + ancestral
    dfd = pd.DataFrame(
        {
            "x0": np.rint(np.clip(x0 * 2 + 4, 0, 7)),
            "x1": np.rint(np.clip(x1 * 2 + 4, 0, 7)),
            "x2": np.rint(np.clip(x2 * 2 + 4, 0, 7)),
        }
    )
    vbn3 = VBN(G, seed=0)
    vbn3.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: {**defaults.cpd("softmax_nn"), "n_classes": 8, "fit": fit_kw}
            for k in dfd.columns
        },
    )
    vbn3.fit(dfd)
    vbn3.set_sampling_method("ancestral")
    dt = _measure(
        lambda: vbn3.sample(
            {"target": "x2", "evidence": {}}, n_samples=1 << 20
        )
    )
    emit("softmax_nn+ancestral", 1 << 20, dt)

    # 4. kde + gibbs
    vbn4 = VBN(G, seed=0)
    vbn4.set_learning_method(
        "node_wise",
        nodes_cpds={
            k: {**defaults.cpd("kde"), "max_points": 2048} for k in df.columns
        },
    )
    vbn4.fit(df)
    vbn4.set_sampling_method("gibbs")
    dt = _measure(
        lambda: vbn4.sample(
            q_diag, n_samples=256, burn_in=20, n_chains=64
        ),
        reps=3,
    )
    emit("kde+gibbs(64 chains)", 256, dt)
    vbn4.set_inference_method("likelihood_weighting", n_samples=1 << 16)
    dt = _measure(lambda: vbn4.infer_posterior(q_diag))
    emit("kde+lw", 1 << 16, dt)

    # 5. streaming update
    new_df = df.sample(1024, random_state=0)
    t0 = time.perf_counter()
    vbn.update(new_df, update_method="streaming_stats")
    emit("streaming_stats update (1024 rows)", 0,
         time.perf_counter() - t0, {"queries_per_s": None})


if __name__ == "__main__":
    main()
