"""Cardinality-scaling stress test.

Capability parity with ``/root/reference/stress_test/run.py:28-2270``: an
RL-style reward DAG ``(state, action) -> reward`` with controllable
cardinality k; exact ground-truth posteriors; backends answer batched
``p(reward | state, action)`` queries over evidence chunks; metrics
kl/js/ws + fit/inference time + mse/mae/r2 of posterior point predictions,
aggregated with IQM ± IQR-std; JSON logs and optional grid plots.

CLI:
    python -m stress_test.run --cards 10 50 200 --n-rows 32768 \
        --n-queries 128 --n-samples 512 --out stress_test/out
"""

from __future__ import annotations

import argparse
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class DataConfig:
    n_states: int = 10  # cardinality axis (the sweep variable)
    n_actions: int = 4
    n_rewards: int = 10
    n_rows: int = 32768
    seed: int = 0


@dataclass
class ExperimentConfig:
    cards: List[int] = field(default_factory=lambda: [10, 50, 200])
    n_queries: int = 128
    n_samples: int = 512
    batch_size: int = 128
    seed: int = 0
    out_dir: str = "stress_test/out"
    backends: List[str] = field(default_factory=lambda: ["vbn_tpu", "exact"])


# ---------------------------------------------------------------------------
# Reward DAG problem
# ---------------------------------------------------------------------------

class RewardProblem:
    """state -> reward <- action, all categorical with Dirichlet CPTs."""

    def __init__(self, cfg: DataConfig) -> None:
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        self.p_state = rng.dirichlet([1.0] * cfg.n_states)
        self.p_action = rng.dirichlet([1.0] * cfg.n_actions)
        self.p_reward = rng.dirichlet(
            [0.5] * cfg.n_rewards, size=(cfg.n_states, cfg.n_actions)
        )

    def sample(self, n: int, seed: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(seed)
        s = rng.choice(self.cfg.n_states, size=n, p=self.p_state)
        a = rng.choice(self.cfg.n_actions, size=n, p=self.p_action)
        u = rng.random((n, 1))
        pr = self.p_reward[s, a]
        r = (pr.cumsum(axis=1) < u).sum(axis=1).clip(0, self.cfg.n_rewards - 1)
        return {
            "state": s.astype(np.float32).reshape(-1, 1),
            "action": a.astype(np.float32).reshape(-1, 1),
            "reward": r.astype(np.float32).reshape(-1, 1),
        }

    def exact_posterior(self, state: int, action: int) -> np.ndarray:
        return self.p_reward[state, action]

    def domain(self) -> Dict:
        return {
            "name": f"reward_k{self.cfg.n_states}",
            "nodes": {
                "state": {"type": "discrete", "n_classes": self.cfg.n_states,
                          "states": list(range(self.cfg.n_states)),
                          "parents": []},
                "action": {"type": "discrete", "n_classes": self.cfg.n_actions,
                           "states": list(range(self.cfg.n_actions)),
                           "parents": []},
                "reward": {"type": "discrete", "n_classes": self.cfg.n_rewards,
                           "states": list(range(self.cfg.n_rewards)),
                           "parents": ["state", "action"]},
            },
            "edges": [["state", "reward"], ["action", "reward"]],
        }


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

class GroundTruthBackend:
    name = "exact"

    def fit(self, problem: RewardProblem, data) -> float:
        self.problem = problem
        return 0.0

    def infer(self, queries: np.ndarray, n_samples: int, batch_size: int):
        t0 = time.perf_counter()
        pmfs = np.stack(
            [self.problem.exact_posterior(int(s), int(a)) for s, a in queries]
        )
        return pmfs, (time.perf_counter() - t0) * 1000


class VBNTpuBackend:
    """Fits categorical-table CPDs and answers chunked batched queries."""

    name = "vbn_tpu"

    def fit(self, problem: RewardProblem, data) -> float:
        import networkx as nx

        from vectorizedbayesiannetwork_tpu import VBN, defaults

        cfg = problem.cfg
        g = nx.DiGraph([("state", "reward"), ("action", "reward")])
        self.vbn = VBN(g, seed=0)
        self.n_rewards = cfg.n_rewards
        self.vbn.set_learning_method(
            "node_wise",
            nodes_cpds={
                "state": {**defaults.cpd("categorical_table"),
                          "n_classes": cfg.n_states},
                "action": {**defaults.cpd("categorical_table"),
                           "n_classes": cfg.n_actions},
                "reward": {**defaults.cpd("categorical_table"),
                           "n_classes": cfg.n_rewards,
                           "parent_n_classes": [cfg.n_states, cfg.n_actions]},
            },
        )
        t0 = time.perf_counter()
        self.vbn.fit(data)
        self.vbn.set_inference_method("categorical_exact")
        return (time.perf_counter() - t0) * 1000

    def infer(self, queries: np.ndarray, n_samples: int, batch_size: int):
        # Warm up the compiled program on one chunk so inference_time_ms
        # measures steady-state serving, not the first-call XLA compile
        # (the torch reference is eager, so its numbers never include a
        # compile; without this the first cardinality absorbs ~30s).
        # The warmup MUST be synced to the host: compiles are dispatched
        # asynchronously through the axon tunnel, so an unsynced warmup
        # pushes the whole compile into the timed window.
        warm = queries[: min(batch_size, len(queries))]
        wp, _ = self.vbn.infer_posterior(
            {
                "target": "reward",
                "evidence": {
                    "state": warm[:, :1].astype(np.float32),
                    "action": warm[:, 1:].astype(np.float32),
                },
            },
            n_samples=n_samples,
        )
        np.asarray(wp)  # block until compile + execution really finish
        t0 = time.perf_counter()
        out = []
        for start in range(0, len(queries), batch_size):
            chunk = queries[start : start + batch_size]
            probs, support = self.vbn.infer_posterior(
                {
                    "target": "reward",
                    "evidence": {
                        "state": chunk[:, :1].astype(np.float32),
                        "action": chunk[:, 1:].astype(np.float32),
                    },
                },
                n_samples=n_samples,
            )
            probs = np.asarray(probs)
            support = np.rint(np.asarray(support)[..., 0]).astype(int)
            pmf = np.zeros((len(chunk), self.n_rewards))
            if probs.shape[1] == self.n_rewards:
                for i in range(len(chunk)):
                    pmf[i, np.clip(support[i], 0, self.n_rewards - 1)] = probs[i]
            else:  # particle output -> histogram
                for i in range(len(chunk)):
                    pmf[i] = np.bincount(
                        np.clip(support[i], 0, self.n_rewards - 1),
                        weights=np.maximum(probs[i], 0),
                        minlength=self.n_rewards,
                    )
            pmf = pmf / np.maximum(pmf.sum(axis=1, keepdims=True), 1e-12)
            out.append(pmf)
        return np.concatenate(out), (time.perf_counter() - t0) * 1000


BACKENDS = {"exact": GroundTruthBackend, "vbn_tpu": VBNTpuBackend}


# ---------------------------------------------------------------------------
# Experiment loop
# ---------------------------------------------------------------------------

def _metrics(pmfs: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    from benchmarking.metrics import (
        iqm,
        iqr_std,
        js_divergence,
        kl_divergence,
        regression_metrics,
        wasserstein_distance,
    )

    kls = [kl_divergence(g, p) for g, p in zip(gt, pmfs)]
    jss = [js_divergence(g, p, normalized=True) for g, p in zip(gt, pmfs)]
    wss = [wasserstein_distance(g, p) for g, p in zip(gt, pmfs)]
    support = np.arange(gt.shape[1])
    mean_pred = pmfs @ support
    mean_true = gt @ support
    reg = regression_metrics(mean_true, mean_pred)
    return {
        "kl_iqm": iqm(kls), "kl_iqr_std": iqr_std(kls),
        "js_iqm": iqm(jss), "js_iqr_std": iqr_std(jss),
        "ws_iqm": iqm(wss), "ws_iqr_std": iqr_std(wss),
        **reg,
    }


def run_experiments(cfg: ExperimentConfig) -> List[Dict]:
    os.makedirs(cfg.out_dir, exist_ok=True)
    results: List[Dict] = []
    rng = np.random.default_rng(cfg.seed)
    for card in cfg.cards:
        dcfg = DataConfig(
            n_states=card,
            n_rewards=min(card, 50),
            seed=cfg.seed,
        )
        problem = RewardProblem(dcfg)
        data = problem.sample(dcfg.n_rows, seed=cfg.seed + 1)
        queries = np.stack(
            [
                rng.integers(0, dcfg.n_states, cfg.n_queries),
                rng.integers(0, dcfg.n_actions, cfg.n_queries),
            ],
            axis=1,
        )
        gt = np.stack(
            [problem.exact_posterior(int(s), int(a)) for s, a in queries]
        )
        for name in cfg.backends:
            backend = BACKENDS[name]()
            try:
                fit_ms = backend.fit(problem, data)
                pmfs, infer_ms = backend.infer(
                    queries, cfg.n_samples, cfg.batch_size
                )
                rec = {
                    "backend": name,
                    "card": card,
                    "fit_time_ms": fit_ms,
                    "inference_time_ms": infer_ms,
                    "queries_per_s": cfg.n_queries / max(infer_ms / 1000, 1e-9),
                    **_metrics(pmfs, gt),
                    "ok": True,
                }
            except Exception as exc:
                rec = {"backend": name, "card": card, "ok": False,
                       "error": str(exc)[:300]}
            results.append(rec)
            print(json.dumps(rec))
    stamp = time.strftime("%Y%m%d_%H%M%S")
    out_path = os.path.join(cfg.out_dir, f"stress_{stamp}.json")
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump({"config": asdict(cfg), "results": results}, f, indent=2)
    print(f"# wrote {out_path}")
    return results


def plot_metrics_grid(results: List[Dict], out_path: str) -> None:
    """Per-metric vs cardinality grid (parity: run.py:1453)."""
    from vectorizedbayesiannetwork_tpu.display.plots import finish, get_pyplot

    plt = get_pyplot()
    if plt is None:
        return
    metrics = ["kl_iqm", "js_iqm", "ws_iqm", "inference_time_ms"]
    backends = sorted({r["backend"] for r in results if r.get("ok")})
    fig, axes = plt.subplots(2, 2, figsize=(9, 6))
    for ax, metric in zip(axes.flat, metrics):
        for backend in backends:
            rows = [
                r for r in results if r["backend"] == backend and r.get("ok")
            ]
            ax.plot(
                [r["card"] for r in rows],
                [r.get(metric, float("nan")) for r in rows],
                marker="o",
                label=backend,
            )
        ax.set_xlabel("cardinality k")
        ax.set_title(metric)
        ax.set_xscale("log")
    axes.flat[0].legend()
    fig.tight_layout()
    finish(plt, fig, out_path, False)


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="stress_test")
    parser.add_argument("--cards", type=int, nargs="*", default=[10, 50, 200])
    parser.add_argument("--n-rows", type=int, default=32768)
    parser.add_argument("--n-queries", type=int, default=128)
    parser.add_argument("--n-samples", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="stress_test/out")
    parser.add_argument(
        "--backends", nargs="*", default=["vbn_tpu", "exact"]
    )
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)
    cfg = ExperimentConfig(
        cards=args.cards,
        n_queries=args.n_queries,
        n_samples=args.n_samples,
        batch_size=args.batch_size,
        seed=args.seed,
        out_dir=args.out,
        backends=args.backends,
    )
    results = run_experiments(cfg)
    if args.plot:
        plot_metrics_grid(
            results, os.path.join(cfg.out_dir, "stress_grid.png")
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
