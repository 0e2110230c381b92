"""Exact-oracle backend: variable elimination on the true network.

The benchmark-suite analogue of the reference's pgmpy VariableElimination
backend (/root/reference/benchmarking/models/pgmpy.py) without the
external dependency: answers every query exactly from the generating CPTs
(requires the runner to hand it the true network; its 'fit' estimates CPTs
from data like a maximum-likelihood pgmpy fit would).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..bif import DiscreteBN
from ..exact import exact_posterior
from .base import BaseBenchmarkModel
from .registry import register_model


@register_model("exact_oracle")
class ExactOracleModel(BaseBenchmarkModel):
    def __init__(self, domain: Dict, seed: int = 0, config: Optional[Dict] = None):
        super().__init__(domain, seed, config)
        self.bn: Optional[DiscreteBN] = None
        self.gbn = None  # gaussian-class oracle (see _fit_gaussian)
        self.clg = None  # clgaussian-class oracle (see _fit_clg)

    def fit(self, data: Dict[str, np.ndarray]) -> float:
        if self.domain.get("class") == "gaussian":
            return self._fit_gaussian(data)
        if self.domain.get("class") == "clgaussian":
            return self._fit_clg(data)

        def run():
            nodes = self.domain["nodes"]
            bn = DiscreteBN(name=self.domain.get("name", "fit"))
            for node, info in nodes.items():
                bn.nodes.append(node)
                bn.states[node] = list(info["states"])
                bn.parents[node] = list(info["parents"])
            # MLE CPT with Laplace smoothing (alpha=1), like pgmpy BDeu-ish
            for node in bn.nodes:
                parents = bn.parents[node]
                card = bn.card(node)
                p_cards = tuple(bn.card(p) for p in parents)
                counts = np.ones(p_cards + (card,), np.float64)
                x = np.rint(np.asarray(data[node]).ravel()).astype(int)
                if parents:
                    pidx = tuple(
                        np.rint(np.asarray(data[p]).ravel()).astype(int)
                        for p in parents
                    )
                    np.add.at(counts, pidx + (x,), 1.0)
                else:
                    np.add.at(counts, (x,), 1.0)
                bn.cpts[node] = counts / counts.sum(axis=-1, keepdims=True)
            bn.nodes = bn.topological_order()
            self.bn = bn

        _, ms = self._timed(run)
        return ms

    def _fit_gaussian(self, data: Dict[str, np.ndarray]) -> float:
        """OLS per node -> GaussianBN; queries answered in closed form
        (the gaussian-class analogue of the MLE-CPT + VE oracle)."""
        from ..gaussian_bn import GaussianBN

        def run():
            bn = GaussianBN(name=self.domain.get("name", "fit"))
            for node, info in self.domain["nodes"].items():
                bn.nodes.append(node)
                parents = list(info["parents"])
                bn.parents[node] = parents
                y = np.asarray(data[node], np.float64).ravel()
                if parents:
                    X = np.column_stack(
                        [np.asarray(data[p], np.float64).ravel() for p in parents]
                    )
                    A = np.column_stack([X, np.ones_like(y)])
                    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
                    resid = y - A @ coef
                    bn.weights[node] = [float(w) for w in coef[:-1]]
                    bn.bias[node] = float(coef[-1])
                else:
                    resid = y - y.mean()
                    bn.weights[node] = []
                    bn.bias[node] = float(y.mean())
                bn.sigma[node] = float(max(resid.std(), 1e-6))
            self.gbn = bn

        _, ms = self._timed(run)
        return ms

    def _fit_clg(self, data: Dict[str, np.ndarray]) -> float:
        """MLE CLG fit: Laplace-smoothed CPTs for discrete nodes, per-regime
        OLS for continuous ones; queries answered by exact mixture
        enumeration (clg_bn.py)."""
        from ..clg_bn import CLGaussianBN

        def run():
            info = self.domain["nodes"]
            bn = CLGaussianBN(name=self.domain.get("name", "fit"))
            for node, meta in info.items():
                bn.nodes.append(node)
                bn.parents[node] = list(meta["parents"])
                bn.types[node] = (
                    "discrete" if "n_classes" in meta else "continuous"
                )
                if "n_classes" in meta:
                    bn.cards[node] = int(meta["n_classes"])
            for node in bn.nodes:
                if bn.types[node] == "discrete":
                    card = bn.cards[node]
                    p_cards = tuple(bn.cards[p] for p in bn.parents[node])
                    counts = np.ones(p_cards + (card,), np.float64)
                    x = np.rint(np.asarray(data[node]).ravel()).astype(int)
                    if bn.parents[node]:
                        pidx = tuple(
                            np.rint(np.asarray(data[p]).ravel()).astype(int)
                            for p in bn.parents[node]
                        )
                        np.add.at(counts, pidx + (x,), 1.0)
                    else:
                        np.add.at(counts, (x,), 1.0)
                    bn.cpts[node] = (
                        counts / counts.sum(axis=-1, keepdims=True)
                    ).tolist()
                else:
                    dps = bn.disc_parents(node)
                    cps = bn.cont_parents(node)
                    r_tot = int(
                        np.prod([bn.cards[p] for p in dps], dtype=int)
                    )
                    reg = np.zeros(
                        np.asarray(data[node]).ravel().shape[0], dtype=int
                    )
                    for p in dps:
                        reg = reg * bn.cards[p] + np.rint(
                            np.asarray(data[p]).ravel()
                        ).astype(int)
                    y_all = np.asarray(data[node], np.float64).ravel()
                    bias, weights, sigma = [], [], []
                    for r in range(r_tot):
                        sel = reg == r
                        y = y_all[sel]
                        if y.size < max(3, len(cps) + 2):
                            bias.append(float(y_all.mean()))
                            weights.append([0.0] * len(cps))
                            sigma.append(float(max(y_all.std(), 1e-6)))
                            continue
                        if cps:
                            X = np.column_stack(
                                [
                                    np.asarray(data[p], np.float64).ravel()[sel]
                                    for p in cps
                                ]
                            )
                            A = np.column_stack([X, np.ones_like(y)])
                            coef, *_ = np.linalg.lstsq(A, y, rcond=None)
                            resid = y - A @ coef
                            weights.append([float(w) for w in coef[:-1]])
                            bias.append(float(coef[-1]))
                        else:
                            resid = y - y.mean()
                            weights.append([])
                            bias.append(float(y.mean()))
                        sigma.append(float(max(resid.std(), 1e-6)))
                    bn.bias[node] = bias
                    bn.weights[node] = weights
                    bn.sigma[node] = sigma
            self.clg = bn

        _, ms = self._timed(run)
        return ms

    def answer_cpd_query(self, query) -> Dict:
        if self.gbn is not None or (
            self.clg is not None and self.clg.types[query.node] == "continuous"
        ):
            def run_cont():
                net = self.gbn if self.gbn is not None else self.clg
                if self.gbn is not None:
                    mean = net.bias[query.node] + sum(
                        w * float(query.parent_assignment[p])
                        for w, p in zip(
                            net.weights[query.node], net.parents[query.node]
                        )
                    )
                    return float(mean), float(net.sigma[query.node])
                r = net.regime_index(query.node, query.parent_assignment)
                mean = float(net.bias[query.node][r]) + sum(
                    float(w) * float(query.parent_assignment[p])
                    for w, p in zip(
                        net.weights[query.node][r],
                        net.cont_parents(query.node),
                    )
                )
                return mean, float(net.sigma[query.node][r])

            (mean, std), ms = self._timed(run_cont)
            return {"ok": True, "mean": mean, "std": std, "timing_ms": ms}
        if self.clg is not None:  # discrete CLG node
            def run_clg():
                cpt = np.asarray(self.clg.cpts[query.node])
                idx = tuple(
                    int(query.parent_assignment[p])
                    for p in self.clg.parents[query.node]
                )
                return cpt[idx]

            probs, ms = self._timed(run_clg)
            return {
                "ok": True,
                "probs": [float(p) for p in probs],
                "timing_ms": ms,
            }

        def run():
            cpt = self.bn.cpts[query.node]
            idx = tuple(
                query.parent_assignment[p] for p in self.bn.parents[query.node]
            )
            return cpt[idx]

        probs, ms = self._timed(run)
        return {"ok": True, "probs": [float(p) for p in probs], "timing_ms": ms}

    def answer_inference_queries(self, queries: List) -> List[Dict]:
        if getattr(self, "clg", None) is not None:
            out = []
            for q in queries:
                try:
                    rec, ms = self._timed(
                        self.clg.posterior,
                        q.target,
                        {k: float(v) for k, v in (q.evidence or {}).items()},
                        {k: float(v) for k, v in (q.do or {}).items()},
                    )
                    rec = dict(rec)
                    rec.update({"ok": True, "timing_ms": ms})
                    out.append(rec)
                except Exception as exc:
                    from ..errors import failure_record

                    out.append(failure_record(exc, context={"timing_ms": None}))
            return out
        if getattr(self, "gbn", None) is not None:
            out = []
            for q in queries:
                try:
                    (mean, std), ms = self._timed(
                        self.gbn.conditional,
                        q.target,
                        {k: float(v) for k, v in (q.evidence or {}).items()},
                        {k: float(v) for k, v in (q.do or {}).items()},
                    )
                    out.append(
                        {"ok": True, "mean": mean, "std": std, "timing_ms": ms}
                    )
                except Exception as exc:
                    from ..errors import failure_record

                    out.append(failure_record(exc, context={"timing_ms": None}))
            return out
        # One min-fill elimination order per network (computed on first
        # use, amortized across every query) — the same triangulation the
        # GT stage uses; the per-query greedy search is O(n^3) at link
        # scale. Order computation is OUTSIDE the per-query timing, like
        # pgmpy's cached elimination orders in the reference backend.
        if getattr(self, "_elim_order", None) is None:
            from ..exact import min_fill_order

            self._elim_order = min_fill_order(self.bn)
        out = []
        for q in queries:
            try:
                probs, ms = self._timed(
                    exact_posterior,
                    self.bn,
                    q.target,
                    q.evidence or None,
                    elim_order=self._elim_order,
                )
                out.append(
                    {
                        "ok": True,
                        "probs": [float(p) for p in probs],
                        "timing_ms": ms,
                    }
                )
            except Exception as exc:
                from ..errors import failure_record

                out.append(failure_record(exc, context={"timing_ms": None}))
        return out
