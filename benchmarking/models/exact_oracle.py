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

    def fit(self, data: Dict[str, np.ndarray]) -> float:
        if self.domain.get("class") == "gaussian":
            return self._fit_gaussian(data)

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

    def answer_cpd_query(self, query) -> Dict:
        def run():
            cpt = self.bn.cpts[query.node]
            idx = tuple(
                query.parent_assignment[p] for p in self.bn.parents[query.node]
            )
            return cpt[idx]

        probs, ms = self._timed(run)
        return {"ok": True, "probs": [float(p) for p in probs], "timing_ms": ms}

    def answer_inference_queries(self, queries: List) -> List[Dict]:
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
        out = []
        for q in queries:
            try:
                probs, ms = self._timed(
                    exact_posterior, self.bn, q.target, q.evidence or None
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
