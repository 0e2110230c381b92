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

    def fit(self, data: Dict[str, np.ndarray]) -> float:
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
