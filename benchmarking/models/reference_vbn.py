"""Optional backend wrapping the torch reference implementation.

Enables like-for-like accuracy/latency comparison on identical query sets
(SURVEY.md §6: baselines must be measured, not transcribed). Gated on the
reference checkout + torch being importable; registered always, raises a
clear error at construction when unavailable.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

import numpy as np

from .base import BaseBenchmarkModel
from .registry import register_model

_REF_PATH = "/root/reference"


def _load_reference():
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    from vbn import VBN, defaults  # noqa: F401  (reference package)

    return VBN, defaults


@register_model("reference_vbn")
class ReferenceVBNModel(BaseBenchmarkModel):
    def __init__(self, domain: Dict, seed: int = 0, config: Optional[Dict] = None):
        super().__init__(domain, seed, config)
        try:
            self._VBN, self._defaults = _load_reference()
        except Exception as exc:  # torch / checkout missing
            raise RuntimeError(
                f"reference VBN backend unavailable: {exc}"
            ) from exc
        self.vbn = None

    def fit(self, data: Dict[str, np.ndarray]) -> float:
        import networkx as nx
        import pandas as pd

        g = nx.DiGraph()
        g.add_nodes_from(self.domain["nodes"])
        g.add_edges_from([tuple(e) for e in self.domain["edges"]])
        self.vbn = self._VBN(g, seed=self.seed, device="cpu")
        cpd_cfg = dict(self.config.get("cpd") or {})
        cpd_name = cpd_cfg.pop("name", "linear_gaussian")
        cpd_fit = cpd_cfg.pop("fit", None)
        nodes_cpds = {}
        for node, info in self.domain["nodes"].items():
            if "n_classes" not in info:  # continuous node
                conf = self._defaults.cpd(cpd_name)
                # forward init kwargs (e.g. kde max_points) and fit
                # overrides so parity rows run the reference CPD at the
                # same hyperparameters as the TPU backend's preset
                conf.update(cpd_cfg)
                if cpd_fit:
                    conf.setdefault("fit", {}).update(cpd_fit)
            else:
                conf = self._defaults.cpd("categorical_table")
                conf["n_classes"] = int(info["n_classes"])
                parent_cards = [
                    int(self.domain["nodes"][p]["n_classes"])
                    for p in info["parents"]
                    if "n_classes" in self.domain["nodes"][p]
                ]
                if parent_cards:
                    conf["parent_n_classes"] = parent_cards
            nodes_cpds[node] = conf
        self.vbn.set_learning_method("node_wise", nodes_cpds=nodes_cpds)
        df = pd.DataFrame({k: np.asarray(v).ravel() for k, v in data.items()})
        _, ms = self._timed(self.vbn.fit, df)
        inf_conf = dict(
            self.config.get("inference")
            or {"name": "likelihood_weighting", "n_samples": 2048}
        )
        name = inf_conf.pop("name")
        self.vbn.set_inference_method(name, **inf_conf)
        return ms

    def answer_cpd_query(self, query) -> Dict:
        import torch

        node = query.node
        parents = self.domain["nodes"][node]["parents"]

        def run():
            if parents:
                row = torch.tensor(
                    [[float(query.parent_assignment[p]) for p in parents]]
                )
            else:
                row = None
            cond = self.vbn.get_cpd(node).conditional(row)
            if "probs" in cond:
                return {"probs": np.asarray(cond["probs"].detach()).reshape(-1)}
            ms = self.vbn.get_cpd(node).conditional_mean_std(row)
            return {
                "mean": float(np.asarray(ms["mean"]).ravel()[0]),
                "std": float(np.asarray(ms["std"]).ravel()[0]),
            }

        try:
            res, ms = self._timed(run)
            if "probs" in res:
                return {
                    "ok": True,
                    "probs": [float(p) for p in res["probs"]],
                    "timing_ms": ms,
                }
            return {"ok": True, "timing_ms": ms, **res}
        except Exception as exc:
            from ..errors import failure_record

            return failure_record(exc, context={"timing_ms": None})

    def answer_inference_queries(self, queries: List) -> List[Dict]:
        import torch

        q0 = queries[0]
        target = q0.target
        ev_keys = sorted(q0.evidence)
        if "n_classes" not in self.domain["nodes"][target]:
            return self._answer_continuous(queries, target, ev_keys)
        k = int(self.domain["nodes"][target]["n_classes"])

        def run():
            evidence = {
                key: torch.tensor(
                    [[float(q.evidence[key])] for q in queries]
                )
                for key in ev_keys
            }
            pdf, samples = self.vbn.infer_posterior(
                {"target": target, "evidence": evidence}
            )
            pdf = np.asarray(pdf.detach())
            samples = np.asarray(samples.detach())
            b = pdf.shape[0]
            out = np.zeros((b, k), np.float64)
            idx = np.clip(np.rint(samples[..., 0]).astype(int), 0, k - 1)
            w = np.maximum(np.nan_to_num(pdf), 0.0)
            for i in range(b):
                out[i] = np.bincount(idx[i], weights=w[i], minlength=k)
            sums = out.sum(axis=1, keepdims=True)
            return np.where(
                sums > 0, out / np.maximum(sums, 1e-12), np.full((1, k), 1.0 / k)
            )

        try:
            pmf, ms = self._timed(run)
            if pmf.shape[0] == 1 and len(queries) > 1:
                # empty-evidence skeleton: B=1 posterior shared by the batch
                pmf = np.repeat(pmf, len(queries), axis=0)
            per = ms / len(queries)
            return [
                {"ok": True, "probs": [float(p) for p in pmf[i]], "timing_ms": per}
                for i in range(len(queries))
            ]
        except Exception as exc:
            from ..errors import failure_record

            rec = failure_record(exc, context={"timing_ms": None})
            return [dict(rec) for _ in queries]

    def _answer_continuous(
        self, queries: List, target: str, ev_keys: List[str]
    ) -> List[Dict]:
        """Weighted-particle (mean, std) through the reference API."""
        import torch

        def run():
            evidence = {
                key: torch.tensor(
                    [[float(q.evidence[key])] for q in queries]
                )
                for key in ev_keys
            }
            pdf, samples = self.vbn.infer_posterior(
                {"target": target, "evidence": evidence}
            )
            w = np.maximum(np.nan_to_num(np.asarray(pdf.detach())), 0.0)
            x = np.asarray(samples.detach())[..., 0]
            denom = w.sum(axis=1, keepdims=True)
            w = np.where(
                denom > 1e-12, w / np.maximum(denom, 1e-12), 1.0 / w.shape[1]
            )
            mean = (w * x).sum(axis=1)
            var = (w * (x - mean[:, None]) ** 2).sum(axis=1)
            return np.stack([mean, np.sqrt(np.maximum(var, 0.0))], axis=1)

        try:
            mom, ms = self._timed(run)
            if mom.shape[0] == 1 and len(queries) > 1:
                mom = np.repeat(mom, len(queries), axis=0)
            per = ms / len(queries)
            return [
                {
                    "ok": True,
                    "mean": float(mom[i][0]),
                    "std": float(mom[i][1]),
                    "timing_ms": per,
                }
                for i in range(len(queries))
            ]
        except Exception as exc:
            from ..errors import failure_record

            rec = failure_record(exc, context={"timing_ms": None})
            return [dict(rec) for _ in queries]
