"""Linear-Gaussian benchmark networks: generation, exact posteriors, IO.

The continuous analogue of ``bif.py``'s ``DiscreteBN``, covering the
reference suite's *gaussian* network class
(``/root/reference/benchmarking/metadata/bnlearn.json``; stage-III
gaussian path ``III_data_generation/bnlearn.py:425-640``). Each node is
``x_i = b_i + sum_j W_ij x_j + eps_i`` with ``eps_i ~ N(0, sigma_i^2)``,
so the joint is Gaussian with closed-form moments — ground truth for any
``p(target | evidence, do(...))`` is an exact Gaussian, no sampling.

Zero-egress note: the reference downloads gaussian nets as R ``bn.fit``
RDS files; here networks are seeded random generators serialized as JSON.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class GaussianBN:
    name: str
    nodes: List[str] = field(default_factory=list)  # topo order
    parents: Dict[str, List[str]] = field(default_factory=dict)
    weights: Dict[str, List[float]] = field(default_factory=dict)
    bias: Dict[str, float] = field(default_factory=dict)
    sigma: Dict[str, float] = field(default_factory=dict)

    kind = "gaussian"

    def edges(self) -> List[Tuple[str, str]]:
        return [(p, c) for c in self.nodes for p in self.parents[c]]

    def topological_order(self) -> List[str]:
        return list(self.nodes)

    # -- serialization -------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "GaussianBN":
        return cls(**json.loads(text))

    # -- exact joint ---------------------------------------------------------
    def _system(self, do: Optional[Dict[str, float]] = None):
        """(mu [n], Sigma [n, n]) of the (possibly mutilated) joint."""
        n = len(self.nodes)
        idx = {v: i for i, v in enumerate(self.nodes)}
        B = np.zeros((n, n))
        c = np.zeros(n)
        d = np.zeros(n)
        do = do or {}
        for v in self.nodes:
            i = idx[v]
            if v in do:  # graph surgery: constant node
                c[i] = float(do[v])
                d[i] = 0.0
                continue
            c[i] = self.bias[v]
            d[i] = self.sigma[v] ** 2
            for w, p in zip(self.weights[v], self.parents[v]):
                B[i, idx[p]] = w
        A = np.linalg.inv(np.eye(n) - B)  # lower-triangular system
        mu = A @ c
        cov = A @ np.diag(d) @ A.T
        return mu, cov

    def conditional(
        self,
        target: str,
        evidence: Optional[Dict[str, float]] = None,
        do: Optional[Dict[str, float]] = None,
    ) -> Tuple[float, float]:
        """Exact posterior (mean, std) of a scalar target."""
        idx = {v: i for i, v in enumerate(self.nodes)}
        mu, cov = self._system(do)
        t = idx[target]
        ev = {k: v for k, v in (evidence or {}).items() if k != target}
        if not ev:
            return float(mu[t]), float(np.sqrt(max(cov[t, t], 0.0)))
        e = [idx[k] for k in ev]
        v = np.array([float(ev[k]) for k in ev])
        see = cov[np.ix_(e, e)] + 1e-10 * np.eye(len(e))
        ste = cov[t, e]
        sol = np.linalg.solve(see, v - mu[e])
        gain = np.linalg.solve(see, ste)
        mean = mu[t] + ste @ sol
        var = cov[t, t] - ste @ gain
        return float(mean), float(np.sqrt(max(var, 1e-12)))

    def marginal_std(self, node: str) -> float:
        mu, cov = self._system()
        i = self.nodes.index(node)
        return float(np.sqrt(max(cov[i, i], 1e-12)))

    # -- sampling ------------------------------------------------------------
    def sample(self, n_rows: int, seed: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(seed)
        out: Dict[str, np.ndarray] = {}
        for v in self.nodes:
            loc = np.full(n_rows, self.bias[v])
            for w, p in zip(self.weights[v], self.parents[v]):
                loc = loc + w * out[p]
            out[v] = loc + self.sigma[v] * rng.standard_normal(n_rows)
        return out


def random_gaussian(
    n_nodes: int, seed: int = 0, max_in_degree: int = 3
) -> GaussianBN:
    """Seeded random linear-Gaussian DAG (benchmark scaling axis)."""
    rng = np.random.default_rng(seed)
    bn = GaussianBN(name=f"gauss{n_nodes}_s{seed}")
    for i in range(n_nodes):
        v = f"x{i}"
        bn.nodes.append(v)
        k = int(rng.integers(0, min(i, max_in_degree) + 1))
        ps = (
            [f"x{j}" for j in rng.choice(i, size=k, replace=False)]
            if k
            else []
        )
        bn.parents[v] = ps
        signs = rng.choice([-1.0, 1.0], size=len(ps))
        bn.weights[v] = [
            float(s * u)
            for s, u in zip(signs, rng.uniform(0.3, 1.0, size=len(ps)))
        ]
        bn.bias[v] = float(rng.normal(0.0, 0.5))
        bn.sigma[v] = float(rng.uniform(0.3, 1.0))
    return bn


def gaussian_domain_schema(bn: GaussianBN) -> Dict:
    return {
        "name": bn.name,
        "class": "gaussian",
        "nodes": {
            v: {"type": "continuous", "parents": bn.parents[v]}
            for v in bn.nodes
        },
        "edges": [list(e) for e in bn.edges()],
    }


def gaussian_ground_truth(bn: GaussianBN, queries) -> List[Dict]:
    out = []
    for q in queries:
        rec: Dict = {"query_id": q.query_id, "target": q.target}
        try:
            mean, std = bn.conditional(
                q.target,
                {k: float(v) for k, v in (q.evidence or {}).items()},
                {k: float(v) for k, v in (q.do or {}).items()},
            )
            rec.update({"mean": mean, "std": std, "ok": True})
        except Exception as exc:
            rec.update({"ok": False, "error": str(exc)})
        out.append(rec)
    return out


def generate_gaussian_inference_queries(
    bn: GaussianBN,
    n_queries: int = 64,
    seed: int = 0,
    evidence_modes: Tuple[str, ...] = ("empty", "on_manifold", "off_manifold"),
    max_evidence: int = 3,
):
    """Same PAC-diverse scheme as the discrete generator, float evidence."""
    from .query_gen import InferenceQuery, _ancestors, _descendants

    rng = np.random.default_rng(seed)
    manifold = bn.sample(max(2 * n_queries, 256), seed=seed + 1)
    stds = {v: bn.marginal_std(v) for v in bn.nodes}
    mus, _ = bn._system()
    mu = dict(zip(bn.nodes, mus))
    targets = list(
        rng.choice(bn.nodes, size=min(len(bn.nodes), max(2, n_queries // 8)),
                   replace=False)
    )
    queries: List[InferenceQuery] = []
    qid = 0
    while len(queries) < n_queries:
        target = targets[qid % len(targets)]
        mode = evidence_modes[qid % len(evidence_modes)]
        task = "prediction" if qid % 2 == 0 else "diagnosis"
        pool = sorted(
            (_ancestors(bn, target) if task == "prediction"
             else _descendants(bn, target))
            or (set(bn.nodes) - {target})
        )
        if mode == "empty" or not pool:
            evidence: Dict[str, float] = {}
        else:
            k = int(rng.integers(1, min(max_evidence, len(pool)) + 1))
            ev_nodes = list(rng.choice(pool, size=k, replace=False))
            if mode == "on_manifold":
                row = int(rng.integers(0, len(manifold[ev_nodes[0]])))
                evidence = {
                    v: round(float(manifold[v][row]), 4) for v in ev_nodes
                }
            else:  # off-manifold: a few marginal sigmas out
                evidence = {
                    v: round(
                        float(
                            mu[v]
                            + rng.choice([-1.0, 1.0])
                            * rng.uniform(2.0, 4.0)
                            * stds[v]
                        ),
                        4,
                    )
                    for v in ev_nodes
                }
        queries.append(
            InferenceQuery(
                query_id=f"q{qid:05d}",
                target=target,
                evidence=evidence,
                skeleton_id=f"{target}|{','.join(sorted(evidence))}|{mode}",
                evidence_mode=mode,
                task=task,
            )
        )
        qid += 1
    return queries


def generate_gaussian_cpd_queries(bn: GaussianBN, n_queries: int = 64,
                                  seed: int = 0):
    """CPD-mode queries: node + on-manifold parent assignment (floats)."""
    from .query_gen import CPDQuery

    rng = np.random.default_rng(seed)
    manifold = bn.sample(max(n_queries, 128), seed=seed + 1)
    out = []
    for qid in range(n_queries):
        node = bn.nodes[int(rng.integers(0, len(bn.nodes)))]
        row = int(rng.integers(0, len(manifold[node])))
        out.append(
            CPDQuery(
                query_id=f"c{qid:05d}",
                node=node,
                parent_assignment={
                    p: round(float(manifold[p][row]), 4)
                    for p in bn.parents[node]
                },
            )
        )
    return out


def gaussian_cpd_ground_truth(bn: GaussianBN, queries) -> List[Dict]:
    out = []
    for q in queries:
        mean = bn.bias[q.node] + sum(
            w * float(q.parent_assignment[p])
            for w, p in zip(bn.weights[q.node], bn.parents[q.node])
        )
        out.append(
            {
                "query_id": q.query_id,
                "node": q.node,
                "mean": float(mean),
                "std": float(bn.sigma[q.node]),
                "ok": True,
            }
        )
    return out
