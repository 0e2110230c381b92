"""Conditional linear-Gaussian (CLG) benchmark networks.

The reference suite's third network class (``metadata/bnlearn.json``
*clgaussian*): discrete nodes carry CPTs over discrete parents only;
continuous nodes are linear-Gaussian in their continuous parents with all
coefficients switched by the joint configuration of their discrete
parents (the standard CLG restriction — no discrete node has a
continuous parent).

Exact ground truth enumerates the joint discrete configuration space
(bounded for benchmark-sized nets): for each configuration the
continuous subnetwork is linear-Gaussian with closed-form moments, so
 - a continuous target's posterior is a Gaussian mixture over
   configurations weighted by ``p(config, discrete evidence) *
   N(continuous evidence | config)`` — reported moment-matched;
 - a discrete target's posterior is the same weight vector summed by
   target state.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class CLGaussianBN:
    name: str
    nodes: List[str] = field(default_factory=list)  # topo order
    types: Dict[str, str] = field(default_factory=dict)  # discrete|continuous
    parents: Dict[str, List[str]] = field(default_factory=dict)
    cards: Dict[str, int] = field(default_factory=dict)  # discrete only
    # discrete node -> CPT [card(p1), ..., card(pm), card(node)] (list form)
    cpts: Dict[str, list] = field(default_factory=dict)
    # continuous node -> per-regime params; regime = mixed-radix index over
    # its DISCRETE parents (in parents order), weights over its CONTINUOUS
    # parents (in parents order)
    bias: Dict[str, list] = field(default_factory=dict)     # [R]
    weights: Dict[str, list] = field(default_factory=dict)  # [R][m_cont]
    sigma: Dict[str, list] = field(default_factory=dict)    # [R]

    kind = "clgaussian"

    def edges(self) -> List[Tuple[str, str]]:
        return [(p, c) for c in self.nodes for p in self.parents[c]]

    def topological_order(self) -> List[str]:
        return list(self.nodes)

    def card(self, node: str) -> int:
        return int(self.cards[node])

    def disc_parents(self, node: str) -> List[str]:
        return [p for p in self.parents[node] if self.types[p] == "discrete"]

    def cont_parents(self, node: str) -> List[str]:
        return [p for p in self.parents[node] if self.types[p] == "continuous"]

    def regime_index(self, node: str, assign: Dict[str, int]) -> int:
        r = 0
        for p in self.disc_parents(node):
            r = r * self.cards[p] + int(assign[p])
        return r

    # -- serialization -------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "CLGaussianBN":
        d = json.loads(text)
        return cls(**d)

    # -- exact inference -----------------------------------------------------
    def _discrete_nodes(self) -> List[str]:
        return [v for v in self.nodes if self.types[v] == "discrete"]

    def _config_weight(self, assign: Dict[str, int],
                       do: Dict[str, float]) -> float:
        """p(discrete config) under the (possibly mutilated) discrete part."""
        w = 1.0
        for v in self._discrete_nodes():
            if v in do:
                if int(assign[v]) != int(do[v]):
                    return 0.0
                continue  # do(): factor dropped
            cpt = np.asarray(self.cpts[v])
            idx = tuple(int(assign[p]) for p in self.parents[v])
            w *= float(cpt[idx + (int(assign[v]),)])
        return w

    def _cont_system(self, assign: Dict[str, int], do: Dict[str, float]):
        """(names, mu, Sigma) of the continuous subnet for one config."""
        cont = [v for v in self.nodes if self.types[v] == "continuous"]
        idx = {v: i for i, v in enumerate(cont)}
        n = len(cont)
        B = np.zeros((n, n))
        c = np.zeros(n)
        d = np.zeros(n)
        for v in cont:
            i = idx[v]
            if v in do:
                c[i] = float(do[v])
                continue
            r = self.regime_index(v, assign)
            c[i] = float(self.bias[v][r])
            d[i] = float(self.sigma[v][r]) ** 2
            for w, p in zip(self.weights[v][r], self.cont_parents(v)):
                B[i, idx[p]] = float(w)
        A = np.linalg.inv(np.eye(n) - B)
        return cont, A @ c, A @ np.diag(d) @ A.T

    def posterior(
        self,
        target: str,
        evidence: Optional[Dict[str, float]] = None,
        do: Optional[Dict[str, float]] = None,
    ) -> Dict:
        """Exact posterior: {'probs': [...]} (discrete target) or
        {'mean': m, 'std': s} (continuous target, moment-matched mixture)."""
        evidence = {k: v for k, v in (evidence or {}).items() if k != target}
        do = dict(do or {})
        disc = self._discrete_nodes()
        disc_ev = {k: int(v) for k, v in evidence.items() if k in self.cards}
        cont_ev = {k: float(v) for k, v in evidence.items()
                   if k not in self.cards}
        t_disc = self.types[target] == "discrete"

        weights, stats = [], []
        for combo in itertools.product(*[range(self.cards[v]) for v in disc]):
            assign = dict(zip(disc, combo))
            if any(assign[k] != v for k, v in disc_ev.items()):
                continue
            w = self._config_weight(assign, do)
            if w <= 0.0:
                continue
            cont, mu, cov = self._cont_system(assign, do)
            cidx = {v: i for i, v in enumerate(cont)}
            e = [cidx[k] for k in cont_ev]
            if e:
                v = np.array([cont_ev[k] for k in cont_ev])
                see = cov[np.ix_(e, e)] + 1e-9 * np.eye(len(e))
                resid = v - mu[e]
                sign, logdet = np.linalg.slogdet(see)
                quad = resid @ np.linalg.solve(see, resid)
                loglik = -0.5 * (
                    logdet + quad + len(e) * np.log(2 * np.pi)
                )
                w *= float(np.exp(loglik))
            if t_disc:
                stats.append(int(assign[target]))
            else:
                ti = cidx[target]
                if target in do:
                    m, s2 = float(do[target]), 0.0
                elif e:
                    ste = cov[ti, e]
                    m = float(mu[ti] + ste @ np.linalg.solve(see, resid))
                    s2 = float(
                        cov[ti, ti] - ste @ np.linalg.solve(see, ste)
                    )
                else:
                    m, s2 = float(mu[ti]), float(cov[ti, ti])
                stats.append((m, max(s2, 0.0)))
            weights.append(w)

        wsum = float(np.sum(weights))
        if wsum <= 0:
            raise ValueError("Evidence has zero probability under the model.")
        w = np.asarray(weights) / wsum
        if t_disc:
            probs = np.zeros(self.cards[target])
            for wi, s in zip(w, stats):
                probs[s] += wi
            return {"probs": [float(p) for p in probs]}
        means = np.array([m for m, _ in stats])
        var2 = np.array([s2 for _, s2 in stats])
        mean = float(np.sum(w * means))
        var = float(np.sum(w * (var2 + means**2)) - mean**2)
        return {"mean": mean, "std": float(np.sqrt(max(var, 1e-12)))}

    # -- sampling ------------------------------------------------------------
    def sample(self, n_rows: int, seed: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(seed)
        out: Dict[str, np.ndarray] = {}
        for v in self.nodes:
            if self.types[v] == "discrete":
                cpt = np.asarray(self.cpts[v])
                if self.parents[v]:
                    rows = np.stack(
                        [out[p].astype(int) for p in self.parents[v]], axis=1
                    )
                    probs = cpt[tuple(rows[:, j] for j in range(rows.shape[1]))]
                else:
                    probs = np.broadcast_to(cpt, (n_rows, cpt.shape[-1]))
                u = rng.random((n_rows, 1))
                out[v] = (u > np.cumsum(probs, axis=1)).sum(axis=1).astype(
                    np.float64
                )
            else:
                dps = self.disc_parents(v)
                r = np.zeros(n_rows, dtype=int)
                for p in dps:
                    r = r * self.cards[p] + out[p].astype(int)
                b = np.asarray(self.bias[v])[r]
                s = np.asarray(self.sigma[v])[r]
                loc = b.astype(np.float64)
                W = np.asarray(self.weights[v])  # [R, m_cont]
                for j, p in enumerate(self.cont_parents(v)):
                    loc = loc + W[r, j] * out[p]
                out[v] = loc + s * rng.standard_normal(n_rows)
        return out


def random_clgaussian(
    n_nodes: int, seed: int = 0, frac_discrete: float = 0.5
) -> CLGaussianBN:
    """Seeded random CLG net honoring the no-continuous-parent-of-discrete
    restriction: discrete nodes come first and only see discrete parents."""
    rng = np.random.default_rng(seed)
    bn = CLGaussianBN(name=f"clg{n_nodes}_s{seed}")
    n_disc = max(1, int(round(frac_discrete * n_nodes)))
    names = [f"x{i}" for i in range(n_nodes)]
    for i, v in enumerate(names):
        bn.nodes.append(v)
        bn.types[v] = "discrete" if i < n_disc else "continuous"
    for i, v in enumerate(names):
        if bn.types[v] == "discrete":
            k = int(rng.integers(2, 4))
            bn.cards[v] = k
            pool = [p for p in names[:i] if bn.types[p] == "discrete"]
            m = int(rng.integers(0, min(len(pool), 2) + 1))
            ps = list(rng.choice(pool, size=m, replace=False)) if m else []
            bn.parents[v] = ps
            shape = tuple(bn.cards[p] for p in ps) + (k,)
            raw = rng.dirichlet(np.ones(k), size=int(np.prod(shape[:-1], dtype=int)) or 1)
            bn.cpts[v] = raw.reshape(shape).tolist()
        else:
            pool = names[:i]
            m = int(rng.integers(0, min(len(pool), 3) + 1))
            ps = list(rng.choice(pool, size=m, replace=False)) if m else []
            bn.parents[v] = ps
            n_regimes = int(
                np.prod([bn.cards[p] for p in ps if bn.types[p] == "discrete"],
                        dtype=int)
            )
            m_cont = sum(1 for p in ps if bn.types[p] == "continuous")
            bn.bias[v] = [float(x) for x in rng.normal(0, 1.0, n_regimes)]
            bn.weights[v] = [
                [float(x) for x in rng.uniform(-1.0, 1.0, m_cont)]
                for _ in range(n_regimes)
            ]
            bn.sigma[v] = [float(x) for x in rng.uniform(0.3, 1.0, n_regimes)]
    return bn


def clg_domain_schema(bn: CLGaussianBN) -> Dict:
    nodes = {}
    for v in bn.nodes:
        if bn.types[v] == "discrete":
            nodes[v] = {
                "type": "discrete",
                "n_classes": bn.cards[v],
                "states": [str(s) for s in range(bn.cards[v])],
                "parents": bn.parents[v],
            }
        else:
            nodes[v] = {"type": "continuous", "parents": bn.parents[v]}
    return {
        "name": bn.name,
        "class": "clgaussian",
        "nodes": nodes,
        "edges": [list(e) for e in bn.edges()],
    }


def clg_ground_truth(bn: CLGaussianBN, queries) -> List[Dict]:
    out = []
    for q in queries:
        rec: Dict = {"query_id": q.query_id, "target": q.target}
        try:
            rec.update(bn.posterior(
                q.target,
                {k: float(v) for k, v in (q.evidence or {}).items()},
                {k: float(v) for k, v in (q.do or {}).items()},
            ))
            rec["ok"] = True
        except Exception as exc:
            rec.update({"ok": False, "error": str(exc)})
        out.append(rec)
    return out


def generate_clg_inference_queries(
    bn: CLGaussianBN,
    n_queries: int = 64,
    seed: int = 0,
    evidence_modes: Tuple[str, ...] = ("empty", "on_manifold", "off_manifold"),
    max_evidence: int = 3,
):
    from .query_gen import InferenceQuery, _ancestors, _descendants

    rng = np.random.default_rng(seed)
    manifold = bn.sample(max(2 * n_queries, 256), seed=seed + 1)
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
            row = int(rng.integers(0, len(manifold[ev_nodes[0]])))
            evidence = {}
            for v in ev_nodes:
                if bn.types[v] == "discrete":
                    evidence[v] = (
                        int(manifold[v][row])
                        if mode == "on_manifold"
                        else int(rng.integers(0, bn.cards[v]))
                    )
                else:
                    evidence[v] = (
                        round(float(manifold[v][row]), 4)
                        if mode == "on_manifold"
                        else round(
                            float(np.mean(manifold[v])
                                  + rng.choice([-1.0, 1.0])
                                  * rng.uniform(2.0, 4.0)
                                  * (np.std(manifold[v]) + 1e-6)),
                            4,
                        )
                    )
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


def generate_clg_cpd_queries(bn: CLGaussianBN, n_queries: int = 64,
                             seed: int = 0):
    """CPD-mode queries: node + full parent assignment (mixed types)."""
    from .query_gen import CPDQuery

    rng = np.random.default_rng(seed)
    manifold = bn.sample(max(n_queries, 128), seed=seed + 1)
    out = []
    for qid in range(n_queries):
        node = bn.nodes[int(rng.integers(0, len(bn.nodes)))]
        row = int(rng.integers(0, len(manifold[node])))
        assign = {}
        for p in bn.parents[node]:
            if bn.types[p] == "discrete":
                assign[p] = int(manifold[p][row])
            else:
                assign[p] = round(float(manifold[p][row]), 4)
        out.append(
            CPDQuery(
                query_id=f"c{qid:05d}", node=node, parent_assignment=assign
            )
        )
    return out


def clg_cpd_ground_truth(bn: CLGaussianBN, queries) -> List[Dict]:
    out = []
    for q in queries:
        rec: Dict = {"query_id": q.query_id, "node": q.node, "ok": True}
        if bn.types[q.node] == "discrete":
            cpt = np.asarray(bn.cpts[q.node])
            idx = tuple(int(q.parent_assignment[p]) for p in bn.parents[q.node])
            rec["probs"] = [float(v) for v in cpt[idx]]
        else:
            r = bn.regime_index(q.node, q.parent_assignment)
            mean = float(bn.bias[q.node][r]) + sum(
                float(w) * float(q.parent_assignment[p])
                for w, p in zip(bn.weights[q.node][r], bn.cont_parents(q.node))
            )
            rec["mean"] = mean
            rec["std"] = float(bn.sigma[q.node][r])
        out.append(rec)
    return out
