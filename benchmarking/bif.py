"""BIF (Bayesian Interchange Format) parsing and the DiscreteBN model.

Capability parity with the reference's BIF structure/CPT parsing
(``benchmarking/III_data_generation/bnlearn.py:425-640``,
``benchmarking/utils.py:304``): parse ``network``/``variable``/
``probability`` blocks into a structured discrete Bayesian network with
dense CPT arrays, the substrate for exact ground truth and data generation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np


@dataclass
class DiscreteBN:
    """Discrete BN: nodes with state lists and dense CPTs.

    ``cpts[node]`` has shape ``parent_cards + (card,)`` with parents in
    ``parents[node]`` order; rows sum to 1.
    """

    name: str
    nodes: List[str] = field(default_factory=list)
    states: Dict[str, List[str]] = field(default_factory=dict)
    parents: Dict[str, List[str]] = field(default_factory=dict)
    cpts: Dict[str, np.ndarray] = field(default_factory=dict)

    def card(self, node: str) -> int:
        return len(self.states[node])

    def edges(self) -> List[Tuple[str, str]]:
        return [
            (p, c) for c in self.nodes for p in self.parents.get(c, [])
        ]

    def topological_order(self) -> List[str]:
        order: List[str] = []
        seen = set()

        def visit(n):
            if n in seen:
                return
            for p in self.parents.get(n, []):
                visit(p)
            seen.add(n)
            order.append(n)

        for n in self.nodes:
            visit(n)
        return order

    def validate(self) -> None:
        for node in self.nodes:
            cpt = self.cpts[node]
            expect = tuple(self.card(p) for p in self.parents[node]) + (
                self.card(node),
            )
            if cpt.shape != expect:
                raise ValueError(
                    f"CPT shape mismatch for {node}: {cpt.shape} != {expect}"
                )
            sums = cpt.sum(axis=-1)
            if not np.allclose(sums, 1.0, atol=1e-3):
                raise ValueError(f"CPT rows for {node} do not sum to 1")

    def state_index(self, node: str, state: str) -> int:
        return self.states[node].index(state)


_VARIABLE_RE = re.compile(
    r"variable\s+(\S+)\s*\{[^}]*?type\s+discrete\s*\[\s*\d+\s*\]\s*"
    r"\{([^}]*)\}\s*;[^}]*\}",
    re.S,
)
_PROB_RE = re.compile(
    r"probability\s*\(\s*(\S+?)\s*(?:\|\s*([^)]*?))?\s*\)\s*\{(.*?)\}",
    re.S,
)
_NETWORK_RE = re.compile(r"network\s+(\S+)")


def parse_bif(text: str) -> DiscreteBN:
    m = _NETWORK_RE.search(text)
    bn = DiscreteBN(name=m.group(1) if m else "network")

    for match in _VARIABLE_RE.finditer(text):
        node = match.group(1)
        states = [s.strip() for s in match.group(2).split(",") if s.strip()]
        bn.nodes.append(node)
        bn.states[node] = states
        bn.parents[node] = []

    for match in _PROB_RE.finditer(text):
        node = match.group(1)
        parent_str = match.group(2)
        body = match.group(3)
        parents = (
            [p.strip() for p in parent_str.split(",") if p.strip()]
            if parent_str
            else []
        )
        bn.parents[node] = parents
        card = bn.card(node)
        p_cards = [bn.card(p) for p in parents]
        cpt = np.zeros(tuple(p_cards) + (card,), np.float64)
        if not parents:
            tm = re.search(r"table\s+([^;]+);", body)
            if tm is None:
                raise ValueError(f"No table for root node {node}")
            vals = [float(v) for v in tm.group(1).replace(",", " ").split()]
            cpt[:] = np.asarray(vals)
        else:
            for row in re.finditer(r"\(([^)]*)\)\s*([^;]+);", body):
                cond = [s.strip() for s in row.group(1).split(",")]
                vals = [
                    float(v) for v in row.group(2).replace(",", " ").split()
                ]
                idx = tuple(
                    bn.state_index(p, c) for p, c in zip(parents, cond)
                )
                cpt[idx] = np.asarray(vals)
        bn.cpts[node] = cpt

    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def load_bif(path: str) -> DiscreteBN:
    import gzip

    if path.endswith(".gz"):
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return parse_bif(f.read())
    with open(path, "r", encoding="utf-8") as f:
        return parse_bif(f.read())


def to_bif(bn: DiscreteBN) -> str:
    """Serialize a DiscreteBN back to BIF text."""
    out = [f"network {bn.name} {{\n}}"]
    for node in bn.nodes:
        states = ", ".join(bn.states[node])
        out.append(
            f"variable {node} {{\n  type discrete [ {bn.card(node)} ] "
            f"{{ {states} }};\n}}"
        )
    for node in bn.nodes:
        parents = bn.parents[node]
        cpt = bn.cpts[node]
        if not parents:
            vals = ", ".join(f"{v:.6g}" for v in cpt)
            out.append(
                f"probability ( {node} ) {{\n  table {vals};\n}}"
            )
        else:
            head = ", ".join(parents)
            lines = [f"probability ( {node} | {head} ) {{"]
            for idx in np.ndindex(*cpt.shape[:-1]):
                cond = ", ".join(
                    bn.states[p][i] for p, i in zip(parents, idx)
                )
                vals = ", ".join(f"{v:.6g}" for v in cpt[idx])
                lines.append(f"  ({cond}) {vals};")
            lines.append("}")
            out.append("\n".join(lines))
    return "\n".join(out) + "\n"
