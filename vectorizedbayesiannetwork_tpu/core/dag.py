"""Static DAG with host-side structural precomputation.

Capability parity with the reference's ``vbn/core/dags.py:23-45`` (StaticDAG
over networkx with cached topo order / parents), extended TPU-first: the DAG
also precomputes *topological levels* — maximal antichains of nodes whose
parents all live in earlier levels — which the compiled inference sweep uses
to batch same-family CPD evaluations within a level (see SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import networkx as nx


class StaticDAG:
    def __init__(self, graph) -> None:
        if isinstance(graph, StaticDAG):
            graph = graph.graph
        if not isinstance(graph, nx.DiGraph):
            g = nx.DiGraph()
            g.add_nodes_from(getattr(graph, "nodes", graph))
            if hasattr(graph, "edges"):
                g.add_edges_from(graph.edges)
            graph = g
        if not nx.is_directed_acyclic_graph(graph):
            raise ValueError("Graph must be a DAG")
        self.graph = graph
        self._topo: Tuple[str, ...] = tuple(nx.topological_sort(graph))
        self._parents: Dict[str, Tuple[str, ...]] = {
            node: tuple(graph.predecessors(node)) for node in self._topo
        }
        self._children: Dict[str, Tuple[str, ...]] = {
            node: tuple(graph.successors(node)) for node in self._topo
        }
        # Topological levels: level(n) = 1 + max(level(parents)), roots = 0.
        level: Dict[str, int] = {}
        for node in self._topo:
            ps = self._parents[node]
            level[node] = 1 + max((level[p] for p in ps), default=-1)
        n_levels = 1 + max(level.values(), default=0)
        levels: List[List[str]] = [[] for _ in range(n_levels)]
        for node in self._topo:
            levels[level[node]].append(node)
        self._levels: Tuple[Tuple[str, ...], ...] = tuple(
            tuple(lv) for lv in levels
        )
        self._level_of = level

    # -- structural queries -------------------------------------------------
    def nodes(self) -> Tuple[str, ...]:
        return self._topo

    def edges(self) -> Iterable[Tuple[str, str]]:
        return self.graph.edges()

    def topological_order(self) -> Tuple[str, ...]:
        return self._topo

    def topological_levels(self) -> Tuple[Tuple[str, ...], ...]:
        return self._levels

    def parents(self, node: str) -> Tuple[str, ...]:
        return self._parents[node]

    def children(self, node: str) -> Tuple[str, ...]:
        return self._children[node]

    def level_of(self, node: str) -> int:
        return self._level_of[node]

    def descendants(self, node: str) -> set:
        return nx.descendants(self.graph, node)

    def ancestors(self, node: str) -> set:
        return nx.ancestors(self.graph, node)

    def __contains__(self, node: str) -> bool:
        return node in self.graph

    def __len__(self) -> int:
        return self.graph.number_of_nodes()


class TemporalDAG:
    """Placeholder for temporal DAG support (parity: ``vbn/core/dags.py:48-51``)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("TemporalDAG is not implemented yet")


class DynamicDAG:
    """Placeholder for dynamic DAG support (parity: ``vbn/core/dags.py:53-55``)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("DynamicDAG is not implemented yet")
