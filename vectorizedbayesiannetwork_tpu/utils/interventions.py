"""Do-calculus query helpers.

Capability parity with ``/root/reference/vbn/utils/interventions.py:10-29``:
an intervened node is clamped without likelihood and loses its parents
(graph surgery); these predicates are used by inference plans and user code.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..core.base import Query


def is_intervened(node: str, query: Query) -> bool:
    return node in (query.do or {})


def is_observed(node: str, query: Query) -> bool:
    return node in (query.evidence or {})


def get_fixed_value(node: str, query: Query):
    if is_intervened(node, query):
        return query.do[node]
    if is_observed(node, query):
        return query.evidence[node]
    return None


def effective_parents(node: str, parents: Tuple[str, ...], query: Query):
    """Graph surgery: an intervened node's incoming edges are removed."""
    if is_intervened(node, query):
        return ()
    return tuple(parents)
