"""Update-policy base: per-node update-hyperparameter resolution.

Capability parity with ``/root/reference/vbn/update/base_update.py:13-50``:
``lr``/``n_steps``/``batch_size`` are required in each node's CPD ``update``
config, unknown keys rejected, values schema-coerced; policies expose
``get_state``/``set_state`` hooks for checkpointing (state split into a
JSON-able meta dict + named arrays for the npz archive).
"""

from __future__ import annotations

from typing import Dict, Tuple

from ..config_cast import UPDATE_SCHEMA, coerce_numbers
from ..core.utils import concat_parents

UPDATE_REQUIRED_KEYS = {"lr", "n_steps", "batch_size"}
UPDATE_ALLOWED_KEYS = set(UPDATE_SCHEMA.keys())


def resolve_node_update(vbn, node: str) -> Dict:
    learning_cfg = getattr(vbn, "_learning_config", None) or {}
    nodes_cpds = learning_cfg.get("nodes_cpds") or {}
    if not isinstance(nodes_cpds, dict) or node not in nodes_cpds:
        raise ValueError(
            f"Missing CPD config for node {node!r}. "
            "Provide an 'update' dict per node."
        )
    conf = nodes_cpds.get(node) or {}
    if not isinstance(conf, dict):
        raise ValueError(f"CPD config for node {node!r} must be a dict.")
    if "update" not in conf:
        raise ValueError(
            f"CPD config for node {node!r} must include an 'update' dict."
        )
    update_conf = conf["update"]
    if not isinstance(update_conf, dict):
        raise ValueError(
            f"CPD 'update' config for node {node!r} must be a dict."
        )
    missing = sorted(UPDATE_REQUIRED_KEYS - set(update_conf))
    if missing:
        raise ValueError(
            f"CPD 'update' config for node {node!r} is missing required "
            f"keys: {missing}."
        )
    unknown = sorted(set(update_conf) - UPDATE_ALLOWED_KEYS)
    if unknown:
        raise ValueError(
            f"Unknown keys in CPD 'update' config for node {node!r}: "
            f"{unknown}. Allowed keys: {sorted(UPDATE_ALLOWED_KEYS)}."
        )
    return coerce_numbers(update_conf, UPDATE_SCHEMA)


class BaseUpdatePolicy:
    def update(self, vbn, data, **kwargs):
        raise NotImplementedError

    def get_state(self) -> Tuple[Dict, Dict]:
        """(json-able meta, {name: array}) for checkpointing."""
        return {}, {}

    def set_state(self, meta: Dict, arrays: Dict) -> None:
        return None


def node_update_inputs(vbn, data, node):
    """(parents array or None, x array) for one node."""
    parents = vbn.dag.parents(node)
    return concat_parents(data, parents), data[node]
