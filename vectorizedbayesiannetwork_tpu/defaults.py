"""Packaged YAML defaults per component category.

Behavior parity with the reference's ``vbn/defaults.py:11-112``: lru-cached
category loading via importlib.resources, name-or-ConfigItem resolution, and
the validation rules that (a) CPD defaults must carry explicit ``fit`` and
``update`` dicts and (b) training hyperparameters are banned at the top level
of CPD and node_wise-learning configs.
"""

from __future__ import annotations

import copy
from functools import lru_cache
from importlib import resources
from typing import Dict

import yaml

TRAINING_KEYS = frozenset(
    {"epochs", "lr", "batch_size", "weight_decay", "n_steps", "max_grad_norm"}
)


@lru_cache(maxsize=None)
def _load_category(category: str) -> Dict[str, Dict]:
    items: Dict[str, Dict] = {}
    base = resources.files("vectorizedbayesiannetwork_tpu.configs")
    cat_dir = base / category
    if cat_dir.is_dir():
        for path in sorted(cat_dir.iterdir(), key=lambda p: p.name):
            if path.name.endswith(".yaml"):
                data = yaml.safe_load(path.read_text(encoding="utf-8")) or {}
                name = data.pop("name", path.name[: -len(".yaml")])
                items[path.name[: -len(".yaml")]] = {
                    "name": name,
                    "params": data,
                }
    return items


def _resolve_name(name_or_item) -> str:
    if isinstance(name_or_item, str):
        return name_or_item
    if hasattr(name_or_item, "name"):
        return getattr(name_or_item, "name")
    raise TypeError("Expected a string name or a ConfigItem with .name")


def _get_item(category: str, name_or_item) -> Dict:
    items = _load_category(category)
    name = _resolve_name(name_or_item)
    if name in items:
        return items[name]
    for entry in items.values():
        if entry["name"] == name:
            return entry
    raise ValueError(
        f"Unknown {category} config {name!r}. Available: {sorted(items)}"
    )


def _reject_training_keys(params: Dict, context: str) -> None:
    bad = sorted(set(params) & TRAINING_KEYS)
    if bad:
        raise ValueError(
            f"{context} must not include training keys at top level ({bad}). "
            "Move them under per-CPD 'fit'/'update' dicts."
        )


class Defaults:
    """``defaults.cpd('mdn')`` etc. — deep copies of packaged defaults."""

    def cpd(self, name_or_item) -> Dict:
        entry = _get_item("cpds", name_or_item)
        params = copy.deepcopy(entry["params"])
        _reject_training_keys(params, "CPD defaults")
        if "fit" not in params or "update" not in params:
            raise ValueError(
                "CPD defaults must include explicit 'fit' and 'update' dicts."
            )
        fit = params.pop("fit")
        update = params.pop("update")
        if not isinstance(fit, dict) or not isinstance(update, dict):
            raise TypeError("CPD 'fit'/'update' defaults must be dicts.")
        return {"cpd": entry["name"], **params, "fit": fit, "update": update}

    def learning(self, name_or_item) -> Dict:
        entry = _get_item("learning", name_or_item)
        params = copy.deepcopy(entry["params"])
        if entry["name"] == "node_wise":
            _reject_training_keys(params, "node_wise learning defaults")
        return {"name": entry["name"], **params}

    def inference(self, name_or_item) -> Dict:
        entry = _get_item("inference", name_or_item)
        return {"name": entry["name"], **copy.deepcopy(entry["params"])}

    def sampling(self, name_or_item) -> Dict:
        entry = _get_item("sampling", name_or_item)
        return {"name": entry["name"], **copy.deepcopy(entry["params"])}

    def update(self, name_or_item) -> Dict:
        entry = _get_item("update", name_or_item)
        return {"name": entry["name"], **copy.deepcopy(entry["params"])}


defaults = Defaults()
