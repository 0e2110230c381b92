"""Packaged YAML defaults, one file per component, grouped by category.

``defaults.cpd("mdn")`` / ``defaults.inference("likelihood_weighting")``
etc. return fresh dicts assembled from ``configs/<category>/<name>.yaml``.
The validation rules are a parity contract with the reference
(``/root/reference/vbn/defaults.py:46-112``): CPD defaults must carry
explicit ``fit`` and ``update`` sub-dicts, and training hyperparameters
(epochs/lr/batch_size/...) may never sit at the top level of a CPD or
node_wise-learning config — they belong inside those sub-dicts, where the
per-node fit/update machinery reads them.
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources
from typing import Dict, Tuple

import yaml

TRAINING_KEYS = frozenset(
    {"epochs", "lr", "batch_size", "weight_decay", "n_steps", "max_grad_norm"}
)

_CONFIG_PKG = "vectorizedbayesiannetwork_tpu.configs"


@lru_cache(maxsize=None)
def _catalog(category: str) -> Tuple[Tuple[str, str, str], ...]:
    """Immutable (stem, declared_name, yaml_text) rows for one category.

    Caching the raw text (not parsed dicts) keeps the cache immune to
    callers mutating returned configs; parsing is re-done per lookup and
    is cheap at these sizes.
    """
    rows = []
    root = resources.files(_CONFIG_PKG) / category
    if root.is_dir():
        for entry in sorted(root.iterdir(), key=lambda e: e.name):
            stem, dot, ext = entry.name.rpartition(".")
            if dot and ext == "yaml":
                text = entry.read_text(encoding="utf-8")
                declared = (yaml.safe_load(text) or {}).get("name", stem)
                rows.append((stem, declared, text))
    return tuple(rows)


def _lookup(category: str, ref) -> Tuple[str, Dict]:
    """Resolve a name (or anything exposing ``.name``) to (name, params)."""
    wanted = ref if isinstance(ref, str) else getattr(ref, "name", None)
    if not isinstance(wanted, str):
        raise TypeError("Expected a string name or a ConfigItem with .name")
    rows = _catalog(category)
    match = next((r for r in rows if r[0] == wanted), None)
    if match is None:  # fall back to the declared-name alias
        match = next((r for r in rows if r[1] == wanted), None)
    if match is None:
        stems = sorted(r[0] for r in rows)
        raise ValueError(
            f"Unknown {category} config {wanted!r}. Available: {stems}"
        )
    params = yaml.safe_load(match[2]) or {}
    params.pop("name", None)
    return match[1], params


def _forbid_training_keys(params: Dict, what: str) -> None:
    leaked = sorted(TRAINING_KEYS.intersection(params))
    if leaked:
        raise ValueError(
            f"{what} must not include training keys at top level ({leaked}). "
            "Move them under per-CPD 'fit'/'update' dicts."
        )


class Defaults:
    """Read-only façade over the packaged YAML catalog."""

    @staticmethod
    def cpd(ref) -> Dict:
        name, params = _lookup("cpds", ref)
        _forbid_training_keys(params, "CPD defaults")
        try:
            fit, update = params.pop("fit"), params.pop("update")
        except KeyError:
            raise ValueError(
                "CPD defaults must include explicit 'fit' and 'update' dicts."
            ) from None
        if not (isinstance(fit, dict) and isinstance(update, dict)):
            raise TypeError("CPD 'fit'/'update' defaults must be dicts.")
        return {"cpd": name, **params, "fit": fit, "update": update}

    @staticmethod
    def learning(ref) -> Dict:
        name, params = _lookup("learning", ref)
        if name == "node_wise":
            _forbid_training_keys(params, "node_wise learning defaults")
        return {"name": name, **params}

    @staticmethod
    def inference(ref) -> Dict:
        name, params = _lookup("inference", ref)
        return {"name": name, **params}

    @staticmethod
    def sampling(ref) -> Dict:
        name, params = _lookup("sampling", ref)
        return {"name": name, **params}

    @staticmethod
    def update(ref) -> Dict:
        name, params = _lookup("update", ref)
        return {"name": name, **params}


defaults = Defaults()

__all__ = ["Defaults", "defaults", "TRAINING_KEYS"]
