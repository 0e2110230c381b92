"""Schema-driven coercion of config values (strings/np scalars -> typed).

Behavior parity with the reference's ``vbn/config_cast.py:12-168``: YAML/CLI
round-trips may deliver numbers as strings or numpy scalars; these helpers
coerce them against per-CPD / fit / update schemas. Torch-tensor scalars are
replaced by numpy/JAX scalar handling.
"""

from __future__ import annotations

import ast
from typing import Any, Callable, Dict

import numpy as np


def coerce_scalar(value: Any) -> Any:
    if isinstance(value, np.generic):
        return value.item()
    # 0-d arrays (numpy or jax) -> python scalar
    if hasattr(value, "ndim") and getattr(value, "ndim", None) == 0:
        try:
            return value.item()
        except Exception:
            return value
    return value


def _is_numeric_string(value: str) -> bool:
    try:
        float(value)
        return True
    except Exception:
        return False


def _coerce_number(value: Any, target_type: type, key: str) -> Any:
    value = coerce_scalar(value)
    if isinstance(value, str):
        raw = value.strip()
        if not _is_numeric_string(raw):
            raise ValueError(
                f"Invalid hyperparameter {key}={value!r} "
                f"(expected {target_type.__name__})."
            )
        value = float(raw) if target_type is float else int(float(raw))
    try:
        return target_type(value)
    except Exception as exc:
        raise ValueError(
            f"Invalid hyperparameter {key}={value!r} "
            f"(expected {target_type.__name__})."
        ) from exc


def _coerce_bool(value: Any, key: str) -> bool:
    value = coerce_scalar(value)
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        raw = value.strip().lower()
        if raw in {"true", "1", "yes"}:
            return True
        if raw in {"false", "0", "no"}:
            return False
    raise ValueError(f"Invalid hyperparameter {key}={value!r} (expected bool).")


def list_of(element_type: type) -> Callable[[Any, str], list]:
    def _coerce(value: Any, key: str) -> list:
        value = coerce_scalar(value)
        if isinstance(value, str):
            raw = value.strip()
            try:
                parsed = ast.literal_eval(raw)
            except Exception:
                parsed = [v.strip() for v in raw.split(",") if v.strip()]
            value = parsed
        if not isinstance(value, (list, tuple)):
            raise ValueError(
                f"Invalid hyperparameter {key}={value!r} (expected list)."
            )
        return [_coerce_number(item, element_type, key) for item in value]

    return _coerce


def _str_caster(value: Any, key: str) -> str:
    return str(coerce_scalar(value))


def coerce_numbers(values: Dict[str, Any], schema: Dict[str, Any]) -> Dict[str, Any]:
    coerced = dict(values)
    for key, caster in schema.items():
        if key not in coerced:
            continue
        val = coerced[key]
        if caster is int:
            coerced[key] = _coerce_number(val, int, key)
        elif caster is float:
            coerced[key] = _coerce_number(val, float, key)
        elif caster is bool:
            coerced[key] = _coerce_bool(val, key)
        elif callable(caster):
            coerced[key] = caster(val, key)
        else:
            coerced[key] = coerce_scalar(val)
    return coerced


FIT_SCHEMA: Dict[str, Any] = {
    "epochs": int,
    "batch_size": int,
    "lr": float,
    "weight_decay": float,
    "n_steps": int,
    "show_progress": bool,
    "verbosity": int,
    "max_grad_norm": float,
}

UPDATE_SCHEMA: Dict[str, Any] = {
    "lr": float,
    "n_steps": int,
    "batch_size": int,
    "weight_decay": float,
    "max_grad_norm": float,
}

CPD_SCHEMAS: Dict[str, Dict[str, Any]] = {
    "gaussian_nn": {"hidden_dims": list_of(int), "min_scale": float},
    "softmax_nn": {
        "n_classes": int,
        "hidden_dims": list_of(int),
        "label_smoothing": float,
        "min_bin_width": float,
        "within_bin_scale": float,
        "within_bin_clip": bool,
        "debug": bool,
        "debug_every": int,
    },
    "mdn": {
        "n_components": int,
        "hidden_dims": list_of(int),
        "min_scale": float,
    },
    "kde": {
        "bandwidth": float,
        "parent_bandwidth": float,
        "max_points": int,
        "min_scale": float,
    },
    "linear_gaussian": {"ridge": float, "min_scale": float},
    "rff_gaussian": {
        "n_features": int,
        "lengthscale": float,
        "ridge": float,
        "min_scale": float,
        "use_bias": bool,
    },
    "categorical_table": {
        "n_classes": int,
        "parent_n_classes": list_of(int),
        "alpha": float,
        "alpha_mode": _str_caster,
        "prior": _str_caster,
    },
    "categorical_embedded_softmax": {
        "n_classes": int,
        "parent_n_classes": list_of(int),
        "embedding_dim": int,
        "hidden_dims": list_of(int),
        "label_smoothing": float,
        "max_grad_norm": float,
    },
}
