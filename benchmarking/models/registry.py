"""Backend registry (parity: /root/reference/benchmarking/models/registry.py:7-27)."""

from __future__ import annotations

from typing import Dict, Type

MODEL_REGISTRY: Dict[str, Type] = {}


def register_model(name: str):
    def deco(cls):
        if name in MODEL_REGISTRY:
            raise KeyError(f"Duplicate benchmark model {name!r}")
        MODEL_REGISTRY[name] = cls
        cls.backend_name = name
        return cls

    return deco
