"""Global component registries.

Mirrors the registry surface of the reference (``vbn/core/registry.py:7-43``):
five category registries populated by decorators, with a duplicate-key guard.
The registered objects here are *spec classes / strategy classes* — pure-Python
static configuration holders; all tensor state lives in JAX pytrees.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

CPD_REGISTRY: Dict[str, Type] = {}
LEARNING_REGISTRY: Dict[str, Type] = {}
INFERENCE_REGISTRY: Dict[str, Type] = {}
SAMPLING_REGISTRY: Dict[str, Type] = {}
UPDATE_REGISTRY: Dict[str, Type] = {}

_ALL = {
    "cpd": CPD_REGISTRY,
    "learning": LEARNING_REGISTRY,
    "inference": INFERENCE_REGISTRY,
    "sampling": SAMPLING_REGISTRY,
    "update": UPDATE_REGISTRY,
}


def _make_register(registry: Dict[str, Type], kind: str) -> Callable:
    def register(name: str) -> Callable[[Type], Type]:
        def deco(cls: Type) -> Type:
            if name in registry:
                raise KeyError(f"Duplicate {kind} registry key: {name!r}")
            registry[name] = cls
            cls.registry_key = name
            return cls

        return deco

    return register


register_cpd = _make_register(CPD_REGISTRY, "cpd")
register_learning = _make_register(LEARNING_REGISTRY, "learning")
register_inference = _make_register(INFERENCE_REGISTRY, "inference")
register_sampling = _make_register(SAMPLING_REGISTRY, "sampling")
register_update = _make_register(UPDATE_REGISTRY, "update")
