"""Benchmark model configs with content hashes.

Parity: /root/reference/benchmarking/models/config.py:9-143 — frozen
component specs (learning/cpd/inference) and a sha256 config hash for
provenance; preset registry in presets.py.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Dict


@dataclass(frozen=True)
class ComponentSpec:
    name: str
    params: tuple = ()  # tuple of (key, value) pairs for hashability

    @classmethod
    def make(cls, name: str, **params) -> "ComponentSpec":
        return cls(name=name, params=tuple(sorted(params.items())))

    def as_dict(self) -> Dict:
        return {"name": self.name, **dict(self.params)}


@dataclass(frozen=True)
class ModelBenchmarkConfig:
    config_id: str
    backend: str
    learning: ComponentSpec = ComponentSpec("node_wise")
    cpd: ComponentSpec = ComponentSpec("categorical_table")
    inference: ComponentSpec = ComponentSpec("likelihood_weighting")
    extra: tuple = ()

    def to_dict(self) -> Dict:
        out = {
            "config_id": self.config_id,
            "backend": self.backend,
            "learning": self.learning.as_dict(),
            "cpd": self.cpd.as_dict(),
            "inference": self.inference.as_dict(),
            "extra": dict(self.extra),
            "config_hash": self.config_hash(),
        }
        # extras also splat to top level so backends can read ad-hoc keys
        # (e.g. cpd_discrete for mixed clgaussian domains)
        for k, v in self.extra:
            out.setdefault(k, v)
        return out

    def config_hash(self) -> str:
        payload = json.dumps(
            {
                "backend": self.backend,
                "learning": self.learning.as_dict(),
                "cpd": self.cpd.as_dict(),
                "inference": self.inference.as_dict(),
                "extra": dict(self.extra),
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
