"""Versioned benchmark bundle directories.

Capability parity with ``/root/reference/benchmarking/bundles/bundle.py:11-280``:
a bundle is a timestamped directory tree

    <root>/benchmark_<mode>_<ts>/
        metadata.json
        networks/   *.bif
        datasets/   <problem>/data_seed<k>.csv + domain.json
        queries/    <problem>/{cpd,inference}_queries.jsonl
        ground_truth/ <problem>/ground_truth.jsonl
        results/    <problem>/<model>.jsonl
        report/     index.md ...
        logs/

with spec persistence and latest-bundle discovery.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

STAGES = ["networks", "datasets", "queries", "ground_truth", "results", "report", "logs"]


@dataclass
class BenchmarkBundleSpec:
    mode: str = "inference"  # cpds | inference | both
    source: str = "builtin"
    source_kwargs: Dict = field(default_factory=dict)
    n_queries: int = 64
    n_rows: int = 2000
    seed: int = 0
    evidence_modes: List[str] = field(
        default_factory=lambda: ["empty", "on_manifold", "off_manifold"]
    )
    # Exact ground truth is exponential in treewidth; link-scale problems
    # (the reference suite's 724/1041-node networks) run timing-only.
    ground_truth: bool = True

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict) -> "BenchmarkBundleSpec":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class BenchmarkBundle:
    def __init__(self, root: str, spec: BenchmarkBundleSpec, name: Optional[str] = None):
        if name is None:
            ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            name = f"benchmark_{spec.mode}_{ts}"
        self.root = root
        self.name = name
        self.path = os.path.join(root, name)
        self.spec = spec

    # -- paths ---------------------------------------------------------------
    def dir(self, stage: str, problem: Optional[str] = None) -> str:
        if stage not in STAGES:
            raise ValueError(f"Unknown stage dir {stage!r}")
        p = os.path.join(self.path, stage)
        if problem is not None:
            p = os.path.join(p, problem)
        os.makedirs(p, exist_ok=True)
        return p

    def metadata_path(self) -> str:
        return os.path.join(self.path, "metadata.json")

    # -- persistence ----------------------------------------------------------
    def save_metadata(self, extra: Optional[Dict] = None) -> None:
        os.makedirs(self.path, exist_ok=True)
        meta = {"name": self.name, "spec": self.spec.to_dict()}
        if extra:
            meta.update(extra)
        with open(self.metadata_path(), "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, path: str) -> "BenchmarkBundle":
        with open(os.path.join(path, "metadata.json"), encoding="utf-8") as f:
            meta = json.load(f)
        spec = BenchmarkBundleSpec.from_dict(meta.get("spec", {}))
        root, name = os.path.split(os.path.normpath(path))
        return cls(root, spec, name=name)

    def problems(self) -> List[str]:
        d = os.path.join(self.path, "networks")
        if not os.path.isdir(d):
            return []
        names = []
        for f in os.listdir(d):
            if f.endswith(".bif"):
                names.append(f[: -len(".bif")])
            elif f.endswith(".bif.gz"):  # committed bundles gzip big nets
                names.append(f[: -len(".bif.gz")])
            elif f.endswith(".gbn.json"):
                names.append(f[: -len(".gbn.json")])
            elif f.endswith(".clg.json"):
                names.append(f[: -len(".clg.json")])
        return sorted(names)


def find_latest_bundle(root: str, mode: Optional[str] = None) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    names = [
        n
        for n in sorted(os.listdir(root))
        if n.startswith("benchmark_")
        and (mode is None or n.startswith(f"benchmark_{mode}_"))
        and os.path.isfile(os.path.join(root, n, "metadata.json"))
    ]
    return os.path.join(root, names[-1]) if names else None


def write_jsonl(path: str, records) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")


def read_jsonl(path: str) -> List[Dict]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
