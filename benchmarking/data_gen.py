"""Stage III: training-data generation from exact CPTs.

Capability parity with ``benchmarking/III_data_generation`` of the
reference: i.i.d. integer-coded training frames via exact ancestral
sampling, per-dataset stable seeds, and a ``domain.json`` schema describing
node types/states (``bnlearn.py:425-640``, ``base.py:115``).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict

import numpy as np

from .bif import DiscreteBN
from .exact import ancestral_sample


def stable_seed(*parts) -> int:
    """Deterministic seed from string parts (parity: base.py:115)."""
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()
    return int(h[:8], 16)


def domain_schema(bn: DiscreteBN) -> Dict:
    return {
        "name": bn.name,
        "nodes": {
            node: {
                "type": "discrete",
                "states": bn.states[node],
                "n_classes": bn.card(node),
                "parents": bn.parents[node],
            }
            for node in bn.nodes
        },
        "edges": [list(e) for e in bn.edges()],
    }


def generate_dataset(
    bn: DiscreteBN, n_rows: int, seed: int
) -> "np.ndarray":
    """Integer-coded frame as a structured dict of columns."""
    return ancestral_sample(bn, n_rows, seed=seed)


def write_problem_assets(
    bn: DiscreteBN, out_dir: str, n_rows: int, base_seed: int, n_datasets: int = 1
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "domain.json"), "w", encoding="utf-8") as f:
        json.dump(domain_schema(bn), f, indent=2)
    import csv

    for k in range(n_datasets):
        seed = stable_seed(bn.name, base_seed, k)
        data = generate_dataset(bn, n_rows, seed)
        path = os.path.join(out_dir, f"data_seed{k}.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            writer.writerow(bn.nodes)
            cols = [data[n] for n in bn.nodes]
            for row in zip(*cols):
                writer.writerow([int(v) for v in row])


def write_gaussian_problem_assets(
    bn, out_dir: str, n_rows: int, base_seed: int, n_datasets: int = 1
) -> None:
    """Continuous-class datasets + domain schema (gaussian_bn.py nets)."""
    import csv

    from .gaussian_bn import gaussian_domain_schema

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "domain.json"), "w", encoding="utf-8") as f:
        json.dump(gaussian_domain_schema(bn), f, indent=2)
    for k in range(n_datasets):
        seed = stable_seed(bn.name, base_seed, k)
        data = bn.sample(n_rows, seed=seed)
        with open(
            os.path.join(out_dir, f"data_seed{k}.csv"),
            "w",
            newline="",
            encoding="utf-8",
        ) as f:
            writer = csv.writer(f)
            writer.writerow(bn.nodes)
            for row in zip(*[data[n] for n in bn.nodes]):
                writer.writerow([f"{v:.6g}" for v in row])


def write_clg_problem_assets(
    bn, out_dir: str, n_rows: int, base_seed: int, n_datasets: int = 1
) -> None:
    """CLG-class datasets + mixed-type domain schema (clg_bn.py nets)."""
    import csv

    from .clg_bn import clg_domain_schema

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "domain.json"), "w", encoding="utf-8") as f:
        json.dump(clg_domain_schema(bn), f, indent=2)
    for k in range(n_datasets):
        seed = stable_seed(bn.name, base_seed, k)
        data = bn.sample(n_rows, seed=seed)
        with open(
            os.path.join(out_dir, f"data_seed{k}.csv"),
            "w",
            newline="",
            encoding="utf-8",
        ) as f:
            writer = csv.writer(f)
            writer.writerow(bn.nodes)
            for row in zip(*[data[n] for n in bn.nodes]):
                writer.writerow([f"{v:.6g}" for v in row])


def load_dataset(path: str) -> Dict[str, np.ndarray]:
    import csv
    import gzip
    import io

    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        path += ".gz"  # committed bundles gzip their largest datasets
    if path.endswith(".gz"):
        opener = lambda p: io.TextIOWrapper(
            gzip.open(p, "rb"), encoding="utf-8", newline=""
        )
    else:
        opener = lambda p: open(p, newline="", encoding="utf-8")
    with opener(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [[float(v) for v in row] for row in reader]
    arr = np.asarray(rows, np.float32)
    return {name: arr[:, i : i + 1] for i, name in enumerate(header)}


def load_domain(path: str) -> Dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)
