"""Node-wise learning: fit each CPD in topological order.

Capability parity with ``/root/reference/vbn/learning/node_wise.py:29-191``:
per-node config validation (``cpd`` + ``fit`` required, training keys banned
at the top level), parent-column concatenation, registry-based CPD
construction with schema-coerced kwargs, then ``cpd.fit``. Node fits are
independent given the data, so closed-form fits compile into a handful of
dense solves; NN fits run jit-scanned optimizer loops (see ``models/``).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config_cast import CPD_SCHEMAS, FIT_SCHEMA, coerce_numbers
from ..core.registry import CPD_REGISTRY, register_learning
from ..core.rng import fold
from ..core.utils import concat_parents, resolve_verbosity
from ..defaults import TRAINING_KEYS

_RESERVED = {"cpd", "fit", "update"}


def _use_fit_grouping() -> bool:
    # Default OFF: measured on TPU v5e (BENCH_NOTES.md), the vmapped
    # multi-node trainer loses to the sequential path — the per-node scans
    # pipeline asynchronously and share one cached compiled trainer, while
    # vmap turns the minibatch gathers into slower batched gathers and the
    # group compile is ~7x costlier. Kept as an opt-in (VBN_FIT_GROUP=
    # always) for hosts where dispatch latency dominates.
    import os

    return os.environ.get("VBN_FIT_GROUP", "never").lower() == "always"


def validate_node_conf(node: str, conf: Dict) -> None:
    if not isinstance(conf, dict):
        raise TypeError(f"nodes_cpds[{node!r}] must be a dict config")
    if "cpd" not in conf:
        raise ValueError(f"nodes_cpds[{node!r}] must declare a 'cpd' key")
    bad = sorted((set(conf) - _RESERVED) & TRAINING_KEYS)
    if bad:
        raise ValueError(
            f"nodes_cpds[{node!r}] has training keys at top level ({bad}); "
            "move them under 'fit'/'update'."
        )
    fit = conf.get("fit")
    if fit is not None and not isinstance(fit, dict):
        raise TypeError(f"nodes_cpds[{node!r}]['fit'] must be a dict")
    update = conf.get("update")
    if update is not None and not isinstance(update, dict):
        raise TypeError(f"nodes_cpds[{node!r}]['update'] must be a dict")


def build_cpd(node: str, conf: Dict, input_dim: int, output_dim: int, seed: int):
    """Construct a CPD spec from a node config via the registry."""
    name = conf["cpd"]
    if name not in CPD_REGISTRY:
        raise ValueError(
            f"Unknown CPD {name!r} for node {node!r}. "
            f"Available: {sorted(CPD_REGISTRY)}"
        )
    hyper = {k: v for k, v in conf.items() if k not in _RESERVED}
    hyper = coerce_numbers(hyper, CPD_SCHEMAS.get(name, {}))
    return CPD_REGISTRY[name](
        input_dim, output_dim, seed=seed, **hyper
    )


@register_learning("node_wise")
class NodeWiseLearner:
    def __init__(self, default_cpd: str = "gaussian_nn", **kwargs) -> None:
        # Training hyperparameters live ONLY in per-CPD 'fit'/'update'
        # sub-dicts — parity with the reference's method-level guard
        # (/root/reference/vbn/learning/node_wise.py:29-45).
        bad = sorted(set(kwargs) & TRAINING_KEYS)
        if bad:
            raise ValueError(
                "node_wise learning config cannot include training "
                f"hyperparameters ({bad}); move them into each node's CPD "
                "config under 'fit'/'update'."
            )
        unknown = sorted(set(kwargs) - {"show_progress", "verbosity"})
        if unknown:
            raise ValueError(
                "node_wise learning config only supports orchestration keys "
                f"['show_progress', 'verbosity']; unknown: {unknown}. Move "
                "CPD init/training parameters into each node's CPD config."
            )
        self.default_cpd = default_cpd

    def fit(
        self,
        vbn,
        data: Dict[str, np.ndarray],
        verbose: Optional[int] = None,
        **_kwargs,
    ):
        from ..defaults import defaults as _defaults

        verbosity = resolve_verbosity(verbose)
        nodes_cpds = vbn._learning_config.get("nodes_cpds", {})
        topo = vbn.dag.topological_order()
        for node in topo:
            conf = nodes_cpds.get(node)
            if conf is None:
                conf = _defaults.cpd(self.default_cpd)
                nodes_cpds[node] = conf
            validate_node_conf(node, conf)

        entries = []
        for node_idx, node in enumerate(topo):
            conf = nodes_cpds[node]
            parents = vbn.dag.parents(node)
            parent_arr = concat_parents(data, parents)
            x = np.asarray(data[node])
            input_dim = 0 if parent_arr is None else parent_arr.shape[-1]
            output_dim = x.shape[-1]
            cpd = build_cpd(node, conf, input_dim, output_dim, vbn.seed)
            key = fold(vbn.root_key, 1000 + node_idx)
            fit_kwargs = coerce_numbers(dict(conf.get("fit") or {}), FIT_SCHEMA)
            entries.append((node, conf, cpd, key, parent_arr, x, fit_kwargs))

        # Fit-time grouping: same-signature NN nodes (same class / dims /
        # static config / fit hyperparams) train as ONE vmapped scan — the
        # fit-time analogue of the level-grouped inference sweep. Node fits
        # are independent given the data, so grouping ignores topology.
        grouped_done = set()
        if _use_fit_grouping():
            groups: Dict[tuple, list] = {}
            for e in entries:
                cpd = e[2]
                if not hasattr(cpd, "fit_many"):
                    continue
                sig = (
                    type(cpd),
                    cpd._static_fields(),
                    cpd.input_dim,
                    cpd.output_dim,
                    tuple(sorted((k, repr(v)) for k, v in e[6].items())),
                )
                groups.setdefault(sig, []).append(e)
            for g in groups.values():
                if len(g) < 2:
                    continue
                params_list = [e[2].init(e[3]) for e in g]
                fitted = g[0][2].fit_many(
                    params_list,
                    [e[3] for e in g],
                    [e[4] for e in g],
                    [e[5] for e in g],
                    **g[0][6],
                )
                if fitted is None:
                    continue
                for e, params in zip(g, fitted):
                    node, conf, cpd = e[0], e[1], e[2]
                    vbn.nodes[node] = cpd
                    vbn.params[node] = params
                    grouped_done.add(node)
                if verbosity >= 2:
                    print(
                        f"[node_wise] fitted {len(g)} {g[0][1]['cpd']} "
                        "nodes in one vmapped scan"
                    )

        for node, conf, cpd, key, parent_arr, x, fit_kwargs in entries:
            if node in grouped_done:
                continue
            params = cpd.init(key)
            params = cpd.fit(params, key, parent_arr, x, **fit_kwargs)
            vbn.nodes[node] = cpd
            vbn.params[node] = params
            if verbosity >= 2:
                print(f"[node_wise] fitted {node} ({conf['cpd']})")
        return vbn.nodes


# "amortized" lives in learning/amortized.py — a REAL implementation
# (masked-evidence posterior network), unlike the reference's placeholder.
