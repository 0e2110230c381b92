"""Main user-facing API: the VBN class.

Capability parity with ``/root/reference/vbn/vbn.py:184-824`` — method
setters with str/dict/ConfigItem/callable polymorphism, fit / update /
infer_posterior / infer_relative / sample, posterior stats (mean/std/ESS),
CPD handles, and full checkpoint save/load — redesigned for JAX: model state
is a pytree of parameters per node (no mutable modules), RNG is an explicit
deterministic key stream, compiled inference programs are cached per query
plan, and "device" is a sharding concern (``parallel/``) rather than a
global object attribute. Checkpoints are framework-neutral ``.npz`` archives
(flattened param pytrees) + JSON structure — no pickle.
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .core.base import Query
from .core.dag import StaticDAG
from .core.handle import CPDHandle
from .core.registry import (
    CPD_REGISTRY,
    INFERENCE_REGISTRY,
    LEARNING_REGISTRY,
    SAMPLING_REGISTRY,
    UPDATE_REGISTRY,
)
from .core.rng import KeyStream
from .core.utils import (
    df_to_array_dict,
    ensure_2d_np,
    infer_batch_size,
    resolve_verbosity,
    to_plain_dict,
)

__version__ = "0.1.0"


@dataclass(frozen=True)
class ConfigItem:
    """One packaged default config, browsable as ``vbn.config.cpds.mdn``.

    Accepted anywhere a method/CPD config is: the setters and
    ``nodes_cpds`` read ``.name``/``.params``; ``to_dict()`` renders the
    flat dict form the learning config stores.
    """

    name: str
    params: Dict
    kind: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        if self.kind == "cpd":
            head = {"cpd": self.name}
        elif self.kind in ("learning", "inference", "sampling", "update"):
            head = {"name": self.name}
        else:
            head = {}
        return {**head, **self.params}

    as_dict = to_dict


class ConfigNamespace(dict):
    """Attribute-addressable view over a config catalog level."""

    __getattr__ = dict.__getitem__


def _load_configs() -> ConfigNamespace:
    """Browsable snapshot of the packaged defaults, one ConfigItem per
    YAML, built from the same cached catalog ``defaults`` reads."""
    from .defaults import _catalog

    tree = ConfigNamespace()
    for category in ("cpds", "learning", "inference", "sampling", "update"):
        kind = "cpd" if category == "cpds" else category
        level = ConfigNamespace()
        for stem, declared, text in _catalog(category):
            params = yaml.safe_load(text) or {}
            params.pop("name", None)
            level[stem] = ConfigItem(name=declared, params=params, kind=kind)
        tree[category] = level
    return tree


def _detach(x):
    """Public-output detachment (parity: ``vbn/vbn.py:481`` .detach()).

    Concrete jax arrays carry no autograd graph, so ``stop_gradient`` is only
    meaningful when a caller traces through the public API; applying it
    unconditionally costs ~60 µs/call of eager primitive binding on the
    serving path, so it is applied to tracers only.
    """
    return jax.lax.stop_gradient(x) if isinstance(x, jax.core.Tracer) else x


def _serialize_nodes_cpds(nodes_cpds: Optional[Dict]) -> Dict[str, Dict]:
    out: Dict[str, Dict] = {}
    if not nodes_cpds:
        return out
    for node, conf in nodes_cpds.items():
        if isinstance(conf, ConfigItem):
            out[node] = conf.to_dict()
        elif isinstance(conf, dict):
            out[node] = to_plain_dict(conf)
        elif isinstance(conf, str):
            from .defaults import defaults as _defaults

            out[node] = _defaults.cpd(conf)
        else:
            raise TypeError(
                f"nodes_cpds[{node!r}] must be dict/ConfigItem/str"
            )
    return out


def _resolve_method_arg(method, registry: Dict[str, type], label: str):
    """Resolve str/dict/ConfigItem method argument to (name, base_params)."""
    if isinstance(method, dict):
        conf = to_plain_dict(method)
        name = conf.get("name") or conf.get("method")
        if name is None:
            raise TypeError(f"{label} dict must include a 'name' field")
        if not isinstance(name, str):
            raise TypeError(f"{label} name must be a string")
        key = name.lower().strip()
        if key not in registry:
            raise ValueError(
                f"Unknown {label} {name!r}. Available: {sorted(registry)}"
            )
        return key, {k: v for k, v in conf.items() if k not in {"name", "method"}}
    if isinstance(method, ConfigItem):
        return method.name, dict(method.params)
    if isinstance(method, str):
        key = method.lower().strip()
        if key not in registry:
            raise ValueError(
                f"Unknown {label} {method!r}. Available: {sorted(registry)}"
            )
        return key, {}
    raise TypeError(f"{label} must be a string, dict, ConfigItem, or callable")


_UPDATE_TRAINING_KEYS = {"lr", "n_steps", "batch_size", "weight_decay"}
_UPDATE_POLICY_INIT_KEYS = {"max_size", "replay_ratio"}


class VBN:
    """Vectorized Bayesian Network — TPU-native main interface."""

    def __init__(
        self,
        dag,
        seed: Optional[int] = None,
        device: Optional[str] = None,
        prng_impl: Optional[str] = None,
    ) -> None:
        self.seed = 0 if seed is None else int(seed)
        self.dag = StaticDAG(dag)
        self.device = device  # advisory; placement is a sharding concern
        # prng_impl: None = JAX default (threefry; bitwise-reproducible
        # stream, the one all draw-parity tests pin). "rbg" trades that
        # stream for XLA's RngBitGenerator — much cheaper bit generation
        # on TPU for PRNG-bound sweeps (core/rng.py::root_key).
        self.prng_impl = prng_impl
        self.nodes: Dict[str, Any] = {}  # node -> CPD spec
        self.params: Dict[str, Any] = {}  # node -> params pytree
        self.config = _load_configs()
        self._keys = KeyStream(self.seed, prng_impl)
        self._plan_cache: Dict = {}
        self.amortized: Optional[Dict[str, Any]] = None  # set by 'amortized' learning

        self._learning = None
        self._inference = None
        self._sampling = None
        self._update_policy = None
        self._learning_config: Optional[Dict[str, Any]] = None
        self._inference_config: Optional[Dict[str, Any]] = None
        self._sampling_config: Optional[Dict[str, Any]] = None
        self._update_config: Optional[Dict[str, Any]] = None

    # ----------------- internal plumbing -----------------
    @property
    def root_key(self) -> jax.Array:
        from .core.rng import root_key

        return root_key(self.seed, self.prng_impl)

    def next_key(self) -> jax.Array:
        return self._keys.next()

    def next_key_spec(self):
        """(root, counter) pair folded in-graph by compiled programs."""
        return self._keys.next_spec()

    def cpd_spec(self, node: str):
        if node not in self.nodes:
            raise RuntimeError(f"No fitted CPD for node {node!r}; call fit().")
        return self.nodes[node]

    def structure_fingerprint(self) -> tuple:
        return (
            tuple(self.dag.topological_order()),
            tuple(sorted(self.dag.edges())),
            tuple(
                self.nodes[n].static_signature() if n in self.nodes else None
                for n in self.dag.topological_order()
            ),
        )

    # ----------------- configuration -----------------
    def _install_method(self, slot: str, registry, label: str, method, kwargs):
        """Shared setter body: str/dict/ConfigItem resolve against the
        registry and instantiate; a bare callable installs as-is. Returns
        the stored config dict (setters may append to it)."""
        if callable(method) and not isinstance(method, (str, dict, ConfigItem)):
            impl = method
            config = {
                "callable": True,
                "name": getattr(method, "__qualname__", str(method)),
            }
        else:
            name, base_params = _resolve_method_arg(method, registry, label)
            params = {**base_params, **kwargs}
            impl = registry[name](**params)
            config = {"name": name, "params": params}
        setattr(self, f"_{slot}", impl)
        setattr(self, f"_{slot}_config", config)
        return config

    def set_learning_method(
        self, method, nodes_cpds: Optional[Dict[str, Dict]] = None, **kwargs
    ):
        config = self._install_method(
            "learning", LEARNING_REGISTRY, "learning method", method, kwargs
        )
        config["nodes_cpds"] = _serialize_nodes_cpds(nodes_cpds)

    def set_inference_method(self, method, **kwargs):
        self._install_method(
            "inference", INFERENCE_REGISTRY, "inference method", method, kwargs
        )

    def set_sampling_method(self, method, **kwargs):
        self._install_method(
            "sampling", SAMPLING_REGISTRY, "sampling method", method, kwargs
        )

    # ----------------- data prep -----------------
    def _prepare_data(self, data) -> Dict[str, np.ndarray]:
        try:
            import pandas as pd

            if isinstance(data, pd.DataFrame):
                data = df_to_array_dict(data)
        except ImportError:
            pass
        if not isinstance(data, dict):
            raise TypeError("data must be a pandas DataFrame or dict of arrays")
        out = {}
        for k, v in data.items():
            arr = np.asarray(v, dtype=np.float32)
            if arr.ndim == 1:
                arr = arr.reshape(-1, 1)
            out[k] = arr
        missing = [n for n in self.dag.nodes() if n not in out]
        if missing:
            raise ValueError(f"Missing data for DAG nodes: {missing}")
        return out

    # ----------------- fit / update -----------------
    def fit(self, data, *, verbosity: Optional[int] = None, **kwargs) -> None:
        if self._learning is None:
            raise RuntimeError("Call set_learning_method(...) before fit().")
        verbosity = resolve_verbosity(
            verbosity if verbosity is not None else kwargs.pop("verbose", None)
        )
        arrays = self._prepare_data(data)
        self._plan_cache.clear()
        self._learning.fit(self, arrays, verbose=verbosity, **kwargs)

    def update(
        self,
        data,
        update_method=None,
        *,
        verbosity: Optional[int] = None,
        **kwargs,
    ):
        if not self.nodes:
            raise RuntimeError("Call fit(...) before update(...).")
        verbosity = resolve_verbosity(
            verbosity if verbosity is not None else kwargs.pop("verbose", None)
        )
        arrays = self._prepare_data(data)
        if update_method is not None:
            name, base_params = _resolve_method_arg(
                update_method, UPDATE_REGISTRY, "update method"
            )
            params = {**base_params, **kwargs}
            bad = sorted(set(params) & _UPDATE_TRAINING_KEYS)
            if bad:
                raise ValueError(
                    "Update training hyperparameters are defined per-CPD under "
                    "nodes_cpds[node]['update']. Remove from update(): "
                    f"{bad}."
                )
            update_cls = UPDATE_REGISTRY[name]
            init_kwargs = {
                k: v for k, v in params.items() if k in _UPDATE_POLICY_INIT_KEYS
            }
            if self._update_policy is None or not isinstance(
                self._update_policy, update_cls
            ):
                self._update_policy = update_cls(**init_kwargs)
            else:
                for k, v in init_kwargs.items():
                    setattr(self._update_policy, k, v)
            policy_kwargs = {
                k: v
                for k, v in params.items()
                if k not in _UPDATE_POLICY_INIT_KEYS
            }
            self._update_config = {
                "name": name,
                "params": params,
                "init_kwargs": init_kwargs,
                "policy_kwargs": policy_kwargs,
            }
        else:
            if self._update_policy is None:
                raise RuntimeError(
                    "update_method must be provided for the first update call"
                )
            bad = sorted(set(kwargs) & _UPDATE_TRAINING_KEYS)
            if bad:
                raise ValueError(
                    "Update training hyperparameters are defined per-CPD under "
                    f"nodes_cpds[node]['update']. Remove from update(): {bad}."
                )
            policy_kwargs = kwargs
        policy_kwargs["verbosity"] = verbosity
        self._update_policy.update(self, arrays, **policy_kwargs)

    # ----------------- inference / sampling -----------------
    def infer_posterior(self, query, **kwargs) -> Tuple[jax.Array, jax.Array]:
        if self._inference is None:
            raise RuntimeError(
                "Call set_inference_method(...) before infer_posterior()."
            )
        q = self._normalize_query(query)
        pdf, samples = self._inference.infer_posterior(self, q, **kwargs)
        return _detach(pdf), _detach(samples)

    def infer_posterior_many(self, queries, **kwargs):
        """Answer several posterior queries in ONE device dispatch.

        Serving-path fusion: the active inference method's programs for all
        queries (possibly different targets / evidence key-sets, i.e.
        different compiled plans) are traced into a single XLA computation,
        amortizing the fixed dispatch cost across queries. Falls back to
        sequential per-query dispatch for methods whose host-side control
        flow cannot be fused (exact/RB fallback chains). Returns a list of
        (pdf, samples) pairs, one per query, in input order.
        """
        if self._inference is None:
            raise RuntimeError(
                "Call set_inference_method(...) before infer_posterior_many()."
            )
        qs = [self._normalize_query(q) for q in queries]
        results = None
        many = getattr(self._inference, "infer_posterior_many", None)
        if many is not None:
            results = many(self, qs, **kwargs)
        if results is None:
            results = [
                self._inference.infer_posterior(self, q, **kwargs) for q in qs
            ]
        return [
            (_detach(p), _detach(s))
            for p, s in results
        ]

    def infer_posterior_pmf(self, queries, *, n_classes, **kwargs):
        """Fused multi-query dispatch returning discrete posterior pmfs.

        For inference methods running in dynamic-mask mode, the weighted
        class histogram reduces ON DEVICE and only a ``[B, n_classes]``
        array crosses to host — the serving shape for discrete posterior
        queries (one dispatch + a kilobyte fetch per query batch). Returns
        ``(pmf_rows, spans)`` with UNNORMALIZED rows. When the active
        method has no fused pmf path the call degrades INTERNALLY to
        ``infer_posterior_many`` plus the host-side weighted histogram
        (identical semantics, same return contract) — callers never see
        None and carry no fallback branches.
        """
        if self._inference is None:
            raise RuntimeError(
                "Call set_inference_method(...) before infer_posterior_pmf()."
            )
        fused = getattr(self._inference, "infer_posterior_pmf", None)
        qs = [self._normalize_query(q) for q in queries]
        out = None
        if fused is not None:
            out = fused(self, qs, n_classes=n_classes, **kwargs)
        self._last_summary_path = "fused" if out is not None else "stream"
        if out is None:
            out = self._reduce_from_stream(qs, "pmf", int(n_classes), kwargs)
        return out

    def infer_posterior_moments(self, queries, **kwargs):
        """Fused multi-query dispatch returning posterior (mean, std) rows.

        Continuous-target counterpart of ``infer_posterior_pmf``: moments
        reduce on device, only ``[B, 2]`` crosses to host. Returns
        ``(moments, spans)``; methods without a fused moments path degrade
        internally to ``infer_posterior_many`` + the ``_posterior_stats``
        host reduction (same contract, never None).
        """
        if self._inference is None:
            raise RuntimeError(
                "Call set_inference_method(...) before "
                "infer_posterior_moments()."
            )
        fused = getattr(self._inference, "infer_posterior_moments", None)
        qs = [self._normalize_query(q) for q in queries]
        out = None
        if fused is not None:
            out = fused(self, qs, **kwargs)
        self._last_summary_path = "fused" if out is not None else "stream"
        if out is None:
            out = self._reduce_from_stream(qs, "mom", None, kwargs)
        return out

    def _reduce_from_stream(self, qs, kind: str, n_classes, kwargs):
        """Host-side posterior reduction over the stream path.

        Internal fallback for ``infer_posterior_pmf`` / ``_moments`` when
        the active method has no fused on-device reduction: runs the
        queries through ``infer_posterior_many``'s row-fused dispatch and
        reduces the fetched particle clouds on host with EXACTLY the
        fused paths' semantics (pmf: raw-weight class histogram on
        rounded/clipped draws; moments: normalized weights with in-graph
        uniform fallback, the ``_posterior_stats`` contract). Returns the
        same ``(rows, spans)`` shape so callers cannot tell the paths
        apart except by throughput.
        """
        many = getattr(self._inference, "infer_posterior_many", None)
        call_kw = dict(kwargs)
        # The row-fused dispatch traces one program PER query into a
        # single XLA computation — safe for serving-sized lists, but a
        # large list of (possibly duplicate) queries on a big network
        # would build a pathological trace (256 copies of a 724-node
        # sweep compiles for hours). The fallback favors robustness:
        # fuse small lists, run big ones sequentially through the ONE
        # cached per-plan program.
        if many is not None and len(qs) <= 16:
            results = many(self, qs, **call_kw)
        else:
            results = None
        if results is None:
            call_kw.pop("pad_bucket", None)
            results = [
                self._inference.infer_posterior(self, q, **call_kw)
                for q in qs
            ]
        node_to_idx = {
            n: i for i, n in enumerate(self.dag.topological_order())
        }
        rows, spans, at = [], [], 0
        for q, (pdf, samples) in zip(qs, results):
            w = np.maximum(
                np.nan_to_num(
                    np.asarray(pdf, np.float64), posinf=0.0, neginf=0.0
                ),
                0.0,
            )
            x = np.asarray(samples, np.float64)[..., 0]
            b = w.shape[0]
            if kind == "pmf":
                k = int(n_classes)
                cls = np.clip(np.rint(x).astype(np.int64), 0, k - 1)
                pmf = np.zeros((b, k))
                np.add.at(
                    pmf,
                    (
                        np.repeat(np.arange(b), w.shape[1]),
                        cls.reshape(-1),
                    ),
                    w.reshape(-1),
                )
                rows.append(pmf)
            else:
                denom = w.sum(axis=1, keepdims=True)
                wn = np.where(
                    denom > 1e-12,
                    w / np.maximum(denom, 1e-12),
                    np.full_like(w, 1.0 / max(1, w.shape[1])),
                )
                mean = (wn * x).sum(axis=1)
                var = (wn * (x - mean[:, None]) ** 2).sum(axis=1)
                rows.append(
                    np.stack([mean, np.sqrt(np.maximum(var, 0.0))], axis=1)
                )
            spans.append((at, at + b, node_to_idx[q.target]))
            at += b
        return np.concatenate(rows, axis=0), spans

    def _posterior_stats(
        self, pdf: jax.Array, samples: jax.Array, *, eps: float = 1e-12
    ) -> Dict[str, jax.Array]:
        pdf = jnp.asarray(pdf)
        samples = jnp.asarray(samples)
        if pdf.ndim != 2:
            raise ValueError(f"Expected pdf [B,S], got {pdf.shape}")
        if samples.ndim != 3:
            raise ValueError(f"Expected samples [B,S,D], got {samples.shape}")
        if pdf.shape[:2] != samples.shape[:2]:
            raise ValueError("pdf and samples shapes are incompatible.")
        w = jnp.maximum(jnp.nan_to_num(pdf, nan=0.0, posinf=0.0, neginf=0.0), 0.0)
        denom = jnp.sum(w, axis=1, keepdims=True)
        uniform = jnp.full_like(w, 1.0 / max(1, w.shape[1]))
        w = jnp.where(denom > eps, w / jnp.maximum(denom, eps), uniform)
        mean = jnp.sum(w[..., None] * samples, axis=1)
        var = jnp.sum(w[..., None] * (samples - mean[:, None, :]) ** 2, axis=1)
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        ess = 1.0 / jnp.maximum(jnp.sum(w**2, axis=1), eps)
        return {"mean": mean, "std": std, "ess": ess}

    @staticmethod
    def _broadcast_batch(a: jax.Array, b: jax.Array):
        if a.shape[0] == b.shape[0]:
            return a, b
        if a.shape[0] == 1:
            return jnp.broadcast_to(a, (b.shape[0],) + a.shape[1:]), b
        if b.shape[0] == 1:
            return a, jnp.broadcast_to(b, (a.shape[0],) + b.shape[1:])
        raise ValueError(
            "Query and reference batch sizes must match, unless one is 1."
        )

    def infer_relative(
        self, query, reference_query=None, *, eps: float = 1e-12, **kwargs
    ) -> Dict[str, Any]:
        q = self._normalize_query(query)
        if reference_query is None:
            reference_query = Query(target=q.target, evidence={}, do={})
        rq = self._normalize_query(reference_query)
        if rq.target != q.target:
            raise ValueError(
                "query and reference_query must have the same target node."
            )
        # One fused dispatch for (query, reference) when the method
        # supports it; sequential otherwise.
        (query_pdf, query_samples), (ref_pdf, ref_samples) = (
            self.infer_posterior_many([q, rq], **kwargs)
        )
        qs = self._posterior_stats(query_pdf, query_samples, eps=eps)
        rs = self._posterior_stats(ref_pdf, ref_samples, eps=eps)
        q_mean, r_mean = self._broadcast_batch(qs["mean"], rs["mean"])
        q_std, r_std = self._broadcast_batch(qs["std"], rs["std"])
        q_ess, r_ess = self._broadcast_batch(qs["ess"], rs["ess"])
        delta_mean = q_mean - r_mean
        delta_std = q_std - r_std
        rel_mean = delta_mean / jnp.maximum(jnp.abs(r_mean), eps)
        rel_std = delta_std / jnp.maximum(jnp.abs(r_std), eps)
        return {
            "target": q.target,
            "query_stats": {
                "mean": q_mean,
                "std": q_std,
                "effective_sample_size": q_ess,
            },
            "reference_stats": {
                "mean": r_mean,
                "std": r_std,
                "effective_sample_size": r_ess,
            },
            "delta_mean": delta_mean,
            "delta_std": delta_std,
            "relative_mean_change": rel_mean,
            "relative_std_change": rel_std,
        }

    def sample(self, query, n_samples: int = 200, **kwargs):
        if self._sampling is None:
            raise RuntimeError("Call set_sampling_method(...) before sample().")
        q = self._normalize_query(query)
        samples = self._sampling.sample(self, q, n_samples=n_samples, **kwargs)
        if isinstance(samples, dict):
            return {k: _detach(v) for k, v in samples.items()}
        return _detach(samples)

    def _normalize_query(self, query) -> Query:
        if isinstance(query, Query):
            target = query.target
            evidence_src = query.evidence
            do_src = query.do or {}
        elif isinstance(query, dict):
            target = query.get("target") or query.get("target_feature")
            if target is None:
                raise ValueError("query must contain 'target'")
            evidence_src = query.get("evidence") or {}
            do_src = query.get("do") or {}
        else:
            raise TypeError("query must be a dict or Query")
        # Host-side (numpy) coercion: query values cross to the device once,
        # at the jit call boundary, not as per-node eager transfers.
        evidence = {k: ensure_2d_np(v) for k, v in evidence_src.items()}
        do = {k: ensure_2d_np(v) for k, v in do_src.items()}
        nodes = set(self.dag.nodes())
        if target not in nodes:
            raise ValueError(f"Unknown target node {target!r}.")
        unknown = (set(evidence) | set(do)) - nodes
        if unknown:
            raise ValueError(f"Unknown query nodes: {sorted(unknown)}")
        overlap = set(evidence) & set(do)
        if overlap:
            raise ValueError(
                f"Nodes cannot be in both evidence and do: {sorted(overlap)}"
            )
        infer_batch_size(evidence, do)
        return Query(target=target, evidence=evidence, do=do)

    # ----------------- device management -----------------
    def set_mesh(self, mesh) -> None:
        """Attach a ('data', 'particle') jax Mesh; subsequent inference/
        sampling programs compile with batch/particle sharding constraints
        (see ``parallel/mesh.py``). Pass None to return to single-device."""
        self._mesh = mesh

    def to_device(self, device) -> None:
        """Place all parameter pytrees on a device (jax.Device or platform str)."""
        if isinstance(device, str):
            device = jax.devices(device)[0]
        self.params = jax.device_put(self.params, device)
        self.device = str(device)
        if self._update_policy is not None and hasattr(
            self._update_policy, "to_device"
        ):
            self._update_policy.to_device(device)

    # ----------------- CPD access -----------------
    def cpd(self, node: str) -> CPDHandle:
        return CPDHandle(self, node)

    def get_cpd(self, node: str) -> CPDHandle:
        return CPDHandle(self, node)

    def get_cpds(self) -> Dict[str, CPDHandle]:
        return {node: CPDHandle(self, node) for node in self.dag.nodes()}

    # ----------------- persistence -----------------
    def save(
        self,
        path: str,
        *,
        include_configs: bool = True,
        extra: Optional[dict] = None,
    ) -> None:
        missing = [n for n in self.dag.nodes() if n not in self.nodes]
        if missing:
            raise RuntimeError(
                f"Cannot save model with missing CPDs for nodes: {missing}"
            )
        if include_configs:
            for label, cfg in [
                ("learning", self._learning_config),
                ("inference", self._inference_config),
                ("sampling", self._sampling_config),
                ("update", self._update_config),
            ]:
                if cfg and cfg.get("callable"):
                    raise ValueError(
                        f"Cannot serialize callable {label} method: "
                        f"{cfg.get('name')}"
                    )
        checkpoint_path, meta_path = _resolve_checkpoint_paths(path)

        dag_info = {
            "nodes": list(self.dag.nodes()),
            "edges": [list(e) for e in self.dag.edges()],
            "topological_order": list(self.dag.topological_order()),
            "parents": {n: list(self.dag.parents(n)) for n in self.dag.nodes()},
        }
        nodes_meta: Dict[str, Dict] = {}
        arrays: Dict[str, np.ndarray] = {}
        for node in self.dag.topological_order():
            cpd = self.nodes[node]
            nodes_meta[node] = {
                "cpd_key": cpd.registry_key,
                "class_name": type(cpd).__name__,
                "input_dim": cpd.input_dim,
                "output_dim": cpd.output_dim,
                "seed": self.seed,
                "init_kwargs": cpd.get_init_kwargs() or {},
                "extra_state": cpd.get_extra_state(),
            }
            flat = _flatten_pytree(self.params[node])
            for pkey, arr in flat.items():
                arrays[f"{node}\x1f{pkey}"] = np.asarray(arr)
        meta = {
            "vbn_version": __version__,
            "jax_version": jax.__version__,
            "dtype": "float32",
            "seed": self.seed,
            "prng_impl": self.prng_impl,
            "rng_counter": self._keys.state(),
        }
        structure = {"dag": dag_info, "nodes": nodes_meta, "meta": meta}
        if self.amortized is not None:
            structure["amortized_spec"] = self.amortized["spec"].to_dict()
            for pkey, arr in _flatten_pytree(self.amortized["net"]).items():
                arrays[f"__amortized__\x1f{pkey}"] = np.asarray(arr)
        if extra is not None:
            structure["extra"] = extra
        if include_configs:
            structure["config"] = {
                "learning": self._learning_config,
                "inference": self._inference_config,
                "sampling": self._sampling_config,
                "update": self._update_config,
            }
            if self._update_policy is not None and hasattr(
                self._update_policy, "get_state"
            ):
                state_meta, state_arrays = self._update_policy.get_state()
                structure["update_state"] = state_meta
                for pkey, arr in state_arrays.items():
                    arrays[f"__update__\x1f{pkey}"] = np.asarray(arr)

        buf = io.BytesIO()
        np.savez(
            buf,
            __structure__=np.frombuffer(
                json.dumps(structure).encode("utf-8"), dtype=np.uint8
            ),
            **arrays,
        )
        with open(checkpoint_path, "wb") as f:
            f.write(buf.getvalue())
        if meta_path is not None:
            summary = {
                "meta": meta,
                "dag": dag_info,
                "nodes": {
                    k: {"cpd_key": v["cpd_key"]} for k, v in nodes_meta.items()
                },
                "config": structure.get("config"),
            }
            with open(meta_path, "w", encoding="utf-8") as f:
                json.dump(summary, f, indent=2)

    @classmethod
    def load(cls, path: str, *, map_location=None) -> "VBN":
        import networkx as nx

        if os.path.isdir(path):
            checkpoint_path = os.path.join(path, "checkpoint.npz")
        else:
            checkpoint_path = path
        with np.load(checkpoint_path, allow_pickle=False) as data:
            structure = json.loads(bytes(data["__structure__"]).decode("utf-8"))
            arrays = {
                k: data[k] for k in data.files if k != "__structure__"
            }
        dag_info = structure.get("dag", {})
        g = nx.DiGraph()
        g.add_nodes_from(dag_info.get("nodes", []))
        g.add_edges_from([tuple(e) for e in dag_info.get("edges", [])])
        meta = structure.get("meta", {})
        vbn = cls(g, seed=meta.get("seed"), prng_impl=meta.get("prng_impl"))
        vbn._keys.set_state(meta.get("rng_counter", 0))

        config = structure.get("config") or {}
        learning_cfg = config.get("learning")
        if learning_cfg and learning_cfg.get("name"):
            vbn.set_learning_method(
                learning_cfg["name"],
                nodes_cpds=learning_cfg.get("nodes_cpds"),
                **(learning_cfg.get("params") or {}),
            )
        inference_cfg = config.get("inference")
        if inference_cfg and inference_cfg.get("name"):
            vbn.set_inference_method(
                inference_cfg["name"], **(inference_cfg.get("params") or {})
            )
        sampling_cfg = config.get("sampling")
        if sampling_cfg and sampling_cfg.get("name"):
            vbn.set_sampling_method(
                sampling_cfg["name"], **(sampling_cfg.get("params") or {})
            )
        update_cfg = config.get("update")
        if update_cfg and update_cfg.get("name"):
            update_cls = UPDATE_REGISTRY.get(update_cfg["name"])
            if update_cls is None:
                raise ValueError(
                    f"Unknown update method {update_cfg['name']!r} in checkpoint"
                )
            vbn._update_policy = update_cls(**(update_cfg.get("init_kwargs") or {}))
            vbn._update_config = update_cfg

        node_arrays: Dict[str, Dict[str, np.ndarray]] = {}
        update_arrays: Dict[str, np.ndarray] = {}
        amortized_arrays: Dict[str, np.ndarray] = {}
        for full_key, arr in arrays.items():
            owner, pkey = full_key.split("\x1f", 1)
            if owner == "__update__":
                update_arrays[pkey] = arr
            elif owner == "__amortized__":
                amortized_arrays[pkey] = arr
            else:
                node_arrays.setdefault(owner, {})[pkey] = arr

        amortized_spec = structure.get("amortized_spec")
        if amortized_spec is not None and amortized_arrays:
            from .learning.amortized import AmortizedSpec

            vbn.amortized = {
                "spec": AmortizedSpec.from_dict(amortized_spec),
                "net": _unflatten_pytree(amortized_arrays),
            }

        for node, info in structure.get("nodes", {}).items():
            cpd_key = info.get("cpd_key")
            if cpd_key not in CPD_REGISTRY:
                raise ValueError(f"Unknown CPD key {cpd_key!r} for node {node!r}")
            cpd = CPD_REGISTRY[cpd_key](
                int(info.get("input_dim", 0)),
                int(info.get("output_dim", 1)),
                seed=info.get("seed", meta.get("seed")),
                **(info.get("init_kwargs") or {}),
            )
            if info.get("extra_state") is not None:
                cpd.set_extra_state(info["extra_state"])
            vbn.nodes[node] = cpd
            vbn.params[node] = _unflatten_pytree(node_arrays.get(node, {}))

        update_state = structure.get("update_state")
        if vbn._update_policy is not None and update_state is not None:
            if hasattr(vbn._update_policy, "set_state"):
                vbn._update_policy.set_state(update_state, update_arrays)
        return vbn


def _resolve_checkpoint_paths(path: str):
    _, ext = os.path.splitext(path)
    if ext in {".npz", ".pt", ".pth", ".ckpt"}:
        return path, None
    os.makedirs(path, exist_ok=True)
    return os.path.join(path, "checkpoint.npz"), os.path.join(path, "meta.json")


def _flatten_pytree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict/list pytree of arrays into {'a/b/#0/c': array}.

    List/tuple entries use '#<index>' path components so the structure
    round-trips without pickling (npz stays allow_pickle=False).
    """
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_pytree(v, f"{prefix}#{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_pytree(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.startswith("#") for k in node):
            return [node[f"#{i}"] for i in range(len(node))]
        return node

    return listify(root)
