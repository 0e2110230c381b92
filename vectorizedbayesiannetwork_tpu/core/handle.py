"""Read-only per-node CPD façade.

Capability parity with ``/root/reference/vbn/core/cpd_handle.py:121-428``:
dict-or-array parent coercion, sample / log_prob / pdf / forward,
``conditional()`` with duck-typed parameter extraction (normal / mixture /
categorical / empirical), ``conditional_mean_std``, summary/export/clone.
Duck typing here is protocol-based: CPD specs optionally expose
``conditional_params`` (Gaussian), ``mixture_params`` (MDN) or
``categorical_probs`` (discrete families) as pure functions of
``(params, parents)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .base import CPDOutput
from .utils import as_array, ensure_2d


class CPDHandle:
    def __init__(self, vbn, node: str) -> None:
        if node not in vbn.dag.nodes():
            raise ValueError(f"Unknown node {node!r}")
        self.vbn = vbn
        self.node = node

    @property
    def cpd(self):
        return self.vbn.cpd_spec(self.node)

    @property
    def params(self):
        return self.vbn.params[self.node]

    @property
    def parents(self):
        return self.vbn.dag.parents(self.node)

    # -- parent coercion -----------------------------------------------------
    def _coerce_parents(self, parents) -> Optional[jnp.ndarray]:
        cpd = self.cpd
        if cpd.input_dim == 0:
            return None
        if parents is None:
            raise ValueError(
                f"Node {self.node!r} requires parent values for "
                f"{list(self.parents)}"
            )
        if isinstance(parents, dict):
            cols = []
            for p in self.parents:
                if p not in parents:
                    raise ValueError(f"Missing parent value for {p!r}")
                cols.append(ensure_2d(parents[p]))
            b = max(c.shape[0] for c in cols)
            cols = [
                jnp.broadcast_to(c, (b, c.shape[1])) if c.shape[0] == 1 else c
                for c in cols
            ]
            arr = jnp.concatenate(cols, axis=-1)
        else:
            arr = ensure_2d(parents)
        if arr.shape[-1] != cpd.input_dim:
            raise ValueError(
                f"Expected parent dim {cpd.input_dim}, got {arr.shape[-1]}"
            )
        return arr

    # -- compute -------------------------------------------------------------
    def sample(self, parents=None, n_samples: int = 100):
        arr = self._coerce_parents(parents)
        return self.cpd.sample(self.params, self.vbn.next_key(), arr, n_samples)

    def conditional_samples(self, parents=None, n_samples: int = 100):
        return self.sample(parents, n_samples)

    def log_prob(self, x, parents=None):
        arr = self._coerce_parents(parents)
        return self.cpd.log_prob(self.params, as_array(x), arr)

    def pdf(self, x, parents=None):
        return jnp.exp(self.log_prob(x, parents))

    def forward(self, parents=None, n_samples: int = 100) -> CPDOutput:
        arr = self._coerce_parents(parents)
        return self.cpd.forward(
            self.params, self.vbn.next_key(), arr, n_samples
        )

    # -- exact conditional extraction ----------------------------------------
    def conditional(
        self, parents=None, n_samples: int = 256
    ) -> Dict[str, Any]:
        """Closed-form conditional if the family exposes one, else empirical."""
        cpd = self.cpd
        arr = self._coerce_parents(parents)
        flat = None if arr is None else jnp.asarray(arr)
        if hasattr(cpd, "mixture_params"):
            import jax

            logits, loc, scale = cpd.mixture_params(self.params, flat)
            return {
                "type": "mixture_params",
                "log_weights": jax.nn.log_softmax(logits, axis=-1),
                "weights": jax.nn.softmax(logits, axis=-1),
                "loc": loc,
                "scale": scale,
            }
        if hasattr(cpd, "categorical_probs"):
            probs = cpd.categorical_probs(self.params, flat)
            out = {"type": "categorical_probs", "probs": probs}
            if hasattr(cpd, "support_values"):
                out["support"] = cpd.support_values(self.params)
            return out
        if hasattr(cpd, "conditional_params"):
            loc, scale = cpd.conditional_params(self.params, flat)
            return {"type": "normal_params", "loc": loc, "scale": scale}
        samples = self.sample(parents, n_samples)
        return {"type": "empirical_samples", "samples": samples}

    def conditional_mean_std(self, parents=None, n_samples: int = 256):
        cond = self.conditional(parents, n_samples)
        if cond["type"] == "normal_params":
            return cond["loc"], cond["scale"]
        if cond["type"] == "mixture_params":
            w = cond["weights"][..., None]
            mean = jnp.sum(w * cond["loc"], axis=-2)
            second = jnp.sum(
                w * (cond["scale"] ** 2 + cond["loc"] ** 2), axis=-2
            )
            return mean, jnp.sqrt(jnp.maximum(second - mean**2, 1e-12))
        if cond["type"] == "categorical_probs":
            probs = cond["probs"]
            support = cond.get(
                "support",
                jnp.arange(probs.shape[-1], dtype=jnp.float32),
            )
            support = jnp.asarray(support, jnp.float32)
            mean = jnp.sum(probs * support, axis=-1, keepdims=True)
            second = jnp.sum(probs * support**2, axis=-1, keepdims=True)
            return mean, jnp.sqrt(jnp.maximum(second - mean**2, 1e-12))
        samples = cond["samples"]
        return jnp.mean(samples, axis=1), jnp.std(samples, axis=1)

    # -- introspection -------------------------------------------------------
    def summary(self) -> Dict[str, Any]:
        cpd = self.cpd
        n_params = int(
            sum(
                np.prod(np.shape(x))
                for x in _iter_leaves(self.params)
            )
        )
        return {
            "node": self.node,
            "cpd": cpd.registry_key,
            "class": type(cpd).__name__,
            "input_dim": cpd.input_dim,
            "output_dim": cpd.output_dim,
            "parents": list(self.parents),
            "n_parameters": n_params,
            "init_kwargs": cpd.get_init_kwargs(),
        }

    def export_config(self) -> Dict[str, Any]:
        return {"cpd": self.cpd.registry_key, **(self.cpd.get_init_kwargs() or {})}

    def state_dict(self) -> Dict[str, Any]:
        return self.params

    def clone_cpd(self):
        """Return (spec, deep-copied params) for standalone use."""
        import copy

        import jax

        return copy.copy(self.cpd), jax.tree_util.tree_map(
            lambda x: jnp.array(x), self.params
        )


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    elif tree is not None:
        yield tree
