"""Core abstractions: Query, CPDOutput, and the functional CPD contract.

Capability parity with the reference's ``vbn/core/base.py:11-108`` redesigned
TPU-first: a CPD here is a *static spec object* (hashable, host-side) whose
tensor state lives entirely in an explicit JAX pytree of parameters, and whose
compute methods are pure functions of ``(params, key, inputs)`` — directly
jittable, vmappable and shardable. There is no hidden RNG state (the reference
seeds a global ``torch.manual_seed``), no module mutation, and no device
attribute: placement is a sharding annotation, not an object property.

Shape conventions (identical to the reference):
  - fit data:        parents [N, Din] (or None for roots), x [N, Dout]
  - sample:          parents [B, Din] | [B, S, Din] | None  ->  [B, S, Dout]
  - log_prob:        x [B, S, Dout], parents like sample    ->  [B, S]

Subclasses implement the *flat* primitives, which the compiled inference sweep
calls directly on ``[B*S, ...]`` tensors (one fused program per DAG plan):
  - ``_sample_flat(params, key, parents2d|None, m) -> [m, Dout]``
  - ``_log_prob_flat(params, x2d, parents2d|None) -> [m]``
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .utils import as_array, broadcast_samples, ensure_2d

Params = Any  # a JAX pytree (nested dict of arrays)


class CPDOutput(NamedTuple):
    samples: jax.Array  # [B, S, Dx]
    log_prob: jax.Array  # [B, S]
    pdf: jax.Array  # [B, S]


@dataclass
class Query:
    """Posterior query: evidence conditions; do clamps without likelihood.

    Parity: ``vbn/core/base.py:18-25``.
    """

    target: str
    evidence: Dict[str, Any]
    do: Dict[str, Any] = field(default_factory=dict)


class BaseCPD(ABC):
    """Static CPD spec. All array state lives in a params pytree.

    The spec (dims + hyperparameters + any fit-time-resolved static shape
    info) determines compiled program structure; ``static_signature()`` is
    the cache key used by the inference-plan compiler.
    """

    registry_key: str = "?"

    def __init__(
        self, input_dim: int, output_dim: int, *, seed: Optional[int] = None
    ) -> None:
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)
        self.seed = 0 if seed is None else int(seed)

    # -- static identity ----------------------------------------------------
    def _static_fields(self) -> tuple:
        """Extra static fields contributing to the compiled-program identity."""
        return ()

    def static_signature(self) -> tuple:
        return (
            type(self).__name__,
            self.input_dim,
            self.output_dim,
            self._static_fields(),
        )

    def _eval_params(self, params: Params) -> Params:
        """Subtree of ``params`` needed by sample/log_prob (not fit/update).

        Level-grouped evaluation (``inference/_sweep.py``) stacks the eval
        params of same-signature nodes leaf-by-leaf; optimizer state (the
        ``"opt"`` entry the NN CPDs persist alongside their weights) is
        dropped both to keep tree structures stackable — ``opt`` is None
        before the first gradient step — and to avoid feeding unused arrays
        into the compiled sweep.
        """
        if isinstance(params, dict) and "opt" in params:
            return {k: v for k, v in params.items() if k != "opt"}
        return params

    # -- lifecycle ----------------------------------------------------------
    @abstractmethod
    def init(self, key: jax.Array) -> Params:
        """Create the initial parameter pytree."""

    @abstractmethod
    def fit(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        **kwargs,
    ) -> Params:
        """Fit from data; returns new params (may refine static spec fields)."""

    def update(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        **kwargs,
    ) -> Params:
        """Online update; default = refit (closed-form CPDs override/alias)."""
        return self.fit(params, key, parents, x, **kwargs)

    def update_program(self, conf: Dict) -> Optional[Callable]:
        """Pure jittable ``fn(params, key, parents, x) -> params``
        implementing ``update(**conf)``, or None when the update needs
        host-side work (spec refinement, data-dependent shapes, host
        syncs). Update policies fuse a whole network's per-node updates
        into ONE compiled dispatch when every node provides a program —
        the streaming-update serving path (a small-batch update then
        costs one async dispatch, not a per-node eager op stream)."""
        return None

    def update_host_precheck(
        self, params: Params, parents: Optional[jax.Array], x: jax.Array
    ) -> None:
        """Cheap host-side (numpy) validation run before a fused update
        dispatch — raises where the eager path would."""
        return None

    # -- pure compute primitives (flat) --------------------------------------
    @abstractmethod
    def _sample_flat(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        m: int,
    ) -> jax.Array:
        """One draw per row: parents [m, Din] or None -> [m, Dout]."""

    @abstractmethod
    def _log_prob_flat(
        self, params: Params, x: jax.Array, parents: Optional[jax.Array]
    ) -> jax.Array:
        """x [m, Dout], parents [m, Din] or None -> [m]."""

    # -- public [B, S, D] API -------------------------------------------------
    def _coerce_parents(self, parents, n_samples: int):
        """Normalize parents to ([B*S, Din] or None, B, S)."""
        if self.input_dim == 0:
            if parents is None:
                return None, 1, n_samples
            arr = as_array(parents)
            b = int(arr.shape[0]) if arr.ndim >= 1 else 1
            return None, b, n_samples
        if parents is None:
            raise ValueError("parents cannot be None when input_dim > 0")
        arr = as_array(parents)
        if arr.ndim == 1:
            arr = ensure_2d(arr)
        if arr.ndim == 2:
            arr = broadcast_samples(arr, n_samples)
        if arr.ndim != 3:
            raise ValueError(f"Expected parents 1D/2D/3D, got {arr.shape}")
        if arr.shape[1] != n_samples:
            if arr.shape[1] == 1:
                arr = jnp.broadcast_to(
                    arr, (arr.shape[0], n_samples, arr.shape[2])
                )
            else:
                raise ValueError(
                    f"parents sample axis {arr.shape[1]} != n_samples {n_samples}"
                )
        if arr.shape[-1] != self.input_dim:
            raise ValueError(
                f"Expected parent dim {self.input_dim}, got {arr.shape[-1]}"
            )
        b, s, d = arr.shape
        return arr.reshape(b * s, d), b, s

    def sample(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        n_samples: int,
    ) -> jax.Array:
        flat, b, s = self._coerce_parents(parents, n_samples)
        out = self._sample_flat(params, key, flat, b * s)
        return out.reshape(b, s, self.output_dim)

    def log_prob(
        self, params: Params, x: jax.Array, parents: Optional[jax.Array]
    ) -> jax.Array:
        arr = as_array(x)
        if arr.ndim <= 2:
            arr = ensure_2d(arr)[:, None, :]
        b, s, d = arr.shape
        if d != self.output_dim:
            raise ValueError(f"Expected x dim {self.output_dim}, got {d}")
        flat, _, _ = self._coerce_parents(parents, s)
        lp = self._log_prob_flat(params, arr.reshape(b * s, d), flat)
        return lp.reshape(b, s)

    def forward(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        n_samples: int,
    ) -> CPDOutput:
        samples = self.sample(params, key, parents, n_samples)
        log_prob = self.log_prob(params, samples, parents)
        return CPDOutput(samples=samples, log_prob=log_prob, pdf=jnp.exp(log_prob))

    # -- persistence ----------------------------------------------------------
    def get_init_kwargs(self) -> Dict[str, Any]:
        """CPD-specific init kwargs for reconstruction (parity base.py:71-73)."""
        return {}

    def get_extra_state(self) -> Optional[Dict[str, Any]]:
        """Static (non-array) fit-time state, e.g. inferred class supports."""
        return None

    def set_extra_state(self, state: Optional[Dict[str, Any]]) -> None:
        return None
