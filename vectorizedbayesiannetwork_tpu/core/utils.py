"""Tensor/host utilities for the TPU-native VBN.

Functional analogue of the reference's ``vbn/core/utils.py:10-128`` and
``vbn/utils/__init__.py:18-61``, redesigned for JAX: no device moves (device
placement is a sharding concern, see ``parallel/``), explicit PRNG keys, and
numpy-friendly coercion at the API boundary only.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def resolve_verbosity(verbose: Optional[int] = None) -> int:
    """Resolve verbosity from arg or the VBN_VERBOSITY env var (default 0)."""
    if verbose is not None:
        return int(verbose)
    env = os.environ.get("VBN_VERBOSITY", "")
    try:
        return int(env)
    except ValueError:
        return 0


def as_array(value, dtype=jnp.float32) -> jax.Array:
    """Coerce python/numpy/jax input to a jnp array of the given dtype."""
    if isinstance(value, jax.Array):
        return value.astype(dtype) if value.dtype != dtype else value
    return jnp.asarray(np.asarray(value), dtype=dtype)


def ensure_2d(x, dtype=jnp.float32) -> jax.Array:
    """Coerce to [B, D]: scalars -> [1,1], 1-D -> [B,1]."""
    arr = as_array(x, dtype)
    if arr.ndim == 0:
        return arr.reshape(1, 1)
    if arr.ndim == 1:
        return arr.reshape(-1, 1)
    if arr.ndim == 2:
        return arr
    raise ValueError(f"Expected scalar/1D/2D value, got shape {arr.shape}")


def ensure_2d_np(x, dtype=np.float32) -> np.ndarray:
    """Host-side ``ensure_2d``: coerce to a numpy [B, D] array.

    Keeps user-facing query values on the host so the serving path pays one
    host→device transfer at the jit boundary instead of eager device ops per
    evidence node (measured ~1 ms/call through the TPU transfer path).
    """
    arr = np.asarray(x, dtype=dtype)
    if arr.ndim == 0:
        return arr.reshape(1, 1)
    if arr.ndim == 1:
        return arr.reshape(-1, 1)
    if arr.ndim == 2:
        return arr
    raise ValueError(f"Expected scalar/1D/2D value, got shape {arr.shape}")


def broadcast_samples(x: jax.Array, n_samples: int) -> jax.Array:
    """[B, D] -> [B, S, D] by broadcast along a new sample axis."""
    if x.ndim != 2:
        raise ValueError(f"broadcast_samples expects [B,D], got {x.shape}")
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], n_samples, x.shape[1]))


def flatten_samples(x: jax.Array):
    """[B, S, D] -> ([B*S, D], B, S)."""
    b, s, d = x.shape
    return x.reshape(b * s, d), b, s


def unflatten_samples(x: jax.Array, b: int, s: int) -> jax.Array:
    return x.reshape(b, s, x.shape[-1])


def df_to_array_dict(df) -> Dict[str, np.ndarray]:
    """pandas DataFrame -> {column: float32 ndarray [N, 1]} (host-side)."""
    out = {}
    for col in df.columns:
        arr = np.asarray(df[col].to_numpy(), dtype=np.float32).reshape(len(df), 1)
        out[col] = arr
    return out


def concat_parents(
    data: Mapping[str, np.ndarray], parents
) -> Optional[np.ndarray]:
    """Concatenate parent columns along the feature axis; None for roots.

    Analogue of the reference's ``vbn/utils/__init__.py:37-43``.
    """
    if not parents:
        return None
    return np.concatenate([np.asarray(data[p]) for p in parents], axis=-1)


def infer_batch_size(*mappings: Mapping[str, object]) -> int:
    """Batch size B shared by all evidence/do entries (validated consistent).

    Analogue of ``vbn/utils/__init__.py:46-61``.
    """
    b = None
    for mapping in mappings:
        if not mapping:
            continue
        for name, value in mapping.items():
            # Shape-only inspection: never move values to the device here
            # (this runs on every public query call).
            arr = ensure_2d_np(value)
            if b is None:
                b = int(arr.shape[0])
            elif int(arr.shape[0]) != b:
                raise ValueError(
                    f"Inconsistent batch sizes in query: {name} has "
                    f"{arr.shape[0]}, expected {b}"
                )
    return 1 if b is None else b


def to_plain_dict(obj) -> dict:
    """Recursively convert arrays to lists for JSON-serializable summaries."""
    if isinstance(obj, Mapping):
        return {k: to_plain_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(to_plain_dict(v) for v in obj)
    if isinstance(obj, (jax.Array, np.ndarray)):
        arr = np.asarray(obj)
        if arr.size > 64:
            return {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        return arr.tolist()
    return obj
