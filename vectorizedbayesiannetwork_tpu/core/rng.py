"""Deterministic PRNG key derivation.

The reference relies on torch's global RNG (``vbn/core/base.py:40-43``) —
unusable under jit. Here every stochastic entry point receives an explicit
key; per-node / per-call subkeys are derived by counter-based ``fold_in`` so
that (a) results are bitwise reproducible for a given seed, and (b) random
bits generated inside a sharded program are computed shard-locally (JAX's
partitionable threefry), with no cross-device RNG state.
"""

from __future__ import annotations

import jax


def root_key(seed: int, impl: str = None) -> jax.Array:
    """Root key for ``seed``. ``impl=None`` is JAX's default (threefry —
    bitwise-reproducible, shard-partitionable). ``impl="rbg"`` swaps bit
    GENERATION to XLA's RngBitGenerator (key derivation stays threefry):
    draws differ from the default stream but are statistically sound.
    Measured on TPU v5e (MCM, B=256, S=1M): rbg is ~3x SLOWER than the
    partitionable threefry (76 vs 25 ms/batch) — keep the default on TPU;
    the knob exists for backends where RngBitGenerator wins (see
    BENCH_NOTES.md)."""
    if impl is None:
        return jax.random.PRNGKey(int(seed))
    # Typed key: the impl rides in the dtype, so downstream fold_in /
    # bit-generation dispatch to the right implementation (a raw uint32
    # array would be reinterpreted as a default-impl key).
    return jax.random.key(int(seed), impl=impl)


def fold(key: jax.Array, *indices: int) -> jax.Array:
    """Derive a subkey by folding in a sequence of integers."""
    for idx in indices:
        key = jax.random.fold_in(key, idx)
    return key


class KeyStream:
    """Host-side counter turning one root key into a deterministic stream.

    ``next()`` folds an incrementing counter into the root key. Unlike
    ``jax.random.split`` chains, the n-th key depends only on (seed, n), so
    call sites can be reordered during refactors without perturbing other
    draws.
    """

    def __init__(self, seed: int, impl: str = None) -> None:
        self._root = root_key(seed, impl)
        self._counter = 0

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._root, self._counter)
        self._counter += 1
        return key

    def next_spec(self):
        """(root_key, counter) for in-graph folding — same key bits as
        ``next()``, but the ``fold_in`` happens inside the consumer's jitted
        program, so advancing the stream costs zero eager device ops (the
        counter crosses as a 4-byte jit argument)."""
        import numpy as np

        counter = self._counter
        self._counter += 1
        return (self._root, np.uint32(counter))

    def state(self) -> int:
        return self._counter

    def set_state(self, counter: int) -> None:
        self._counter = int(counter)
