"""Device-mesh management and sharding annotations.

The reference has NO distributed backend (SURVEY.md §2, §5.8) — its only
parallelism is intra-device vectorization over the query-batch axis B and
particle axis S. Here those become first-class mesh axes:

    mesh axes: ('data', 'particle')
    packed sweep tensors [B, S, total_dim] -> P('data', 'particle', None)

Annotating the per-node value tensors inside the compiled sweep is enough
for XLA to shard every CPD kernel and insert the collectives at the
reduction points (weight softmax/ESS/moments over the particle axis ->
psum over 'particle'; fit-time sufficient stats over rows -> psum over
'data'). JAX's partitionable threefry makes in-sweep RNG shard-local, so
no RNG state crosses the ICI.

Multi-host: initialize jax.distributed before building the mesh; the same
annotations then span hosts (collectives ride ICI within a slice, DCN
across).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PARTICLE_AXIS = "particle"

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(
    n_data: int = 1,
    n_particle: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'particle') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_particle is None:
        if len(devices) % n_data != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_data={n_data}"
            )
        n_particle = len(devices) // n_data
    use = devices[: n_data * n_particle]
    grid = np.array(use).reshape(n_data, n_particle)
    return Mesh(grid, (DATA_AXIS, PARTICLE_AXIS))


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def active_mesh(mesh: Optional[Mesh]):
    """Trace-time context: sweep kernels read this to place constraints."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def mesh_signature(mesh: Optional[Mesh]) -> tuple:
    if mesh is None:
        return ()
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


def constrain_bsd(x: jax.Array) -> jax.Array:
    """Constrain a [B, S, D] tensor to P('data', 'particle', None)."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, PARTICLE_AXIS, None))
    )


def constrain_bs(x: jax.Array) -> jax.Array:
    """Constrain a [B, S] tensor to P('data', 'particle')."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, PARTICLE_AXIS))
    )


def constrain_rows(x: jax.Array) -> jax.Array:
    """Constrain a data matrix [N, D] to row sharding over BOTH mesh axes.

    Used for fit-time data parallelism: sufficient-stat reductions over rows
    become a psum over the whole mesh.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P((DATA_AXIS, PARTICLE_AXIS), None))
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
