"""Sharded fit steps: data-parallel sufficient statistics & gradients.

The reference fits each CPD on a single device (SURVEY.md §3.1). Here the
fit-time reductions listed in SURVEY.md §5.8 — normal equations for
linear-Gaussian/RFF, standardization moments, minibatch gradients — are
expressed with row-sharded inputs so XLA turns every ``sum over rows`` into
a psum over the mesh. These entry points power the multi-chip dry run and
large-data fits.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models._optim import adam_step
from .mesh import DATA_AXIS, PARTICLE_AXIS, active_mesh, constrain_rows


def row_sharding(mesh) -> NamedSharding:
    return NamedSharding(mesh, P((DATA_AXIS, PARTICLE_AXIS), None))


def shard_rows(mesh, *arrays):
    """Place [N, D] arrays row-sharded across the whole mesh."""
    sh = row_sharding(mesh)
    out = tuple(jax.device_put(jnp.asarray(a, jnp.float32), sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def linear_gaussian_fit_step(mesh, parents: jax.Array, x: jax.Array,
                             ridge: float = 1e-6) -> Dict[str, jax.Array]:
    """Closed-form ridge fit with row-sharded data.

    The X^T X / X^T y contractions reduce over the sharded row axis, so the
    compiled program is: local partial Gram matrices -> psum over the mesh ->
    tiny replicated solve. Numerically equivalent to the lstsq path in
    ``models/linear_gaussian.py`` for well-conditioned problems.
    """

    @partial(jax.jit, out_shardings=None)
    def step(parents, x):
        parents = constrain_rows(parents)
        x = constrain_rows(x)
        n = parents.shape[0]
        ones = jnp.ones((n, 1), x.dtype)
        xa = jnp.concatenate([parents, ones], axis=1)
        din = parents.shape[1]
        reg = ridge * jnp.eye(din + 1, dtype=x.dtype)
        reg = reg.at[din, din].set(0.0)  # bias not regularized
        gram = xa.T @ xa + reg          # psum over rows
        rhs = xa.T @ x                  # psum over rows
        theta = jnp.linalg.solve(gram, rhs)
        resid = x - xa @ theta
        var = jnp.maximum(jnp.var(resid, axis=0), 1e-6)
        return {"weight": theta[:-1], "bias": theta[-1], "var": var}

    with active_mesh(mesh):
        return step(parents, x)


def gaussian_nn_dp_step(
    mesh,
    cpd,
    net,
    opt: Optional[Dict],
    parents: jax.Array,
    x: jax.Array,
    *,
    lr: float = 1e-3,
    weight_decay: float = 0.0,
) -> Tuple[Dict, Dict]:
    """One data-parallel NLL gradient step for a GaussianNN CPD.

    The batch is row-sharded; the mean-NLL gradient reduction is the psum.
    Params/optimizer state stay replicated.
    """
    from ..models._optim import adam_init

    if opt is None:
        opt = adam_init(net)

    @jax.jit
    def step(net, opt, parents, x):
        parents = constrain_rows(parents)
        x = constrain_rows(x)

        def loss_fn(net_):
            return cpd._nll(net_, parents, x)

        loss, grads = jax.value_and_grad(loss_fn)(net)
        net_new, opt_new = adam_step(net, grads, opt, lr, weight_decay)
        return net_new, opt_new, loss

    with active_mesh(mesh):
        net, opt, _ = step(net, opt, parents, x)
    return net, opt
