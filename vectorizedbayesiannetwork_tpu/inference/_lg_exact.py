"""Mask-dynamic exact conditioning for all-linear-Gaussian networks.

The continuous counterpart of ``_exact_enum.py``: when every node is a
scalar linear-Gaussian CPD, the joint is Gaussian with moments computable
in closed form from the fitted params, and any ``p(target | evidence,
do(...))`` is an exact Gaussian. ONE compiled program per network answers
every query skeleton — including latent-parent queries the per-query
``gaussian_exact`` grid path must route to a sampling fallback
(``/root/reference/vbn/inference/gaussian_exact.py:14-183``).

TPU shape of the math (everything batched over query rows B, n = #nodes):
- structural system ``x = c + Bx + eps``: B strictly lower-triangular in
  topo order, assembled in-graph from each node's (weight, bias, var);
- do() surgery per row: zero the intervened rows of B, pin bias, zero
  noise — then ``A = (I - B)^-1`` via one batched unit-lower-triangular
  solve, ``mu = A c``, ``Sigma = A diag(d) A^T`` (batched GEMMs);
- evidence conditioning per row via the masked block system
  ``K = (e e^T) * Sigma + diag(1 - e)`` (= blockdiag(Sigma_EE, I) up to
  permutation, symmetric PD): two batched solves give the conditional
  mean for ALL nodes and the target variance without ever forming a
  row-dependent submatrix. Batched [B, n, n] Cholesky/LU at n <= ~hundreds
  is microseconds on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan


def lg_exact_supported(plan: InferencePlan, cpds: Sequence) -> bool:
    from ..models.linear_gaussian import LinearGaussianCPD

    return all(
        isinstance(c, LinearGaussianCPD) and plan.node_dims[i] == 1
        for i, c in enumerate(cpds)
    )


def make_lg_exact_fn(plan: InferencePlan, cpds: Sequence):
    """Pure ``fn(params_tuple, packed_in) -> (moments [B, 2],)``; keyless."""
    n = plan.n_nodes
    # Static scatter pattern: node i's j-th weight lands at B[i, parent_j].
    rows, cols, srcs = [], [], []
    for i in range(n):
        for j, p in enumerate(plan.parent_idx[i]):
            rows.append(i)
            cols.append(p)
            srcs.append((i, j))
    hi = jax.lax.Precision.HIGHEST

    def fn(params_tuple, packed_in):
        fixed, ev_mask, do_mask, target_idx = packed_in
        b = fixed.shape[0]
        eye = jnp.eye(n, dtype=jnp.float32)

        B = jnp.zeros((n, n), jnp.float32)
        if rows:
            B = B.at[jnp.array(rows), jnp.array(cols)].set(
                jnp.stack([params_tuple[i]["weight"][j, 0] for i, j in srcs])
            )
        c = jnp.stack([params_tuple[i]["bias"][0] for i in range(n)])
        d = jnp.stack(
            [
                jnp.maximum(
                    params_tuple[i]["var"][0],
                    jnp.float32(cpds[i].min_scale**2),
                )
                for i in range(n)
            ]
        )

        # Per-row do() surgery.
        offs = jnp.asarray(np.array(plan.node_offsets, np.int32))
        vals = jnp.take_along_axis(fixed, offs[None, :], axis=1)  # [B, n]
        Bb = B[None] * (1.0 - do_mask)[:, :, None]
        cb = jnp.where(do_mask > 0, vals, c[None, :])
        db = jnp.where(do_mask > 0, 1e-12, d[None, :])

        A = jax.scipy.linalg.solve_triangular(
            eye[None] - Bb, jnp.broadcast_to(eye, (b, n, n)),
            lower=True, unit_diagonal=True,
        )  # [B, n, n]
        mu = jnp.einsum("bij,bj->bi", A, cb, precision=hi)
        Sigma = jnp.einsum(
            "bik,bk,bjk->bij", A, db, A, precision=hi
        )

        # Evidence conditioning via the masked block system.
        e = ev_mask  # [B, n]
        m = 1.0 - e
        # K_ij = e_i e_j Sigma_ij + delta_ij (m_i + 1e-9 e_i)
        K = Sigma * (e[:, :, None] * e[:, None, :]) + eye[None] * (
            m + 1e-9 * e
        )[:, :, None]
        resid = e * (vals - mu)  # [B, n]
        g = jnp.linalg.solve(K, resid[..., None])[..., 0]  # [B, n]
        mean_all = mu + jnp.einsum(
            "bij,bj->bi", Sigma, e * g, precision=hi
        )

        tgt = jax.nn.one_hot(target_idx, n, dtype=jnp.float32)  # [B, n]
        st = jnp.einsum("bij,bj->bi", Sigma, tgt, precision=hi)  # Sigma[:,t]
        h = jnp.linalg.solve(K, (e * st)[..., None])[..., 0]
        var_t = jnp.sum(tgt * st, axis=1) - jnp.sum(st * (e * h), axis=1)
        mean_t = jnp.sum(tgt * mean_all, axis=1)

        # Target clamped by evidence/do -> degenerate posterior at the value.
        fx_t = jnp.sum(tgt * jnp.maximum(ev_mask, do_mask), axis=1)
        v_t = jnp.sum(tgt * vals, axis=1)
        mean_t = jnp.where(fx_t > 0, v_t, mean_t)
        std_t = jnp.where(
            fx_t > 0, 0.0, jnp.sqrt(jnp.maximum(var_t, 1e-12))
        )
        return (jnp.stack([mean_t, std_t], axis=1),)

    return fn
