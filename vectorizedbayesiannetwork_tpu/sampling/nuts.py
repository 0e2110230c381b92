"""No-U-Turn Sampler with dynamic trajectory lengths (multinomial NUTS).

The reference's HMC (``/root/reference/vbn/sampling/hmc.py:19-141``) is a
fixed-trajectory placeholder with no NUTS; SURVEY.md §7 ranks "real NUTS"
as hard part 5. This implements the iterative tree-doubling scheme of
Hoffman & Gelman (2014) with the multinomial state selection of
Betancourt (2017), vectorized over B×n_chains chains in one XLA program:

- the outer doubling loop is a ``lax.while_loop`` over tree depth (all
  chains advance together; finished chains are frozen by masks),
- each doubling integrates ``2^depth`` leapfrog steps from the randomly
  chosen trajectory edge with a ``lax.fori_loop`` (dynamic trip count),
  keeping O(1) memory per chain: only the two trajectory ends, the
  current multinomial proposal, and the running log-weight are carried,
- per-leaf progressive multinomial sampling replaces the slice variable
  of the original paper (no accept/reject at the end; every step yields
  a sample weighted by ``exp(H0 - H)``),
- U-turn termination is checked per doubling across the new subtree's
  ends and across the full trajectory ends; divergences
  (``H - H0 > max_delta_energy``) also stop a chain's tree,
- the dual-averaging step-size adaptation and chain scaffolding are
  shared with :class:`HMCSampler` (``hmc.py``).

The O(1)-memory simplification relative to Stan/NumPyro: interior
sub-subtree U-turn checks (between non-edge leaves inside a doubling)
are skipped — termination uses subtree-end and trajectory-end checks
only. The check set is direction-symmetric, preserving reversibility;
trees may occasionally extend one doubling further than Stan's would.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.registry import register_sampling
from .hmc import HMCSampler


@register_sampling("nuts")
class NUTSSampler(HMCSampler):
    def _cache_extras(self, kwargs) -> tuple:
        return (
            max(0, int(kwargs.get("max_tree_depth", 8))),
            float(kwargs.get("max_delta_energy", 1000.0)),
        )

    def _make_transition(self, logp_fn, grad_fn, m, kwargs):
        max_depth = max(0, int(kwargs.get("max_tree_depth", 8)))
        max_delta = float(kwargs.get("max_delta_energy", 1000.0))

        def energy(z, p):
            return -logp_fn(z) + 0.5 * jnp.sum(p * p, axis=1)

        def leapfrog(z, p, eps_s):
            p = p + 0.5 * eps_s * grad_fn(z)
            z = z + eps_s * p
            p = p + 0.5 * eps_s * grad_fn(z)
            return z, p

        def nuts_step(z0, eps, skey):
            """One NUTS transition for all m chains; returns (z', acc)."""
            k_mom, k_base = jax.random.split(skey)
            p0 = jax.random.normal(k_mom, z0.shape, z0.dtype)
            h0 = energy(z0, p0)

            def cond(c):
                (_, _, _, _, _, _, done, depth, _, _) = c
                return jnp.logical_and(depth < max_depth, jnp.any(~done))

            def body(c):
                (zm, pm, zp, pp, zprop, log_w, done, depth,
                 acc_sum, acc_cnt) = c
                kd = jax.random.fold_in(k_base, depth)
                k_dir, k_merge, k_leaf = jax.random.split(kd, 3)
                direction = jnp.where(
                    jax.random.bernoulli(k_dir, 0.5, (m,)), 1.0, -1.0
                )
                fwd = (direction > 0)[:, None]
                eps_s = eps * direction[:, None]
                z_edge = jnp.where(fwd, zp, zm)
                p_edge = jnp.where(fwd, pp, pm)
                active = ~done

                def leaf(i, s):
                    (z, p, z_start, p_start, z_sub, log_sub_w,
                     diverged, a_sum, a_cnt) = s
                    z, p = leapfrog(z, p, eps_s)
                    lw = h0 - energy(z, p)
                    lw = jnp.where(jnp.isfinite(lw), lw, -jnp.inf)
                    div = lw < -max_delta
                    # progressive multinomial sampling within the subtree
                    u = jax.random.uniform(jax.random.fold_in(k_leaf, i), (m,))
                    take = u < jnp.exp(lw - jnp.logaddexp(log_sub_w, lw))
                    z_sub = jnp.where(take[:, None], z, z_sub)
                    log_sub_w = jnp.logaddexp(log_sub_w, lw)
                    first = i == 0
                    z_start = jnp.where(first, z, z_start)
                    p_start = jnp.where(first, p, p_start)
                    a_sum = a_sum + jnp.sum(
                        jnp.where(active, jnp.minimum(1.0, jnp.exp(lw)), 0.0)
                    )
                    a_cnt = a_cnt + jnp.sum(active.astype(jnp.float32))
                    return (z, p, z_start, p_start, z_sub, log_sub_w,
                            diverged | div, a_sum, a_cnt)

                neg_inf = jnp.full((m,), -jnp.inf)
                s0 = (z_edge, p_edge, z_edge, p_edge, z_edge, neg_inf,
                      jnp.zeros((m,), bool), acc_sum, acc_cnt)
                (z_end, p_end, z_start, p_start, z_sub, log_sub_w,
                 diverged, acc_sum, acc_cnt) = jax.lax.fori_loop(
                    0, jnp.int32(2) ** depth, leaf, s0
                )

                # Subtree U-turn across its own ends, in trajectory time:
                # dir * (z_end - z_start) · p < 0 for either end momentum.
                dzs = (z_end - z_start) * direction[:, None]
                sub_turn = jnp.logical_or(
                    jnp.sum(dzs * p_start, axis=1) < 0,
                    jnp.sum(dzs * p_end, axis=1) < 0,
                )
                sub_ok = active & ~diverged & ~sub_turn

                # Biased progressive merge: accept the subtree's proposal
                # with prob min(1, W_sub / W_tree).
                u2 = jax.random.uniform(k_merge, (m,))
                take = sub_ok & (u2 < jnp.exp(
                    jnp.minimum(0.0, log_sub_w - log_w)
                ))
                zprop = jnp.where(take[:, None], z_sub, zprop)
                log_w = jnp.where(
                    sub_ok, jnp.logaddexp(log_w, log_sub_w), log_w
                )

                upd_p = (sub_ok[:, None]) & fwd
                upd_m = (sub_ok[:, None]) & ~fwd
                zp = jnp.where(upd_p, z_end, zp)
                pp = jnp.where(upd_p, p_end, pp)
                zm = jnp.where(upd_m, z_end, zm)
                pm = jnp.where(upd_m, p_end, pm)

                # Full-trajectory U-turn across the outermost ends.
                dzt = zp - zm
                turn = jnp.logical_or(
                    jnp.sum(dzt * pm, axis=1) < 0,
                    jnp.sum(dzt * pp, axis=1) < 0,
                )
                done = done | ~sub_ok | turn
                return (zm, pm, zp, pp, zprop, log_w, done, depth + 1,
                        acc_sum, acc_cnt)

            init = (
                z0, p0, z0, p0, z0,
                jnp.zeros((m,)),            # log weight of the root leaf
                jnp.zeros((m,), bool),
                jnp.int32(0),
                jnp.float32(0.0),
                jnp.float32(0.0),
            )
            (_, _, _, _, zprop, _, _, _, acc_sum, acc_cnt) = (
                jax.lax.while_loop(cond, body, init)
            )
            acc = acc_sum / jnp.maximum(acc_cnt, 1.0)
            return zprop, acc

        return nuts_step
