"""Hamiltonian Monte Carlo over the flat latent vector (continuous nets).

Capability parity with ``/root/reference/vbn/sampling/hmc.py:19-141``:
leapfrog integration with Metropolis accept over the joint log-density of
all latent nodes, ancestral-init, ancestral fallback for networks with
categorical CPDs. Improvements over the reference placeholder (SURVEY.md
§7 "real NUTS"): exact gradients via ``jax.grad`` of the compiled joint
(the reference re-traces autograd per step), the whole chain is one
``lax.scan`` program, ``n_chains`` parallel chains batch along the
particle axis instead of one sequential chain, and dual-averaging
step-size adaptation (Hoffman & Gelman 2014) replaces the fixed step
size. The NUTS variant with dynamic trajectory lengths lives in
``nuts.py`` and plugs into this file's chain scaffolding via
``_make_transition``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_sampling
from ..core.rng import fold
from ..inference._base import CompiledMethod
from ..inference._sweep import sweep_trace
from .ancestral import AncestralSampler


def _is_continuous_cpd(cpd) -> bool:
    return not hasattr(cpd, "categorical_probs")


@register_sampling("hmc")
class HMCSampler(CompiledMethod):
    def __init__(self, n_samples: int = 200, n_chains: int = 1, **_kwargs) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.n_chains = max(1, int(n_chains))
        self._ancestral = AncestralSampler(n_samples=self.n_samples)

    # ------------------------------------------------------------------
    # Transition kernel — overridden by NUTSSampler.
    # ------------------------------------------------------------------

    def _cache_extras(self, kwargs) -> tuple:
        return (max(1, int(kwargs.get("n_leapfrog", 8))),)

    def _make_transition(self, logp_fn, grad_fn, m, kwargs):
        """Return ``(z, eps, skey) -> (z_new, mean_accept_stat)``."""
        n_leapfrog = max(1, int(kwargs.get("n_leapfrog", 8)))

        def hmc_step(z, eps, skey):
            """One leapfrog+MH transition; returns (z', mean accept)."""
            k_mom, k_acc = jax.random.split(skey)
            logp0 = logp_fn(z)
            grad = grad_fn(z)
            momentum = jax.random.normal(k_mom, z.shape, z.dtype)
            h0 = -logp0 + 0.5 * jnp.sum(momentum**2, axis=1)
            p = momentum + 0.5 * eps * grad
            q = z

            def leap(carry, _):
                q, p = carry
                q = q + eps * p
                g = grad_fn(q)
                p = p + eps * g
                return (q, p), None

            (q, p), _ = jax.lax.scan(leap, (q, p), None, length=n_leapfrog)
            g = grad_fn(q)
            p = p - 0.5 * eps * g
            logp1 = logp_fn(q)
            h1 = -logp1 + 0.5 * jnp.sum(p**2, axis=1)
            accept_prob = jnp.minimum(jnp.exp(h0 - h1), 1.0)
            accept = jax.random.uniform(k_acc, (m,)) < accept_prob
            z_new = jnp.where(accept[:, None], q, z)
            return z_new, jnp.mean(accept_prob)

        return hmc_step

    # ------------------------------------------------------------------

    def sample(self, vbn, query: Query, n_samples=None, **kwargs):
        s = int(n_samples or kwargs.get("n_samples", self.n_samples))
        if not all(
            _is_continuous_cpd(vbn.cpd_spec(n)) for n in vbn.dag.nodes()
        ):
            return self._ancestral.sample(vbn, query, n_samples=s)

        step_size = float(kwargs.get("step_size", 0.05))
        burn_in = int(kwargs.get("burn_in", 10))
        adapt = bool(kwargs.get("adapt_step_size", False))
        target_accept = float(kwargs.get("target_accept", 0.8))
        chains = max(1, int(kwargs.get("n_chains", self.n_chains)))
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx
        latent = [i for i in range(plan.n_nodes) if not plan.is_fixed(i)]
        if not latent:
            return self._ancestral.sample(vbn, query, n_samples=s)
        lat_dims = [plan.node_dims[i] for i in latent]
        lat_offsets = []
        off = 0
        for d in lat_dims:
            lat_offsets.append(off)
            off += d
        latent_dim = off
        draws_per_chain = -(-s // chains)
        total_steps = burn_in + draws_per_chain

        def build():
            def joint_log_prob(params_tuple, z, fixed_vals):
                """z [M, L]; fixed_vals [M, total_dim] -> [M]."""
                m = z.shape[0]
                vals = []
                for i in range(plan.n_nodes):
                    d = plan.node_dims[i]
                    o = plan.node_offsets[i]
                    if plan.is_fixed(i):
                        vals.append(fixed_vals[:, o : o + d])
                    else:
                        j = latent.index(i)
                        vals.append(
                            z[:, lat_offsets[j] : lat_offsets[j] + lat_dims[j]]
                        )
                total = jnp.zeros((m,), jnp.float32)
                for i in range(plan.n_nodes):
                    pidx = plan.parent_idx[i]
                    parents = (
                        jnp.concatenate([vals[p] for p in pidx], axis=-1)
                        if pidx
                        else None
                    )
                    total = total + cpds[i]._log_prob_flat(
                        params_tuple[i], vals[i], parents
                    )
                return total

            def fn(params_tuple, key, fixed_vals):
                bb = fixed_vals.shape[0]
                c = chains
                m = bb * c
                fixed_rep = jnp.repeat(fixed_vals, c, axis=0)  # [M, total]
                # ancestral init, one particle per chain
                packed, _ = sweep_trace(
                    plan, cpds, params_tuple, fold(key, 0), fixed_vals, c
                )  # [B, C, total]
                z0 = jnp.concatenate(
                    [
                        packed[
                            ..., plan.node_offsets[i] : plan.node_offsets[i]
                            + plan.node_dims[i]
                        ]
                        for i in latent
                    ],
                    axis=-1,
                ).reshape(m, latent_dim)

                logp_fn = lambda z: joint_log_prob(params_tuple, z, fixed_rep)
                grad_fn = jax.grad(lambda z: jnp.sum(logp_fn(z)))
                transition = self._make_transition(logp_fn, grad_fn, m, kwargs)

                def _accept_at(z, eps, skey):
                    """Mean accept prob of one single-leapfrog proposal."""
                    k_mom, _ = jax.random.split(skey)
                    logp0 = logp_fn(z)
                    momentum = jax.random.normal(k_mom, z.shape, z.dtype)
                    h0 = -logp0 + 0.5 * jnp.sum(momentum**2, axis=1)
                    p = momentum + 0.5 * eps * grad_fn(z)
                    q = z + eps * p
                    p = p + 0.5 * eps * grad_fn(q)
                    h1 = -logp_fn(q) + 0.5 * jnp.sum(p**2, axis=1)
                    return jnp.mean(jnp.minimum(jnp.exp(h0 - h1), 1.0))

                def find_reasonable_eps(z, skey):
                    """Hoffman-Gelman doubling/halving init for adaptation."""
                    acc0 = _accept_at(z, jnp.float32(step_size), skey)
                    direction = jnp.where(acc0 > 0.5, 1.0, -1.0)

                    def cond(carry):
                        eps, acc, it = carry
                        keep = jnp.where(
                            direction > 0, acc > 0.5, acc < 0.5
                        )
                        return jnp.logical_and(keep, it < 24)

                    def body(carry):
                        eps, _, it = carry
                        eps = eps * jnp.exp2(direction)
                        return (eps, _accept_at(z, eps, skey), it + 1)

                    eps, _, _ = jax.lax.while_loop(
                        cond, body, (jnp.float32(step_size), acc0, 0)
                    )
                    return eps

                # Dual-averaging step-size adaptation during burn-in
                # (Hoffman & Gelman 2014 schedule with the
                # find-reasonable-epsilon anchor; replaces the reference
                # placeholder's fixed step size).
                eps0 = (
                    find_reasonable_eps(z0, fold(key, 2))
                    if adapt
                    else jnp.float32(step_size)
                )
                mu = jnp.log(10.0 * eps0)
                gamma, t0_da, kappa = 0.05, 10.0, 0.75

                def step(carry, inp):
                    z, eps, h_bar, log_eps_bar, t = carry
                    skey = inp
                    z, acc = transition(z, eps, skey)
                    if adapt:
                        in_warmup = t < burn_in
                        tt = t.astype(jnp.float32) + 1.0
                        h_new = (
                            (1.0 - 1.0 / (tt + t0_da)) * h_bar
                            + (target_accept - acc) / (tt + t0_da)
                        )
                        log_eps = mu - jnp.sqrt(tt) / gamma * h_new
                        eta = tt ** (-kappa)
                        leb_new = eta * log_eps + (1.0 - eta) * log_eps_bar
                        h_bar = jnp.where(in_warmup, h_new, h_bar)
                        log_eps_bar = jnp.where(
                            in_warmup, leb_new, log_eps_bar
                        )
                        eps = jnp.where(
                            in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar)
                        )
                    return (z, eps, h_bar, log_eps_bar, t + 1), None

                def full_step(carry, skey):
                    (z, eps, h_bar, leb, t) = carry
                    (z, eps, h_bar, leb, t), _ = step(
                        (z, eps, h_bar, leb, t), skey
                    )
                    ti = plan.target_idx
                    j = latent.index(ti) if ti in latent else None
                    if j is None:
                        tgt = fixed_rep[
                            :,
                            plan.node_offsets[ti] : plan.node_offsets[ti]
                            + plan.node_dims[ti],
                        ]
                    else:
                        tgt = z[
                            :, lat_offsets[j] : lat_offsets[j] + lat_dims[j]
                        ]
                    return (z, eps, h_bar, leb, t), tgt

                step_keys = jax.random.split(fold(key, 1), total_steps)
                carry0 = (
                    z0,
                    eps0,
                    jnp.float32(0.0),
                    jnp.log(eps0),
                    jnp.int32(0),
                )
                _, targets = jax.lax.scan(full_step, carry0, step_keys)
                # [total_steps, M, Dt] -> keep post-burn-in
                kept = targets[burn_in:]  # [draws, M, Dt]
                kept = jnp.moveaxis(kept, 0, 1).reshape(
                    bb, c * draws_per_chain, plan.node_dims[t]
                )
                return kept[:, :s]

            return fn

        fn = self._compiled(
            vbn,
            plan,
            (type(self).__name__, s, burn_in, chains, step_size, adapt)
            + self._cache_extras(kwargs),
            build,
        )
        return fn(self._params_tuple(vbn, plan), vbn.next_key_spec(), fixed)
