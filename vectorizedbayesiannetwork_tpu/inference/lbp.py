"""Damped weight-smoothing iterations ("LBP" in the reference's naming).

Capability parity with ``/root/reference/vbn/inference/lbp.py:11-68``: run
the base method (importance sampling or MC marginalization), then damped
weight-renormalization iterations until tolerance; non-convergence falls
back to a fresh importance-sampling run. (As in the reference, this is a
smoother over particle weights, not real message passing.)

TPU-first delta: the reference's Python iteration loop syncs ``max|Δw|`` to
host every step and re-dispatches the fallback as a second method call; here
the whole thing — base sweep, ``lax.while_loop`` smoothing, and the
non-convergence fallback branch (``lax.cond`` over a fresh-key IS program) —
is ONE compiled XLA program with zero device→host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.base import Query
from ..core.registry import register_inference
from ._base import CompiledMethod, Program
from .importance_sampling import ImportanceSampling
from .monte_carlo_marginalization import MonteCarloMarginalization


@register_inference("lbp")
class LoopyBeliefPropagation(CompiledMethod):
    def __init__(
        self,
        n_samples: int = 200,
        n_iters: int = 10,
        damping: float = 0.5,
        fallback: str = "importance_sampling",
        **_kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.n_iters = int(n_iters)
        self.damping = float(damping)
        self.fallback = str(fallback)
        if not (0.0 <= self.damping <= 1.0):
            raise ValueError("damping must be in [0,1]")
        if self.fallback not in {
            "importance_sampling",
            "monte_carlo_marginalization",
        }:
            raise ValueError(
                "fallback must be 'importance_sampling' or "
                "'monte_carlo_marginalization'"
            )
        self._is = ImportanceSampling(n_samples=self.n_samples)
        self._mcm = MonteCarloMarginalization(n_samples=self.n_samples)

    def make_program(self, vbn, query: Query, **kwargs):
        n_samples = int(kwargs.get("n_samples", self.n_samples))
        n_iters = int(kwargs.get("n_iters", self.n_iters))
        damping = float(kwargs.get("damping", self.damping))
        tol = float(kwargs.get("tol", 1e-4))
        eps = 1e-12
        use_mcm = self.fallback == "monte_carlo_marginalization"

        base_prog = (self._mcm if use_mcm else self._is).make_program(
            vbn, query, n_samples=n_samples
        )
        # Non-convergence falls back to a fresh IS run (reference lbp.py:65-66);
        # both programs share the same plan/params/fixed packing.
        is_prog = (
            self._is.make_program(vbn, query, n_samples=n_samples)
            if use_mcm
            else base_prog
        )
        base_fn, is_fn = base_prog.fn, is_prog.fn

        def fn(params_tuple, key, fixed_vals):
            k_base, k_fb = jax.random.split(key)
            outs = base_fn(params_tuple, k_base, fixed_vals)
            if use_mcm:
                pdf, samples = outs
                weights = pdf / (jnp.sum(pdf, axis=-1, keepdims=True) + eps)
            else:
                weights, samples = outs[0], outs[1]

            def body(st):
                i, w, _ = st
                w_new = jnp.maximum(w, eps)
                w_new = w_new / (jnp.sum(w_new, axis=-1, keepdims=True) + eps)
                msg = damping * w_new + (1.0 - damping) * w
                msg = msg / (jnp.sum(msg, axis=-1, keepdims=True) + eps)
                delta = jnp.max(jnp.abs(msg - w))
                return i + 1, msg, delta

            def cond(st):
                i, _, delta = st
                return (i < n_iters) & (delta >= tol)

            _, w_smooth, delta = jax.lax.while_loop(
                cond,
                body,
                (
                    jnp.zeros((), jnp.int32),
                    weights,
                    jnp.full((), jnp.inf, jnp.float32),
                ),
            )

            def keep(_):
                return w_smooth, samples

            def fb(_):
                o = is_fn(params_tuple, k_fb, fixed_vals)
                return o[0], o[1]

            return jax.lax.cond(delta < tol, keep, fb, None)

        return Program(
            base_prog.plan,
            ("lbp", n_samples, n_iters, damping, tol, use_mcm),
            fn,
            base_prog.params,
            base_prog.fixed,
            lambda outs: outs,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
