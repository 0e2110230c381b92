"""Mixture Density Network CPD (Gaussian mixture head).

Capability parity with ``/root/reference/vbn/cpds/mdn.py:37-272``: MLP ->
K logits + K x (loc, softplus scale); NLL via logsumexp over components;
sampling draws a component with Gumbel-argmax (the fixed-shape TPU analogue
of torch Categorical) then a Gaussian within it; mixture probabilities
clamped at 1e-5. Root fast path keeps learnable (logits, loc, log_scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ..core.rng import fold
from ..ops.gauss import LOG_2PI, safe_softplus
from ._mlp import (
    check_activation,
    mlp_apply,
    mlp_init,
    resolve_compute_dtype,
)
from ._train import fit_minibatch_nll, fit_minibatch_nll_many


@register_cpd("mdn")
class MDNCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        n_components: int = 5,
        hidden_dims: Sequence[int] = (32, 32),
        activation: str = "relu",
        min_scale: float = 1e-3,
        compute_dtype: str = "float32",
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.n_components = int(n_components)
        self.hidden_dims = tuple(int(h) for h in hidden_dims)
        self.activation = check_activation(str(activation))
        self.min_scale = float(min_scale)
        resolve_compute_dtype(compute_dtype)
        self.compute_dtype = str(compute_dtype)

    def get_init_kwargs(self):
        return {
            "n_components": self.n_components,
            "hidden_dims": list(self.hidden_dims),
            "activation": self.activation,
            "min_scale": self.min_scale,
            "compute_dtype": self.compute_dtype,
        }

    def _static_fields(self) -> tuple:
        return (
            self.n_components,
            self.hidden_dims,
            self.activation,
            self.min_scale,
            self.compute_dtype,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        k = self.n_components
        d = self.output_dim
        if self.input_dim == 0:
            # Spread initial component means so the mixture can specialize.
            net = {
                "logits": jnp.zeros((k,), jnp.float32),
                "loc": 0.1
                * jax.random.normal(key, (k, d), dtype=jnp.float32),
                "log_scale": jnp.zeros((k, d), jnp.float32),
            }
        else:
            net = mlp_init(
                key, self.input_dim, self.hidden_dims, k * (2 * d) + k
            )
        return {"net": net, "opt": None}

    # -- mixture head ---------------------------------------------------------
    def mixture_params(
        self, params_or_net, parents: Optional[jax.Array], dt=None
    ):
        """(logits [M,K], loc [M,K,D], scale [M,K,D]) for flat parents."""
        net = params_or_net.get("net", params_or_net)
        k, d = self.n_components, self.output_dim
        if self.input_dim == 0:
            m = 1 if parents is None else parents.shape[0]
            logits = jnp.broadcast_to(net["logits"], (m, k))
            loc = jnp.broadcast_to(net["loc"], (m, k, d))
            scale = jnp.broadcast_to(
                safe_softplus(net["log_scale"], self.min_scale), (m, k, d)
            )
            return logits, loc, scale
        out = mlp_apply(net, parents, self.activation, dt)
        logits = out[..., :k]
        rest = out[..., k:].reshape(out.shape[0], k, 2 * d)
        loc = rest[..., :d]
        scale = safe_softplus(rest[..., d:], self.min_scale)
        return logits, loc, scale

    def _mixture_log_prob(self, logits, loc, scale, x):
        """x [M,D] vs mixture [M,K,...] -> [M]."""
        z = (x[:, None, :] - loc) / scale
        log_comp = -0.5 * jnp.sum(
            z * z + 2.0 * jnp.log(scale) + LOG_2PI, axis=-1
        )  # [M,K]
        pi = jnp.maximum(jax.nn.softmax(logits, axis=-1), 1e-5)
        pi = pi / jnp.maximum(jnp.sum(pi, axis=-1, keepdims=True), 1e-12)
        return jax.scipy.special.logsumexp(jnp.log(pi) + log_comp, axis=-1)

    def _nll(self, net: Params, parents: jax.Array, x: jax.Array) -> jax.Array:
        logits, loc, scale = self.mixture_params(net, parents)
        return -jnp.mean(self._mixture_log_prob(logits, loc, scale, x))

    def _train(self, params, key, parents, x, *, steps, batch_size, lr,
               weight_decay, max_grad_norm, ema_alpha=None):
        net, opt = fit_minibatch_nll(
            self, "_nll", params["net"], params.get("opt"), key, parents,
            jnp.asarray(x, jnp.float32),
            epochs=steps, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, max_grad_norm=max_grad_norm,
            ema_alpha=ema_alpha,
        )
        return {"net": net, "opt": opt}

    def fit(self, params, key, parents, x, *, epochs=1, lr=1e-3,
            batch_size=128, weight_decay=0.0, max_grad_norm=None, **_kw):
        return self._train(params, key, parents, x, steps=epochs,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm)

    def fit_many(self, params_list, keys, parents_list, x_list, *,
                 epochs=1, lr=1e-3, batch_size=128, weight_decay=0.0,
                 max_grad_norm=None, **_kw):
        """Batched initial fit of G same-signature MDN nodes (one vmapped
        scan; see gaussian_nn.fit_many). Returns params list or None."""
        from .gaussian_nn import _unstack_opt

        if any(p.get("opt") is not None for p in params_list):
            return None
        n = jnp.asarray(x_list[0], jnp.float32).shape[0]
        xs = [
            jnp.asarray(x, jnp.float32).reshape(n, self.output_dim)
            for x in x_list
        ]
        pns = [
            jnp.zeros((n, 0), jnp.float32)
            if (self.input_dim == 0 or p is None)
            else jnp.asarray(p, jnp.float32)
            for p in parents_list
        ]
        nets = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *[p["net"] for p in params_list]
        )
        nets, opts = fit_minibatch_nll_many(
            self, "_nll", nets, jnp.stack(keys), jnp.stack(pns),
            jnp.stack(xs), epochs=epochs, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, max_grad_norm=max_grad_norm,
        )
        return [
            {
                "net": jax.tree_util.tree_map(lambda a, _i=i: a[_i], nets),
                "opt": _unstack_opt(opts, i),
            }
            for i in range(len(params_list))
        ]

    def update(self, params, key, parents, x, *, lr=1e-3, n_steps=1,
               batch_size=128, weight_decay=0.0, max_grad_norm=None,
               ema_alpha=None, **_kw):
        return self._train(params, key, parents, x, steps=n_steps,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm, ema_alpha=ema_alpha)

    def update_program(self, conf):
        """The jit-scanned Adam update is pure (models/_train.py) ->
        traceable into the fused whole-network update program."""
        conf = dict(conf)

        def fn(params, key, parents, x):
            return self.update(params, key, parents, x, **conf)

        return fn

    # -- pure kernels --------------------------------------------------------
    def _sample_flat(self, params, key, parents, m):
        logits, loc, scale = self.mixture_params(
            params, parents, resolve_compute_dtype(self.compute_dtype)
        )
        logits = jnp.broadcast_to(logits, (m, self.n_components))
        loc = jnp.broadcast_to(loc, (m, self.n_components, self.output_dim))
        scale = jnp.broadcast_to(scale, loc.shape)
        pi = jnp.maximum(jax.nn.softmax(logits, axis=-1), 1e-5)
        log_pi = jnp.log(pi / jnp.sum(pi, axis=-1, keepdims=True))
        k_comp, k_eps = jax.random.split(key)
        # Gumbel-argmax categorical draw: fixed shapes, no host sync.
        g = jax.random.gumbel(k_comp, (m, self.n_components))
        comp = jnp.argmax(log_pi + g, axis=-1)  # [M]
        sel = jax.nn.one_hot(comp, self.n_components, dtype=loc.dtype)
        loc_c = jnp.einsum("mk,mkd->md", sel, loc)
        scale_c = jnp.einsum("mk,mkd->md", sel, scale)
        eps = jax.random.normal(k_eps, (m, self.output_dim), dtype=loc.dtype)
        return loc_c + eps * scale_c

    def _log_prob_flat(self, params, x, parents):
        logits, loc, scale = self.mixture_params(
            params, parents, resolve_compute_dtype(self.compute_dtype)
        )
        m = x.shape[0]
        logits = jnp.broadcast_to(logits, (m, self.n_components))
        loc = jnp.broadcast_to(loc, (m, self.n_components, self.output_dim))
        scale = jnp.broadcast_to(scale, loc.shape)
        return self._mixture_log_prob(logits, loc, scale, x)
