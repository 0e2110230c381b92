"""Neural Gaussian CPD: MLP -> (loc, softplus scale), with standardization.

Capability parity with ``/root/reference/vbn/cpds/gaussian_nn.py:37-288``:
input/output standardization buffers, Adam NLL minibatch training with the
optimizer state persisted alongside the params, root fast path with
learnable (loc, log_scale), ``min_scale`` softplus floor, denormalized
loc/scale at evaluation. The training loop is one compiled scan
(``_train.py``); sample/log_prob are fused GEMM+elementwise kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ..ops.gauss import diag_gaussian_log_prob, safe_softplus
from ._mlp import (
    check_activation,
    mlp_apply,
    mlp_init,
    resolve_compute_dtype,
)
from ._train import fit_minibatch_nll, fit_minibatch_nll_many


def _unstack_opt(opts, i):
    return {
        "m": jax.tree_util.tree_map(lambda a: a[i], opts["m"]),
        "v": jax.tree_util.tree_map(lambda a: a[i], opts["v"]),
        "step": opts["step"][i],
    }


@register_cpd("gaussian_nn")
class GaussianNNCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        hidden_dims: Sequence[int] = (32, 32),
        activation: str = "relu",
        min_scale: float = 1e-3,
        compute_dtype: str = "float32",
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.hidden_dims = tuple(int(h) for h in hidden_dims)
        self.activation = check_activation(str(activation))
        self.min_scale = float(min_scale)
        # Eval-path mixed precision: bf16 GEMMs w/ fp32 accumulation on the
        # MXU. Training stays fp32 (reference-parity learning dynamics).
        resolve_compute_dtype(compute_dtype)
        self.compute_dtype = str(compute_dtype)

    def get_init_kwargs(self):
        return {
            "hidden_dims": list(self.hidden_dims),
            "activation": self.activation,
            "min_scale": self.min_scale,
            "compute_dtype": self.compute_dtype,
        }

    def _static_fields(self) -> tuple:
        return (
            self.hidden_dims,
            self.activation,
            self.min_scale,
            self.compute_dtype,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        if self.input_dim == 0:
            net = {
                "loc": jnp.zeros((self.output_dim,), jnp.float32),
                "log_scale": jnp.zeros((self.output_dim,), jnp.float32),
            }
        else:
            net = mlp_init(
                key, self.input_dim, self.hidden_dims, self.output_dim * 2
            )
        return {
            "net": net,
            "stats": {
                "mean_x": jnp.zeros((self.input_dim,), jnp.float32),
                "std_x": jnp.ones((self.input_dim,), jnp.float32),
                "mean_y": jnp.zeros((self.output_dim,), jnp.float32),
                "std_y": jnp.ones((self.output_dim,), jnp.float32),
            },
            "opt": None,
        }

    def _standardization(self, parents: Optional[jax.Array], x: jax.Array):
        if parents is None or parents.size == 0:
            mean_x = jnp.zeros((self.input_dim,), jnp.float32)
            std_x = jnp.ones((self.input_dim,), jnp.float32)
        else:
            mean_x = jnp.mean(parents, axis=0)
            std_x = jnp.maximum(jnp.std(parents, axis=0), 1e-6)
        return {
            "mean_x": mean_x,
            "std_x": std_x,
            "mean_y": jnp.mean(x, axis=0),
            "std_y": jnp.maximum(jnp.std(x, axis=0), 1e-6),
        }

    # NLL in *normalized* target space given raw stats via closure-free form:
    # the trainer calls _nll(net, parents2d, x2d) where parents/x are already
    # standardized (we standardize once before the loop — cheaper and
    # equivalent to the reference's per-forward normalization).
    def _nll(self, net: Params, parents: jax.Array, x: jax.Array) -> jax.Array:
        loc, scale = self._loc_scale_norm(net, parents, x.shape[0])
        return -jnp.mean(diag_gaussian_log_prob(x, loc, scale))

    def _loc_scale_norm(
        self, net: Params, parents: jax.Array, m: int, dt=None
    ):
        """(loc, scale) in normalized target units from normalized parents."""
        if self.input_dim == 0:
            loc = jnp.broadcast_to(net["loc"], (m, self.output_dim))
            scale = jnp.broadcast_to(
                safe_softplus(net["log_scale"], self.min_scale),
                (m, self.output_dim),
            )
            return loc, scale
        out = mlp_apply(net, parents, self.activation, dt)
        loc = out[..., : self.output_dim]
        scale = safe_softplus(out[..., self.output_dim :], self.min_scale)
        return loc, scale

    def _train(self, params, key, parents, x, *, steps, batch_size, lr,
               weight_decay, max_grad_norm, ema_alpha=None, refresh_stats=True):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        if x.ndim == 3:
            x = x.reshape(-1, x.shape[-1])
        if parents is not None:
            parents = jnp.asarray(parents, jnp.float32)
            if parents.ndim == 3:
                parents = parents.reshape(-1, parents.shape[-1])
        stats = (
            self._standardization(parents, x) if refresh_stats else params["stats"]
        )
        xn = (x - stats["mean_y"]) / stats["std_y"]
        pn = (
            None
            if parents is None
            else (parents - stats["mean_x"]) / stats["std_x"]
        )
        net, opt = fit_minibatch_nll(
            self,
            "_nll",
            params["net"],
            params.get("opt"),
            key,
            pn,
            xn,
            epochs=steps,
            batch_size=batch_size,
            lr=lr,
            weight_decay=weight_decay,
            max_grad_norm=max_grad_norm,
            ema_alpha=ema_alpha,
        )
        return {"net": net, "stats": stats, "opt": opt}

    def fit(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        *,
        epochs: int = 1,
        lr: float = 1e-3,
        batch_size: int = 128,
        weight_decay: float = 0.0,
        max_grad_norm: Optional[float] = None,
        **_kwargs,
    ) -> Params:
        return self._train(
            params, key, parents, x,
            steps=epochs, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, max_grad_norm=max_grad_norm,
        )

    def fit_many(
        self,
        params_list,
        keys,
        parents_list,
        x_list,
        *,
        epochs: int = 1,
        lr: float = 1e-3,
        batch_size: int = 128,
        weight_decay: float = 0.0,
        max_grad_norm: Optional[float] = None,
        **_kwargs,
    ):
        """Batched initial fit of G same-signature nodes as ONE vmapped scan.

        Called by node_wise's fit-time grouping. Returns a list of fitted
        params (same order), or None to decline (existing optimizer state
        means this is an update, which stays sequential).
        """
        if any(p.get("opt") is not None for p in params_list):
            return None
        xs, pns, stats_list = [], [], []
        for parents, x in zip(parents_list, x_list):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 1:
                x = x[:, None]
            if parents is not None:
                parents = jnp.asarray(parents, jnp.float32)
            stats = self._standardization(parents, x)
            stats_list.append(stats)
            xs.append((x - stats["mean_y"]) / stats["std_y"])
            if self.input_dim == 0 or parents is None:
                pns.append(jnp.zeros((x.shape[0], 0), jnp.float32))
            else:
                pns.append((parents - stats["mean_x"]) / stats["std_x"])
        nets = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *[p["net"] for p in params_list]
        )
        nets, opts = fit_minibatch_nll_many(
            self,
            "_nll",
            nets,
            jnp.stack(keys),
            jnp.stack(pns),
            jnp.stack(xs),
            epochs=epochs,
            batch_size=batch_size,
            lr=lr,
            weight_decay=weight_decay,
            max_grad_norm=max_grad_norm,
        )
        return [
            {
                "net": jax.tree_util.tree_map(lambda a, _i=i: a[_i], nets),
                "stats": stats_list[i],
                "opt": _unstack_opt(opts, i),
            }
            for i in range(len(params_list))
        ]

    def update(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        *,
        lr: float = 1e-3,
        n_steps: int = 1,
        batch_size: int = 128,
        weight_decay: float = 0.0,
        max_grad_norm: Optional[float] = None,
        ema_alpha: Optional[float] = None,
        **_kwargs,
    ) -> Params:
        return self._train(
            params, key, parents, x,
            steps=n_steps, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, max_grad_norm=max_grad_norm,
            ema_alpha=ema_alpha,
        )

    def update_program(self, conf):
        """The jit-scanned Adam update is pure (models/_train.py) ->
        traceable into the fused whole-network update program."""
        conf = dict(conf)

        def fn(params, key, parents, x):
            return self.update(params, key, parents, x, **conf)

        return fn

    # -- pure kernels --------------------------------------------------------
    def _denorm_params(self, params: Params, parents: Optional[jax.Array], m: int):
        stats = params["stats"]
        if self.input_dim == 0:
            pn = None
        else:
            pn = (parents - stats["mean_x"]) / stats["std_x"]
        loc_n, scale_n = self._loc_scale_norm(
            params["net"], pn, m, resolve_compute_dtype(self.compute_dtype)
        )
        loc = loc_n * stats["std_y"] + stats["mean_y"]
        scale = scale_n * stats["std_y"]
        return loc, scale

    def _sample_flat(self, params, key, parents, m):
        loc, scale = self._denorm_params(params, parents, m)
        eps = jax.random.normal(key, (m, self.output_dim), dtype=loc.dtype)
        return loc + eps * scale

    def _log_prob_flat(self, params, x, parents):
        loc, scale = self._denorm_params(params, parents, x.shape[0])
        return diag_gaussian_log_prob(x, loc, scale)

    def conditional_params(self, params: Params, parents: Optional[jax.Array]):
        m = 1 if parents is None else parents.shape[0]
        return self._denorm_params(params, parents, m)
