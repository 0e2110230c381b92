"""Binned-categorical CPD over continuous targets (softmax classifier).

Capability parity with ``/root/reference/vbn/cpds/softmax_nn.py:40-789`` —
the reference's largest CPD:
  * per-dim discrete-vs-continuous auto-detection (a dim with exactly
    ``n_classes`` unique values is discrete; softmax_nn.py:276-288);
  * binning modes uniform / gaussian(icdf) / quantile with min-bin-width
    enforcement (245-274);
  * within-bin densities uniform / triangular / gaussian for continuous
    log-prob and sampling, with outside-bin -inf unless clipped (664-759);
  * cross-entropy training with label smoothing and optional inverse-
    frequency class weights (443-533);
  * root fast path: empirical histogram log-probs, no gradients (761-777);
  * bin-range expansion on update, with discrete-membership validation
    (339-394).

TPU-first: bin construction and discrete detection run host-side at fit
time (numpy) and become static/param state; bin targets are precomputed so
the jit-scanned trainer sees a plain weighted-CE objective; sampling uses
Gumbel-argmax + within-bin transforms, fully fused in the sweep.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ..ops.gauss import LOG_2PI
from ._mlp import (
    check_activation,
    mlp_apply,
    mlp_init,
    resolve_compute_dtype,
)
from ._train import fit_minibatch_nll

_BINNINGS = ("uniform", "gaussian", "quantile")
_WITHIN_BIN = ("uniform", "triangular", "gaussian")


@register_cpd("softmax_nn")
class SoftmaxNNCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        n_classes: int = 8,
        hidden_dims: Sequence[int] = (32, 32),
        activation: str = "relu",
        label_smoothing: float = 0.0,
        min_bin_width: float = 1e-12,
        binning: str = "uniform",
        within_bin: str = "uniform",
        within_bin_scale: float = 0.25,
        within_bin_clip: bool = False,
        mode_when_not_discrete: str = "binned",
        class_weighting: str = "none",
        debug: bool = False,
        debug_every: int = 0,
        compute_dtype: str = "float32",
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.n_classes = int(n_classes)
        self.hidden_dims = tuple(int(h) for h in hidden_dims)
        self.activation = check_activation(str(activation))
        self.label_smoothing = float(label_smoothing)
        self.min_bin_width = float(min_bin_width)
        self.binning = str(binning).lower().strip()
        self.within_bin = str(within_bin).lower().strip()
        self.within_bin_scale = float(within_bin_scale)
        self.within_bin_clip = bool(within_bin_clip)
        self.mode_when_not_discrete = str(mode_when_not_discrete).lower().strip()
        self.class_weighting = str(class_weighting).lower().strip()
        self.debug = bool(debug)
        self.debug_every = int(debug_every)
        resolve_compute_dtype(compute_dtype)
        self.compute_dtype = str(compute_dtype)
        self.temperature = 1.0
        if self.n_classes <= 0:
            raise ValueError("n_classes must be >= 1")
        if self.binning not in _BINNINGS:
            raise ValueError(f"Unknown binning {binning!r}")
        if self.within_bin not in _WITHIN_BIN:
            raise ValueError(f"Unknown within_bin {within_bin!r}")
        if self.mode_when_not_discrete != "binned":
            raise ValueError(
                f"Unknown mode_when_not_discrete {mode_when_not_discrete!r}"
            )
        if self.class_weighting not in {"none", "inverse_freq"}:
            raise ValueError(f"Unknown class_weighting {class_weighting!r}")
        if self.debug_every < 0:
            raise ValueError("debug_every must be >= 0")
        # fit-resolved static flags
        self.bins_ready = False
        self.root_ready = False

    def get_init_kwargs(self):
        return {
            "n_classes": self.n_classes,
            "hidden_dims": list(self.hidden_dims),
            "activation": self.activation,
            "label_smoothing": self.label_smoothing,
            "min_bin_width": self.min_bin_width,
            "binning": self.binning,
            "within_bin": self.within_bin,
            "within_bin_scale": self.within_bin_scale,
            "within_bin_clip": self.within_bin_clip,
            "mode_when_not_discrete": self.mode_when_not_discrete,
            "class_weighting": self.class_weighting,
            "debug": self.debug,
            "debug_every": self.debug_every,
            "compute_dtype": self.compute_dtype,
        }

    def get_extra_state(self):
        return {"bins_ready": self.bins_ready, "root_ready": self.root_ready}

    def set_extra_state(self, state) -> None:
        if state:
            self.bins_ready = bool(state.get("bins_ready", False))
            self.root_ready = bool(state.get("root_ready", False))

    def _static_fields(self) -> tuple:
        return (
            self.n_classes,
            self.hidden_dims,
            self.activation,
            self.label_smoothing,
            self.min_bin_width,
            self.binning,
            self.within_bin,
            self.within_bin_scale,
            self.within_bin_clip,
            self.class_weighting,
            self.bins_ready,
            self.root_ready,
            self.compute_dtype,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        c, d = self.n_classes, self.output_dim
        if self.input_dim == 0:
            net = {"logits": jnp.zeros((d, c), jnp.float32)}
        else:
            net = mlp_init(key, self.input_dim, self.hidden_dims, d * c)
        return {
            "net": net,
            "bins": {
                "vmin": jnp.zeros((d,), jnp.float32),
                "vmax": jnp.zeros((d,), jnp.float32),
                "edges": jnp.zeros((d, c + 1), jnp.float32),
                "centers": jnp.zeros((d, c), jnp.float32),
                "class_values": jnp.zeros((d, c), jnp.float32),
                "sample_values": jnp.zeros((d, c), jnp.float32),
                "is_discrete": jnp.zeros((d,), jnp.float32),
            },
            "root_log_probs": jnp.zeros((d, c), jnp.float32),
            "opt": None,
        }

    # -- host-side bin construction ------------------------------------------
    def _compute_bins_host(self, x_flat: np.ndarray):
        """Build (vmin, vmax, edges, centers, class_values, is_discrete)."""
        d, c = self.output_dim, self.n_classes
        vmin = x_flat.min(axis=0)
        vmax = x_flat.max(axis=0)
        min_range = self.min_bin_width * c
        if min_range > 0:
            span = vmax - vmin
            vmax = np.where(span < min_range, vmin + min_range, vmax)
        q = np.linspace(0.0, 1.0, c + 1)
        if self.binning == "uniform":
            width = np.maximum((vmax - vmin) / c, self.min_bin_width)
            edges = vmin[:, None] + width[:, None] * q[None, :]
        elif self.binning == "gaussian":
            mean = x_flat.mean(axis=0)
            std = np.maximum(x_flat.std(axis=0), self.min_bin_width)
            eps = 1e-6
            qs = np.clip(q, eps, 1.0 - eps)
            # Normal icdf via the erfinv identity (no scipy dependency).
            z = np.sqrt(2.0) * _erfinv(2.0 * qs - 1.0)
            edges = mean[:, None] + std[:, None] * z[None, :]
            edges[:, 0] = vmin
            edges[:, -1] = vmax
        elif self.binning == "quantile":
            edges = np.quantile(x_flat, q, axis=0).T
            edges[:, 0] = vmin
            edges[:, -1] = vmax
        if self.min_bin_width > 0:
            for i in range(1, edges.shape[1]):
                edges[:, i] = np.maximum(
                    edges[:, i], edges[:, i - 1] + self.min_bin_width
                )
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])

        is_discrete = np.zeros((d,), bool)
        class_values = np.zeros((d, c), np.float32)
        for dim in range(d):
            uniq = np.unique(x_flat[:, dim])
            if uniq.size == c:
                is_discrete[dim] = True
                class_values[dim] = uniq
        return (
            vmin.astype(np.float32),
            vmax.astype(np.float32),
            edges.astype(np.float32),
            centers.astype(np.float32),
            class_values,
            is_discrete,
        )

    def _refresh_bins(self, params, x_flat: np.ndarray, *, allow_expand, force):
        bins = params["bins"]
        if force or not self.bins_ready:
            vmin, vmax, edges, centers, class_values, is_discrete = (
                self._compute_bins_host(x_flat)
            )
            sample_values = np.where(
                is_discrete[:, None], class_values, centers
            )
            self.bins_ready = True
            return {
                "vmin": jnp.asarray(vmin),
                "vmax": jnp.asarray(vmax),
                "edges": jnp.asarray(edges),
                "centers": jnp.asarray(centers),
                "class_values": jnp.asarray(class_values),
                "sample_values": jnp.asarray(sample_values.astype(np.float32)),
                "is_discrete": jnp.asarray(is_discrete.astype(np.float32)),
            }
        # membership check for discrete dims (parity softmax_nn.py:329-337)
        is_discrete = np.asarray(bins["is_discrete"]) > 0.5
        if is_discrete.any():
            cv = np.asarray(bins["class_values"])
            for dim in np.where(is_discrete)[0]:
                if not np.isin(x_flat[:, dim], cv[dim]).all():
                    raise ValueError(
                        "Found values outside discrete class set during update."
                    )
        if not allow_expand:
            return bins
        vmin_old = np.asarray(bins["vmin"])
        vmax_old = np.asarray(bins["vmax"])
        new_vmin = np.minimum(vmin_old, x_flat.min(axis=0))
        new_vmax = np.maximum(vmax_old, x_flat.max(axis=0))
        if (new_vmin < vmin_old).any() or (new_vmax > vmax_old).any():
            vmin, vmax, edges, centers, _, _ = self._compute_bins_host(x_flat)
            # keep the expanded range, recompute edges over it
            min_range = self.min_bin_width * self.n_classes
            span = new_vmax - new_vmin
            new_vmax = np.where(span < min_range, new_vmin + min_range, new_vmax)
            if self.binning == "uniform":
                width = np.maximum(
                    (new_vmax - new_vmin) / self.n_classes, self.min_bin_width
                )
                q = np.arange(self.n_classes + 1, dtype=np.float64)
                edges = new_vmin[:, None] + width[:, None] * q[None, :]
            else:
                edges[:, 0] = new_vmin
                edges[:, -1] = new_vmax
            if self.min_bin_width > 0:
                for i in range(1, edges.shape[1]):
                    edges[:, i] = np.maximum(
                        edges[:, i], edges[:, i - 1] + self.min_bin_width
                    )
            centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
            cv = np.asarray(bins["class_values"])
            sample_values = np.where(is_discrete[:, None], cv, centers)
            return {
                "vmin": jnp.asarray(new_vmin.astype(np.float32)),
                "vmax": jnp.asarray(new_vmax.astype(np.float32)),
                "edges": jnp.asarray(edges.astype(np.float32)),
                "centers": jnp.asarray(centers.astype(np.float32)),
                "class_values": bins["class_values"],
                "sample_values": jnp.asarray(sample_values.astype(np.float32)),
                "is_discrete": bins["is_discrete"],
            }
        return bins

    # -- bin mapping (device) -------------------------------------------------
    def _x_to_bin(self, bins, x: jax.Array) -> jax.Array:
        """x [M, Dout] -> int bin/class indices [M, Dout]."""
        edges = bins["edges"]  # [D, C+1]
        cont = jnp.sum(x[:, :, None] >= edges[None], axis=-1) - 1
        cont = jnp.clip(cont, 0, self.n_classes - 1)
        cv = bins["class_values"]  # [D, C]
        match = x[:, :, None] == cv[None]
        disc = jnp.argmax(match, axis=-1)
        mask = bins["is_discrete"][None, :] > 0.5
        return jnp.where(mask, disc, cont).astype(jnp.int32)

    def _gather_edges(self, bins, idx: jax.Array):
        """idx [M, Dout] -> (left, right, width, center) each [M, Dout].

        One-hot contraction instead of take_along_axis: for small C the
        multiply+reduce maps onto the VPU instead of a TPU gather (the
        gathers dominated the 1M-particle sampling profile).
        """
        edges = bins["edges"]
        idx_c = jnp.clip(idx, 0, self.n_classes - 1)
        sel = jax.nn.one_hot(idx_c, self.n_classes, dtype=edges.dtype)
        left = jnp.einsum("mdc,dc->md", sel, edges[:, :-1])
        right = jnp.einsum("mdc,dc->md", sel, edges[:, 1:])
        width = jnp.maximum(right - left, self.min_bin_width)
        center = 0.5 * (left + right)
        return left, right, width, center

    # -- logits ----------------------------------------------------------------
    def _logits_flat(self, params, parents: Optional[jax.Array], m: int):
        """[M, Dout, C] (log-softmax NOT yet applied)."""
        c, d = self.n_classes, self.output_dim
        net = params["net"]
        if self.input_dim == 0:
            if self.root_ready:
                lp = jax.nn.log_softmax(
                    params["root_log_probs"] / self.temperature, axis=-1
                )
                return jnp.broadcast_to(lp[None], (m, d, c))
            return jnp.broadcast_to(
                net["logits"][None] / self.temperature, (m, d, c)
            )
        out = mlp_apply(
            net, parents, self.activation,
            resolve_compute_dtype(self.compute_dtype),
        )
        return out.reshape(m, d, c) / self.temperature

    # -- training ---------------------------------------------------------------
    def _nll(self, net, parents, targets, aux):
        """Weighted CE with label smoothing; targets are float bin indices."""
        m = targets.shape[0]
        c, d = self.n_classes, self.output_dim
        logits = mlp_apply(net, parents, self.activation).reshape(m, d, c)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        t = targets.astype(jnp.int32)
        one_hot = jax.nn.one_hot(t, c, dtype=jnp.float32)
        eps = self.label_smoothing
        if eps > 0:
            one_hot = (1.0 - eps) * one_hot + eps / c
        if self.class_weighting == "inverse_freq":
            log_probs = log_probs * aux["class_weights"][None, None, :]
        return -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))

    def _train(self, params, key, parents, x, *, steps, batch_size, lr,
               weight_decay, max_grad_norm, allow_expand, force_bins,
               ema_alpha=None):
        x_np = np.asarray(x, np.float32)
        if x_np.ndim == 1:
            x_np = x_np[:, None]
        if x_np.ndim == 3:
            x_np = x_np.reshape(-1, x_np.shape[-1])
        bins = self._refresh_bins(
            params, x_np, allow_expand=allow_expand, force=force_bins
        )
        params = {**params, "bins": bins}
        if self.input_dim == 0:
            # Root fast path: empirical histogram (softmax_nn.py:761-777).
            t = np.asarray(self._x_to_bin(bins, jnp.asarray(x_np)))
            counts = np.zeros((self.output_dim, self.n_classes), np.float64)
            for dim in range(self.output_dim):
                counts[dim] = np.bincount(
                    t[:, dim], minlength=self.n_classes
                )
            probs = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1.0)
            eps = self.label_smoothing
            if eps > 0:
                probs = (1.0 - eps) * probs + eps / self.n_classes
            self.root_ready = True
            return {
                **params,
                "root_log_probs": jnp.asarray(
                    np.log(np.maximum(probs, 1e-12)).astype(np.float32)
                ),
            }
        targets = np.asarray(self._x_to_bin(bins, jnp.asarray(x_np)))
        aux = None
        if self.class_weighting == "inverse_freq":
            counts = np.bincount(
                targets.reshape(-1), minlength=self.n_classes
            ).astype(np.float64)
            w = counts.sum() / np.maximum(counts, 1.0)
            w = w / max(w.mean(), 1e-12)
            aux = {"class_weights": jnp.asarray(w.astype(np.float32))}
        else:
            aux = {"class_weights": jnp.ones((self.n_classes,), jnp.float32)}
        net, opt = fit_minibatch_nll(
            self, "_nll", params["net"], params.get("opt"), key,
            jnp.asarray(parents, jnp.float32).reshape(-1, self.input_dim),
            targets.astype(np.float32),
            epochs=steps, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay, max_grad_norm=max_grad_norm, aux=aux,
            ema_alpha=ema_alpha,
        )
        return {**params, "net": net, "opt": opt}

    def fit(self, params, key, parents, x, *, epochs=1, lr=1e-3,
            batch_size=128, weight_decay=0.0, max_grad_norm=None, **_kw):
        return self._train(params, key, parents, x, steps=epochs,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm,
                           allow_expand=False, force_bins=True)

    def update(self, params, key, parents, x, *, lr=1e-3, n_steps=1,
               batch_size=128, weight_decay=0.0, max_grad_norm=None,
               ema_alpha=None, **_kw):
        return self._train(params, key, parents, x, steps=n_steps,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm,
                           allow_expand=True, force_bins=False,
                           ema_alpha=ema_alpha)

    # -- pure kernels --------------------------------------------------------
    def support_values(self, params: Params) -> jax.Array:
        """[Dout, C] sample values (bin centers / discrete classes)."""
        return params["bins"]["sample_values"]

    def categorical_probs(self, params: Params, parents: Optional[jax.Array]):
        m = 1 if parents is None else parents.shape[0]
        lp = jax.nn.log_softmax(self._logits_flat(params, parents, m), axis=-1)
        probs = jnp.exp(lp)
        if self.output_dim == 1:
            return probs[:, 0, :]
        return probs

    def _sample_flat(self, params, key, parents, m):
        if not self.bins_ready:
            raise RuntimeError("Bins not initialized. Call fit(...) first.")
        bins = params["bins"]
        logits = self._logits_flat(params, parents, m)  # [M, D, C]
        k_cat, k_within, k_gauss = jax.random.split(key, 3)
        g = jax.random.gumbel(k_cat, logits.shape, dtype=logits.dtype)
        idx = jnp.argmax(jax.nn.log_softmax(logits, axis=-1) + g, axis=-1)

        sv = bins["sample_values"]  # [D, C]
        sel = jax.nn.one_hot(idx, self.n_classes, dtype=sv.dtype)
        disc_values = jnp.einsum("mdc,dc->md", sel, sv)

        left, right, width, center = self._gather_edges(bins, idx)
        u = jax.random.uniform(k_within, center.shape, dtype=center.dtype)
        if self.within_bin == "uniform":
            cont_values = left + u * width
        elif self.within_bin == "triangular":
            left_vals = left + width * jnp.sqrt(jnp.maximum(u * 0.5, 0.0))
            right_vals = right - width * jnp.sqrt(
                jnp.maximum((1.0 - u) * 0.5, 0.0)
            )
            cont_values = jnp.where(u < 0.5, left_vals, right_vals)
        else:  # gaussian
            sigma = jnp.maximum(
                self.within_bin_scale * width, self.min_bin_width
            )
            cont_values = center + jax.random.normal(
                k_gauss, center.shape, dtype=center.dtype
            ) * sigma
        if self.within_bin_clip:
            cont_values = jnp.clip(cont_values, left, right)
        mask = bins["is_discrete"][None, :] > 0.5
        return jnp.where(mask, disc_values, cont_values)

    def _log_prob_flat(self, params, x, parents):
        if not self.bins_ready:
            raise RuntimeError("Bins not initialized. Call fit(...) first.")
        bins = params["bins"]
        m = x.shape[0]
        logits = self._logits_flat(params, parents, m)
        idx = self._x_to_bin(bins, x)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        sel = jax.nn.one_hot(idx, self.n_classes, dtype=log_probs.dtype)
        log_bin = jnp.sum(sel * log_probs, axis=-1)

        left, right, width, center = self._gather_edges(bins, idx)
        x_use = jnp.clip(x, left, right) if self.within_bin_clip else x
        if self.within_bin == "uniform":
            log_within = -jnp.log(width)
        elif self.within_bin == "triangular":
            denom_left = jnp.maximum(
                width * (center - left), self.min_bin_width**2
            )
            denom_right = jnp.maximum(
                width * (right - center), self.min_bin_width**2
            )
            pdf = jnp.where(
                x_use <= center,
                2.0 * (x_use - left) / denom_left,
                2.0 * (right - x_use) / denom_right,
            )
            log_within = jnp.log(jnp.maximum(jnp.maximum(pdf, 0.0), 1e-12))
        else:  # gaussian
            sigma = jnp.maximum(
                self.within_bin_scale * width, self.min_bin_width
            )
            z = (x_use - center) / sigma
            log_within = -0.5 * (z * z + LOG_2PI) - jnp.log(sigma)
        if self.within_bin in ("uniform", "triangular") and not self.within_bin_clip:
            inside = (x >= left) & (x <= right)
            log_within = jnp.where(inside, log_within, -jnp.inf)
        mask_cont = bins["is_discrete"][None, :] <= 0.5
        log_within = jnp.where(mask_cont, log_within, 0.0)
        return jnp.sum(log_bin + log_within, axis=-1)

    def debug_mode(self) -> dict:
        return {
            "n_classes": self.n_classes,
            "within_bin": self.within_bin,
            "binning": self.binning,
            "mode_when_not_discrete": self.mode_when_not_discrete,
        }


def _erfinv(y: np.ndarray) -> np.ndarray:
    """Vectorized inverse error function (Winitzki approximation + Newton).

    Used only for the 'gaussian' binning mode's normal icdf at fit time
    (host-side); accuracy after two Newton refinements is ~1e-12.
    """
    y = np.clip(np.asarray(y, np.float64), -1 + 1e-12, 1 - 1e-12)
    a = 0.147
    ln = np.log(1.0 - y * y)
    t1 = 2.0 / (np.pi * a) + ln / 2.0
    x = np.sign(y) * np.sqrt(np.sqrt(t1 * t1 - ln / a) - t1)
    sqrt_pi = np.sqrt(np.pi)
    for _ in range(2):
        x = x - (_erf_np(x) - y) * sqrt_pi / 2.0 * np.exp(x * x)
    return x


def _erf_np(x: np.ndarray) -> np.ndarray:
    from math import erf

    return np.vectorize(erf)(x)
