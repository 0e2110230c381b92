"""Categorical CPD with learned embeddings for discrete parents.

Capability parity with
``/root/reference/vbn/cpds/categorical_embedded_softmax.py:47-511``: per-
parent embedding tables -> MLP -> class logits with invalid classes masked
to -1e9, declared-or-inferred parent/class supports, inverse-frequency class
weighting with torch cross-entropy semantics (weighted mean), module rebuild
when the resolved class count changes, update continues training.

TPU-first: supports are resolved host-side into static spec state; parent
values are pre-mapped to integer indices so the jit-scanned trainer sees
(embed-gather -> GEMM -> masked CE); embedding lookup is a one-hot matmul
friendly gather.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd
from ._mlp import (
    check_activation,
    mlp_apply,
    mlp_init,
    resolve_compute_dtype,
)
from ._train import fit_minibatch_nll

_NEG = -1e9


@register_cpd("categorical_embedded_softmax")
class CategoricalEmbeddedSoftmaxCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        n_classes: int = 0,
        parent_n_classes: Optional[List[int]] = None,
        embedding_dim: int = 8,
        hidden_dims: Sequence[int] = (64, 64),
        activation: str = "relu",
        label_smoothing: float = 0.0,
        class_weighting: str = "none",
        max_grad_norm: Optional[float] = None,
        compute_dtype: str = "float32",
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.n_classes = int(n_classes)
        self.parent_n_classes = (
            [int(v) for v in parent_n_classes]
            if parent_n_classes is not None
            else None
        )
        self.embedding_dim = int(embedding_dim)
        self.hidden_dims = tuple(int(h) for h in hidden_dims)
        self.activation = check_activation(str(activation))
        self.label_smoothing = float(label_smoothing)
        self.class_weighting = str(class_weighting).lower().strip()
        self.max_grad_norm = max_grad_norm
        resolve_compute_dtype(compute_dtype)
        self.compute_dtype = str(compute_dtype)
        if self.embedding_dim <= 0:
            raise ValueError("embedding_dim must be >= 1")
        if self.class_weighting not in {"none", "inverse_freq"}:
            raise ValueError("class_weighting must be 'none' or 'inverse_freq'")
        # fit-resolved static structure
        self.parent_cards: Optional[Tuple[int, ...]] = None
        self.resolved_classes: int = max(self.n_classes, 0)
        self.ready = False

    def get_init_kwargs(self):
        return {
            "n_classes": self.n_classes,
            "parent_n_classes": self.parent_n_classes,
            "embedding_dim": self.embedding_dim,
            "hidden_dims": list(self.hidden_dims),
            "activation": self.activation,
            "label_smoothing": self.label_smoothing,
            "class_weighting": self.class_weighting,
            "max_grad_norm": self.max_grad_norm,
            "compute_dtype": self.compute_dtype,
        }

    def get_extra_state(self):
        return {
            "parent_cards": (
                list(self.parent_cards) if self.parent_cards is not None else None
            ),
            "resolved_classes": self.resolved_classes,
            "ready": self.ready,
        }

    def set_extra_state(self, state) -> None:
        if not state:
            return
        pc = state.get("parent_cards")
        self.parent_cards = tuple(pc) if pc is not None else None
        self.resolved_classes = int(state.get("resolved_classes", self.n_classes))
        self.ready = bool(state.get("ready", False))

    def _static_fields(self) -> tuple:
        return (
            self.embedding_dim,
            self.hidden_dims,
            self.activation,
            self.label_smoothing,
            self.class_weighting,
            self.parent_cards,
            self.resolved_classes,
            self.ready,
            self.compute_dtype,
        )

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        return {}

    def _build_params(self, key: jax.Array) -> Params:
        c = max(self.resolved_classes, 1)
        d = self.output_dim
        if self.input_dim == 0:
            net = {"logits": jnp.zeros((d, c), jnp.float32)}
            emb = {}
        else:
            net = mlp_init(
                jax.random.fold_in(key, 1),
                self.embedding_dim * self.input_dim,
                self.hidden_dims,
                d * c,
            )
            emb = {}
            for i, card in enumerate(self.parent_cards or ()):
                # torch nn.Embedding default init: N(0, 1)
                emb[f"e{i}"] = jax.random.normal(
                    jax.random.fold_in(key, 100 + i),
                    (card, self.embedding_dim),
                    jnp.float32,
                )
        return {"net": net, "emb": emb, "opt": None}

    # -- host-side support inference -----------------------------------------
    def _resolve_supports(self, p_np: np.ndarray, x_np: np.ndarray):
        cards: List[int] = []
        parent_values: List[np.ndarray] = []
        if self.parent_n_classes is not None:
            if len(self.parent_n_classes) != self.input_dim:
                raise ValueError(
                    f"parent_n_classes length {len(self.parent_n_classes)} "
                    f"does not match input_dim {self.input_dim}."
                )
            for d, card in enumerate(self.parent_n_classes):
                if int(card) <= 0:
                    raise ValueError(
                        f"Invalid parent cardinality {card} at index {d}."
                    )
                support = np.arange(int(card), dtype=np.float32)
                if not np.isin(p_np[:, d], support).all():
                    raise ValueError(
                        f"Found values outside support for parent {d}."
                    )
                parent_values.append(support)
                cards.append(int(card))
        else:
            for d in range(self.input_dim):
                uniq = np.unique(p_np[:, d].astype(np.float32))
                parent_values.append(uniq)
                cards.append(int(uniq.size))

        declared = self.n_classes if self.n_classes > 0 else None
        class_values: List[np.ndarray] = []
        counts: List[int] = []
        if declared is not None:
            for d in range(self.output_dim):
                support = np.arange(declared, dtype=np.float32)
                if not np.isin(x_np[:, d], support).all():
                    raise ValueError(
                        f"Found values outside support for target dim {d}."
                    )
                class_values.append(support)
                counts.append(declared)
            c = declared
        else:
            for d in range(self.output_dim):
                uniq = np.unique(x_np[:, d].astype(np.float32))
                class_values.append(uniq)
                counts.append(int(uniq.size))
            c = max(counts, default=1)
        cv_pad = np.zeros((self.output_dim, c), np.float32)
        cm = np.zeros((self.output_dim, c), bool)
        for d in range(self.output_dim):
            if counts[d] > c:
                raise ValueError(
                    f"Found {counts[d]} classes for dim {d}, but n_classes={c}."
                )
            cv_pad[d, : counts[d]] = class_values[d]
            cm[d, : counts[d]] = True
        return parent_values, tuple(cards), cv_pad, cm, int(c)

    # -- index mapping --------------------------------------------------------
    def _parents_to_indices(self, params, parents: jax.Array) -> jax.Array:
        """[M, Din] values -> [M, Din] int indices."""
        if self.input_dim == 0:
            return jnp.zeros((parents.shape[0], 0), jnp.int32)
        pv = params["parent_values"]
        pm = params["parent_mask"].astype(bool)
        less = (pv[None] < parents[:, :, None]) & pm[None]
        return jnp.sum(less, axis=-1).astype(jnp.int32)

    def _targets_to_indices(self, params, x: jax.Array) -> jax.Array:
        cv = params["class_values"]
        cm = params["class_mask"].astype(bool)
        less = (cv[None] < x[:, :, None]) & cm[None]
        return jnp.sum(less, axis=-1).astype(jnp.int32)

    # -- logits ---------------------------------------------------------------
    def _embed(self, params_net_emb, parent_idx: jax.Array) -> jax.Array:
        emb = params_net_emb["emb"]
        parts = [
            emb[f"e{i}"][parent_idx[:, i]] for i in range(self.input_dim)
        ]
        return jnp.concatenate(parts, axis=-1)

    def _masked_logits_from_idx(
        self, net_emb, class_mask, parent_idx, m, dt=None
    ):
        c = max(self.resolved_classes, 1)
        if self.input_dim == 0:
            logits = jnp.broadcast_to(
                net_emb["net"]["logits"][None], (m, self.output_dim, c)
            )
        else:
            feats = self._embed(net_emb, parent_idx)
            logits = mlp_apply(
                net_emb["net"], feats, self.activation, dt
            ).reshape(m, self.output_dim, c)
        return jnp.where(class_mask[None] > 0.5, logits, _NEG)

    # -- training -------------------------------------------------------------
    def _nll(self, net_emb, parent_idx_f, targets_f, aux):
        m = targets_f.shape[0]
        c = max(self.resolved_classes, 1)
        parent_idx = parent_idx_f.astype(jnp.int32)
        t = targets_f.astype(jnp.int32)
        logits = self._masked_logits_from_idx(
            net_emb, aux["class_mask"], parent_idx, m
        )
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        one_hot = jax.nn.one_hot(t, c, dtype=jnp.float32)
        eps = self.label_smoothing
        if eps > 0:
            one_hot = (1.0 - eps) * one_hot + eps / c
        ce = -jnp.sum(one_hot * log_probs, axis=-1)  # [M, Dout]
        w = aux["class_weights"][t]  # [M, Dout]
        # torch F.cross_entropy(weight=...) mean: sum(w*ce)/sum(w)
        return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-12)

    def _train(self, params, key, parents, x, *, steps, batch_size, lr,
               weight_decay, max_grad_norm, ema_alpha=None):
        x_np = np.asarray(x, np.float32)
        if x_np.ndim == 1:
            x_np = x_np[:, None]
        if x_np.ndim == 3:
            x_np = x_np.reshape(-1, x_np.shape[-1])
        n = x_np.shape[0]
        p_np = (
            np.zeros((n, 0), np.float32)
            if parents is None
            else np.asarray(parents, np.float32).reshape(n, -1)
        )
        parent_values, cards, cv_pad, cm, c = self._resolve_supports(p_np, x_np)
        rebuild = (
            not self.ready
            or self.parent_cards != cards
            or self.resolved_classes != c
            or "net" not in params
        )
        self.parent_cards = cards
        self.resolved_classes = c
        max_card = max(cards, default=1)
        pv_pad = np.zeros((self.input_dim, max_card), np.float32)
        pv_mask = np.zeros_like(pv_pad, bool)
        for d in range(self.input_dim):
            pv_pad[d, : cards[d]] = parent_values[d]
            pv_mask[d, : cards[d]] = True
        if rebuild:
            params = self._build_params(key)
            # Data-dependent init: start the class logits at the empirical
            # log-marginal — the cross-entropy OPTIMUM for root nodes, and a
            # calibrated bias for the MLP's final layer otherwise — so the
            # default training budget refines a good solution instead of
            # crawling up from uniform. (The reference trains from torch's
            # default init, vbn/cpds/categorical_embedded_softmax.py:330-430;
            # at its default 50 epochs x lr 1e-3 that leaves logits within
            # ~0.05 of zero, which cannot represent a skewed marginal.)
            t_idx = np.zeros(x_np.shape, np.int64)
            for d in range(self.output_dim):
                vals = cv_pad[d, cm[d]]
                t_idx[:, d] = np.searchsorted(vals, x_np[:, d])
            hist = np.zeros((self.output_dim, c), np.float64)
            for d in range(self.output_dim):
                hist[d] = np.bincount(t_idx[:, d], minlength=c)
            hist = (hist + 1.0) / (hist.sum(axis=1, keepdims=True) + c)
            log_marg = np.where(cm, np.log(hist), 0.0).astype(np.float32)
            if self.input_dim == 0:
                params["net"]["logits"] = jnp.asarray(log_marg)
            else:
                params["net"]["layers"][-1]["b"] = jnp.asarray(
                    log_marg.reshape(-1)
                )
        params = {
            **params,
            "class_values": jnp.asarray(cv_pad),
            "class_mask": jnp.asarray(cm.astype(np.float32)),
            "parent_values": jnp.asarray(pv_pad),
            "parent_mask": jnp.asarray(pv_mask),
        }
        parent_idx = np.asarray(
            self._parents_to_indices(params, jnp.asarray(p_np))
        ).astype(np.float32)
        targets = np.asarray(
            self._targets_to_indices(params, jnp.asarray(x_np))
        )
        if self.class_weighting == "inverse_freq":
            counts = np.bincount(targets.reshape(-1), minlength=c).astype(
                np.float64
            )
            w = counts.sum() / np.maximum(counts, 1.0)
            w = w / max(w.mean(), 1e-12)
        else:
            w = np.ones((c,), np.float64)
        aux = {
            "class_weights": jnp.asarray(w.astype(np.float32)),
            "class_mask": params["class_mask"],
        }
        net_emb = {"net": params["net"], "emb": params.get("emb", {})}
        new_net_emb, opt = fit_minibatch_nll(
            self, "_nll", net_emb, params.get("opt"), key,
            parent_idx, targets.astype(np.float32),
            epochs=steps, batch_size=batch_size, lr=lr,
            weight_decay=weight_decay,
            max_grad_norm=(
                max_grad_norm if max_grad_norm is not None else self.max_grad_norm
            ),
            aux=aux,
            ema_alpha=ema_alpha,
        )
        self.ready = True
        return {
            **params,
            "net": new_net_emb["net"],
            "emb": new_net_emb["emb"],
            "opt": opt,
        }

    def fit(self, params, key, parents, x, *, epochs=1, lr=1e-3,
            batch_size=128, weight_decay=0.0, max_grad_norm=None, **_kw):
        return self._train(params, key, parents, x, steps=epochs,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm)

    def update(self, params, key, parents, x, *, lr=1e-3, n_steps=1,
               batch_size=128, weight_decay=0.0, max_grad_norm=None,
               ema_alpha=None, **_kw):
        return self._train(params, key, parents, x, steps=n_steps,
                           batch_size=batch_size, lr=lr,
                           weight_decay=weight_decay,
                           max_grad_norm=max_grad_norm, ema_alpha=ema_alpha)

    def update_program(self, conf):
        """Pure update for the DECLARED-support, already-fitted case
        (fused update path): support tables live in params, index mapping
        is the masked comparison-count, inverse-frequency class weights
        become an in-graph one-hot bincount, and training is the
        jit-scanned Adam loop. Inferred-support nodes stay eager (their
        update may refine the static spec from data)."""
        if not self.ready or self.n_classes <= 0:
            return None
        if self.input_dim > 0 and self.parent_n_classes is None:
            return None
        conf = dict(conf)
        c = int(self.resolved_classes)

        def fn(params, key, parents, x):
            x2 = jnp.asarray(x, jnp.float32)
            if x2.ndim == 1:
                x2 = x2[:, None]
            n = x2.shape[0]
            if parents is None:
                parents = jnp.zeros((n, 0), jnp.float32)
            else:
                parents = jnp.asarray(parents, jnp.float32).reshape(n, -1)
            parent_idx = self._parents_to_indices(params, parents).astype(
                jnp.float32
            )
            targets = self._targets_to_indices(params, x2)
            if self.class_weighting == "inverse_freq":
                counts = jnp.sum(
                    jax.nn.one_hot(targets.reshape(-1), c, dtype=jnp.float32),
                    axis=0,
                )
                w = jnp.sum(counts) / jnp.maximum(counts, 1.0)
                w = w / jnp.maximum(jnp.mean(w), 1e-12)
            else:
                w = jnp.ones((c,), jnp.float32)
            aux = {
                "class_weights": w,
                "class_mask": params["class_mask"],
            }
            net_emb = {"net": params["net"], "emb": params.get("emb", {})}
            mgn = conf.get("max_grad_norm")
            new_net_emb, opt = fit_minibatch_nll(
                self, "_nll", net_emb, params.get("opt"), key,
                parent_idx, targets.astype(jnp.float32),
                epochs=conf.get("n_steps", 1),
                batch_size=conf.get("batch_size", 128),
                lr=conf.get("lr", 1e-3),
                weight_decay=conf.get("weight_decay", 0.0),
                max_grad_norm=mgn if mgn is not None else self.max_grad_norm,
                aux=aux,
                ema_alpha=conf.get("ema_alpha"),
            )
            return {
                **params,
                "net": new_net_emb["net"],
                "emb": new_net_emb["emb"],
                "opt": opt,
            }

        return fn

    def update_host_precheck(self, params, parents, x) -> None:
        """Declared-support membership checks the eager path would raise."""
        x_np = np.asarray(x, np.float32).reshape(-1, self.output_dim)
        support = np.arange(max(self.n_classes, 1), dtype=np.float32)
        for d in range(self.output_dim):
            if not np.isin(x_np[:, d], support).all():
                raise ValueError(
                    f"Found values outside support for target dim {d}."
                )
        if self.input_dim and parents is not None:
            p_np = np.asarray(parents, np.float32).reshape(-1, self.input_dim)
            for d, card in enumerate(self.parent_n_classes or []):
                if not np.isin(
                    p_np[:, d], np.arange(int(card), dtype=np.float32)
                ).all():
                    raise ValueError(
                        f"Found values outside support for parent {d}."
                    )

    # -- pure kernels --------------------------------------------------------
    def _logits_flat(self, params, parents: Optional[jax.Array], m: int):
        if not self.ready:
            raise RuntimeError(
                "CategoricalEmbeddedSoftmaxCPD is not fitted yet."
            )
        if self.input_dim == 0:
            parent_idx = jnp.zeros((m, 0), jnp.int32)
        else:
            parent_idx = self._parents_to_indices(params, parents)
        net_emb = {"net": params["net"], "emb": params.get("emb", {})}
        return self._masked_logits_from_idx(
            net_emb, params["class_mask"], parent_idx, m,
            resolve_compute_dtype(self.compute_dtype),
        )

    def support_values(self, params: Params) -> jax.Array:
        """[Dout, C] class values (categorical_exact / RB support grid)."""
        return params["class_values"]

    def categorical_probs(self, params: Params, parents: Optional[jax.Array]):
        m = 1 if parents is None else parents.shape[0]
        probs = jax.nn.softmax(self._logits_flat(params, parents, m), axis=-1)
        if self.output_dim == 1:
            return probs[:, 0, :]
        return probs

    def _sample_flat(self, params, key, parents, m):
        logits = self._logits_flat(params, parents, m)
        g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
        idx = jnp.argmax(logits + g, axis=-1)  # [M, Dout]
        cv = params["class_values"]
        # one-hot contraction instead of a TPU gather (small C)
        sel = jax.nn.one_hot(idx, cv.shape[-1], dtype=cv.dtype)
        return jnp.einsum("mdc,dc->md", sel, cv)

    def _log_prob_flat(self, params, x, parents):
        m = x.shape[0]
        logits = self._logits_flat(params, parents, m)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        tidx = self._targets_to_indices(params, x)
        sel = jax.nn.one_hot(tidx, log_probs.shape[-1], dtype=log_probs.dtype)
        picked = jnp.sum(sel * log_probs, axis=-1)
        return jnp.sum(picked, axis=-1)
