"""Exact tabular categorical CPD with Dirichlet/Laplace smoothing.

Capability parity with
``/root/reference/vbn/cpds/categorical_table.py:23-417``: declared-or-
inferred parent/class supports, mixed-radix parent indexing, smoothing with
``alpha_mode`` in {per_class, total_mass} and ``prior`` in {uniform,
global}, class-mask padding for ragged supports, update = refit.

TPU-first redesign: support inference happens host-side at fit time (numpy)
and becomes *static spec state*; value->index mapping is a vectorized
masked comparison-count (no searchsorted, no data-dependent shapes); count
accumulation is one scatter-add; sampling is Gumbel-argmax over gathered
log-probs — everything inside the compiled sweep.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import BaseCPD, Params
from ..core.registry import register_cpd


def _host_unique(col: np.ndarray) -> np.ndarray:
    return np.unique(col.astype(np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("p_states", "c", "alpha", "alpha_mode", "prior"),
)
def _accumulate_counts(
    p_np,  # [N, Din] f32 parent values
    x_np,  # [N, Dout] f32 target values
    class_values_pad,  # [Dout, C]
    class_mask,  # [Dout, C] bool
    pv_pad,  # [Din, Kp]
    pv_mask,  # [Din, Kp] bool
    strides,  # [Din] int32 mixed-radix strides
    *,
    p_states: int,
    c: int,
    alpha: float,
    alpha_mode: str,
    prior: str,
):
    """Device-side CPT count accumulation as ONE jitted program.

    Previously ran eagerly per node — through the remote-compile tunnel
    every eager op pays its own dispatch, so a 200-node fit spent ~90 s
    mostly on per-node op streams. Same-signature nodes now share one
    compiled scatter-add program (jit caches on shapes + these statics).
    """
    n = x_np.shape[0]
    dout = x_np.shape[1]
    if p_np.shape[1] == 0:
        parent_idx = jnp.zeros((n,), jnp.int32)
    else:
        less = (pv_pad[None, :, :] < p_np[:, :, None]) & pv_mask[None, :, :]
        idx_d = jnp.sum(less, axis=-1).astype(jnp.int32)
        parent_idx = jnp.sum(idx_d * strides[None, :], axis=-1)
    less_t = (
        class_values_pad[None, :, :] < x_np[:, :, None]
    ) & class_mask[None, :, :]
    target_idx = jnp.sum(less_t, axis=-1).astype(jnp.int32)  # [N, Dout]
    counts = jnp.zeros((dout, p_states * c), jnp.float32)
    flat = parent_idx[:, None] * c + target_idx
    counts = jax.vmap(
        lambda cnt, idx: cnt.at[idx].add(1.0), in_axes=(0, 1)
    )(counts, flat)
    counts = counts.reshape(dout, p_states, c)

    if alpha > 0:
        mask_f = class_mask.astype(jnp.float32)
        if prior == "uniform":
            prior_probs = mask_f / jnp.maximum(
                jnp.sum(mask_f, axis=1, keepdims=True), 1e-12
            )
        else:  # global empirical marginal
            marg = jax.vmap(
                lambda idx: jnp.zeros((c,)).at[idx].add(1.0), in_axes=1
            )(target_idx)
            marg = marg * mask_f
            denom = jnp.sum(marg, axis=1, keepdims=True)
            uniform = mask_f / jnp.maximum(
                jnp.sum(mask_f, axis=1, keepdims=True), 1e-12
            )
            prior_probs = jnp.where(
                denom > 1e-12, marg / jnp.maximum(denom, 1e-12), uniform
            )
        prior_mass = alpha * c if alpha_mode == "per_class" else alpha
        counts = counts + prior_mass * prior_probs[:, None, :]

    return counts * class_mask.astype(jnp.float32)[:, None, :]


@register_cpd("categorical_table")
class CategoricalTableCPD(BaseCPD):
    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        *,
        seed: Optional[int] = None,
        n_classes: int = 0,
        parent_n_classes: Optional[List[int]] = None,
        alpha: float = 1.0,
        alpha_mode: str = "per_class",
        prior: str = "uniform",
        **_ignored,
    ) -> None:
        super().__init__(input_dim, output_dim, seed=seed)
        self.n_classes = int(n_classes)
        self.parent_n_classes = (
            [int(v) for v in parent_n_classes]
            if parent_n_classes is not None
            else None
        )
        self.alpha = float(alpha)
        self.alpha_mode = str(alpha_mode).lower().strip()
        self.prior = str(prior).lower().strip()
        if self.alpha < 0:
            raise ValueError("alpha must be >= 0")
        if self.alpha_mode not in {"per_class", "total_mass"}:
            raise ValueError("alpha_mode must be 'per_class' or 'total_mass'")
        if self.prior not in {"uniform", "global"}:
            raise ValueError("prior must be 'uniform' or 'global'")
        # Fit-time-resolved static structure:
        self.parent_cards: Optional[Tuple[int, ...]] = None
        self.max_parent_card: int = 0
        self.resolved_classes: int = max(self.n_classes, 0)

    def get_init_kwargs(self):
        return {
            "n_classes": self.n_classes,
            "parent_n_classes": self.parent_n_classes,
            "alpha": self.alpha,
            "alpha_mode": self.alpha_mode,
            "prior": self.prior,
        }

    def get_extra_state(self):
        return {
            "parent_cards": (
                list(self.parent_cards) if self.parent_cards is not None else None
            ),
            "max_parent_card": self.max_parent_card,
            "resolved_classes": self.resolved_classes,
        }

    def set_extra_state(self, state) -> None:
        if not state:
            return
        pc = state.get("parent_cards")
        self.parent_cards = tuple(pc) if pc is not None else None
        self.max_parent_card = int(state.get("max_parent_card", 0))
        self.resolved_classes = int(
            state.get("resolved_classes", self.n_classes)
        )

    def _static_fields(self) -> tuple:
        return (
            self.alpha,
            self.alpha_mode,
            self.prior,
            self.parent_cards,
            self.max_parent_card,
            self.resolved_classes,
        )

    @property
    def _strides(self) -> Tuple[int, ...]:
        cards = self.parent_cards or ()
        strides = []
        s = 1
        for card in reversed(cards):
            strides.append(s)
            s *= card
        return tuple(reversed(strides))

    @property
    def _parent_states(self) -> int:
        s = 1
        for card in self.parent_cards or ():
            s *= card
        return s

    # -- lifecycle ----------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        return {}

    def fit(
        self,
        params: Params,
        key: jax.Array,
        parents: Optional[jax.Array],
        x: jax.Array,
        **_training_kwargs,
    ) -> Params:
        x_np = np.asarray(x, np.float32)
        if x_np.ndim == 1:
            x_np = x_np[:, None]
        if x_np.ndim == 3:
            x_np = x_np.reshape(-1, x_np.shape[-1])
        n = x_np.shape[0]
        if parents is None:
            p_np = np.zeros((n, 0), np.float32)
        else:
            p_np = np.asarray(parents, np.float32)
            if p_np.ndim == 3:
                p_np = p_np.reshape(-1, p_np.shape[-1])
        if p_np.shape[-1] != self.input_dim:
            raise ValueError(
                f"Expected parents_dim {self.input_dim}, got {p_np.shape[-1]}"
            )

        # ---- host-side support inference (static spec refinement) ----
        parent_values: List[np.ndarray] = []
        cards: List[int] = []
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
                self._check_in_support(p_np[:, d], support, f"parent {d}")
                parent_values.append(support)
                cards.append(int(card))
        else:
            for d in range(self.input_dim):
                uniq = _host_unique(p_np[:, d])
                parent_values.append(uniq)
                cards.append(int(uniq.size))
        self.parent_cards = tuple(cards)
        self.max_parent_card = max(cards, default=0)

        class_values: List[np.ndarray] = []
        class_counts: List[int] = []
        declared = self.n_classes if self.n_classes > 0 else None
        if declared is not None:
            for d in range(self.output_dim):
                support = np.arange(declared, dtype=np.float32)
                self._check_in_support(x_np[:, d], support, f"target dim {d}")
                class_values.append(support)
                class_counts.append(declared)
            c = declared
        else:
            for d in range(self.output_dim):
                uniq = _host_unique(x_np[:, d])
                class_values.append(uniq)
                class_counts.append(int(uniq.size))
            c = max(class_counts, default=1)
        self.resolved_classes = int(c)

        class_values_pad = np.zeros((self.output_dim, c), np.float32)
        class_mask = np.zeros((self.output_dim, c), bool)
        for d in range(self.output_dim):
            k = class_counts[d]
            if k > c:
                raise ValueError(
                    f"Found {k} classes for dim {d}, but n_classes={c}."
                )
            class_values_pad[d, :k] = class_values[d]
            class_mask[d, :k] = True

        pv_pad = np.zeros((self.input_dim, max(self.max_parent_card, 1)), np.float32)
        pv_mask = np.zeros_like(pv_pad, dtype=bool)
        for d in range(self.input_dim):
            pv_pad[d, : cards[d]] = parent_values[d]
            pv_mask[d, : cards[d]] = True

        # ---- device-side count accumulation (one jitted scatter-add,
        # shared across same-signature nodes) ----
        new_params = {
            "class_values": jnp.asarray(class_values_pad),
            "class_mask": jnp.asarray(class_mask),
            "parent_values": jnp.asarray(pv_pad),
            "parent_mask": jnp.asarray(pv_mask),
        }
        new_params["counts"] = _accumulate_counts(
            jnp.asarray(p_np),
            jnp.asarray(x_np),
            new_params["class_values"],
            new_params["class_mask"],
            new_params["parent_values"],
            new_params["parent_mask"],
            jnp.asarray(self._strides, jnp.int32),
            p_states=int(self._parent_states),
            c=int(c),
            alpha=float(self.alpha),
            alpha_mode=str(self.alpha_mode),
            prior=str(self.prior),
        )
        return new_params

    @staticmethod
    def _check_in_support(col, support, label):
        if not np.isin(col, support).all():
            raise ValueError(f"Found values outside support for {label}.")

    def update_program(self, conf):
        """Pure refit-on-new-data (fused update path), DECLARED supports.

        With ``n_classes`` and (for parented nodes) ``parent_n_classes``
        declared, the support tables are spec constants already resolved
        into params, so the refit is exactly the jitted scatter-add
        count program. Inferred-support nodes return None: their eager
        update may refine the static spec from data (host-side), which a
        compiled program cannot."""
        if self.n_classes <= 0 or (
            self.input_dim > 0 and self.parent_n_classes is None
        ):
            return None
        if self.input_dim > 0 and not self.parent_cards:
            return None  # not fitted yet (support tables absent)
        p_states = int(self._parent_states)
        c = int(self.resolved_classes)
        strides = np.asarray(self._strides, np.int32)

        def fn(params, key, parents, x):
            x = jnp.asarray(x, jnp.float32)
            if x.ndim == 1:
                x = x[:, None]
            n = x.shape[0]
            if parents is None:
                parents = jnp.zeros((n, 0), jnp.float32)
            else:
                parents = jnp.asarray(parents, jnp.float32).reshape(n, -1)
            counts = _accumulate_counts(
                parents,
                x,
                params["class_values"],
                params["class_mask"],
                params["parent_values"],
                params["parent_mask"],
                jnp.asarray(strides),
                p_states=p_states,
                c=c,
                alpha=float(self.alpha),
                alpha_mode=str(self.alpha_mode),
                prior=str(self.prior),
            )
            return {**params, "counts": counts}

        return fn

    def update_host_precheck(self, params, parents, x) -> None:
        """Declared-support membership checks the eager fit would raise."""
        x_np = np.asarray(x, np.float32).reshape(-1, self.output_dim)
        support = np.arange(max(self.n_classes, 1), dtype=np.float32)
        for d in range(self.output_dim):
            self._check_in_support(x_np[:, d], support, f"target dim {d}")
        if self.input_dim and parents is not None:
            p_np = np.asarray(parents, np.float32).reshape(-1, self.input_dim)
            for d, card in enumerate(self.parent_n_classes or []):
                self._check_in_support(
                    p_np[:, d],
                    np.arange(int(card), dtype=np.float32),
                    f"parent {d}",
                )

    # -- index mapping (vectorized masked comparison-count) -------------------
    #
    # TPU lane-padding rule (the round-2 HBM OOM, VERDICT.md): any
    # materialized array whose trailing dim k satisfies 1 < k < 128
    # tile-pads k -> 128 lanes under the T(8,128) layout, and gathers /
    # RNG ops are fusion boundaries that DO materialize. At M = B*S in
    # the tens of millions a [M, 2] gather output becomes a 64x HBM
    # blow-up (f32[201326592,2] -> 96 GiB on a 16 GiB chip). So for
    # small class counts every hot-path op below is restructured as a
    # STATIC Python loop over classes with [M]-shaped operands only —
    # no trailing dim between 2 and 127 ever reaches HBM.
    _LANE = 128

    def _parents_to_index(self, params: Params, parents: jax.Array) -> jax.Array:
        """[M, Din] float values -> [M] mixed-radix parent state index."""
        if self.input_dim == 0:
            return jnp.zeros((parents.shape[0],), jnp.int32)
        pv = params["parent_values"]  # [Din, K]
        pm = params["parent_mask"]
        k = pv.shape[-1]
        strides = self._strides
        if 1 < k < self._LANE:
            # static per-value loop: [M]-shaped comparisons only
            idx = jnp.zeros((parents.shape[0],), jnp.int32)
            for d in range(self.input_dim):
                col = parents[:, d]
                cnt = jnp.zeros_like(idx)
                for j in range(k):
                    hit = (pv[d, j] < col) & pm[d, j]
                    cnt = cnt + hit.astype(jnp.int32)
                idx = idx + cnt * int(strides[d])
            return idx
        less = (pv[None, :, :] < parents[:, :, None]) & pm[None, :, :]
        idx_d = jnp.sum(less, axis=-1).astype(jnp.int32)  # [M, Din]
        strides = jnp.asarray(strides, jnp.int32)
        return jnp.sum(idx_d * strides[None, :], axis=-1)

    def _targets_to_index(self, params: Params, x: jax.Array) -> jax.Array:
        """[M, Dout] float values -> [M, Dout] class indices."""
        cv = params["class_values"]  # [Dout, C]
        cm = params["class_mask"]
        less = (cv[None, :, :] < x[:, :, None]) & cm[None, :, :]
        return jnp.sum(less, axis=-1).astype(jnp.int32)

    # -- pure kernels --------------------------------------------------------
    def _log_probs(self, params: Params, parents: Optional[jax.Array], m: int):
        """[M, Dout, C] log conditional class probabilities."""
        counts = params["counts"]  # [Dout, P, C]
        if self.input_dim == 0:
            probs = counts[:, 0, :]
            probs = probs / jnp.maximum(
                jnp.sum(probs, axis=-1, keepdims=True), 1e-12
            )
            lp = jnp.log(jnp.maximum(probs, 1e-12))
            return jnp.broadcast_to(lp[None], (m,) + lp.shape)
        pidx = self._parents_to_index(params, parents)  # [M]
        sel = counts[:, pidx, :]  # [Dout, M, C]
        sel = jnp.swapaxes(sel, 0, 1)  # [M, Dout, C]
        probs = sel / jnp.maximum(jnp.sum(sel, axis=-1, keepdims=True), 1e-12)
        return jnp.log(jnp.maximum(probs, 1e-12))

    def categorical_probs(self, params: Params, parents: Optional[jax.Array]):
        m = 1 if parents is None else parents.shape[0]
        lp = self._log_probs(params, parents, m)
        if self.output_dim == 1:
            return jnp.exp(lp[:, 0, :])
        return jnp.exp(lp)

    def support_values(self, params: Params) -> "jax.Array":
        """[Dout, C] class values (categorical_exact / RB support grid)."""
        return params["class_values"]

    _SELECT_ROWS = 64  # below this many CPT rows, select beats a gather

    def _count_col(self, params, pidx, d: int, j: int):
        """Class-``j`` count column for output dim ``d``: [M] (or scalar root).

        For small CPTs the row lookup is a static per-row select chain
        ([M]-shaped wheres) instead of a vector gather — TPU gathers run
        on the scalar core and dominate the sweep at M in the tens of
        millions, while the select chain is pure VPU work that XLA CSEs
        across the repeated per-class calls.
        """
        cnt_d = params["counts"][d]  # [P, C]
        if pidx is None:
            return cnt_d[0, j]
        p_rows = cnt_d.shape[0]
        # cap total trace size: the select chain costs P ops per class and
        # is CSE'd to ~C*P ops per node — beyond that, one gather per class
        if p_rows <= self._SELECT_ROWS and p_rows * cnt_d.shape[1] <= 2048:
            acc = jnp.where(pidx == 0, cnt_d[0, j], 0.0)
            for r in range(1, p_rows):
                acc = acc + jnp.where(pidx == r, cnt_d[r, j], 0.0)
            return acc
        return jnp.take(cnt_d[:, j], pidx)

    def _sample_flat(self, params, key, parents, m):
        c = params["counts"].shape[-1]
        if not 1 < c < self._LANE:
            lp = self._log_probs(params, parents, m)  # [M, Dout, C]
            mask = params["class_mask"][None]  # [1, Dout, C]
            g = jax.random.gumbel(key, lp.shape, dtype=lp.dtype)
            scores = jnp.where(mask, lp + g, -jnp.inf)
            idx = jnp.argmax(scores, axis=-1)  # [M, Dout]
            cv = params["class_values"]  # [Dout, C]
            sel = jax.nn.one_hot(idx, cv.shape[-1], dtype=cv.dtype)
            return jnp.einsum("mdc,dc->md", sel, cv)
        # Small-C inverse-CDF sampling as a static per-class loop over
        # [M]-shaped arrays (see lane-padding note above). Masked-out
        # classes carry zero counts, so the CDF walk skips them.
        pidx = (
            self._parents_to_index(params, parents)
            if self.input_dim > 0
            else None
        )
        cv = params["class_values"]  # [Dout, C]
        keys = jax.random.split(key, self.output_dim)
        cols = []
        for d in range(self.output_dim):
            total = self._count_col(params, pidx, d, 0)
            for j in range(1, c):
                total = total + self._count_col(params, pidx, d, j)
            u = jax.random.uniform(keys[d], (m,), dtype=jnp.float32)
            thresh = u * total  # in [0, total)
            cum = self._count_col(params, pidx, d, 0)
            idx = jnp.zeros((m,), jnp.int32)
            for j in range(1, c):
                idx = idx + (cum <= thresh).astype(jnp.int32)
                cum = cum + self._count_col(params, pidx, d, j)
            val = jnp.zeros((m,), cv.dtype)
            for j in range(c):
                val = val + jnp.where(idx == j, cv[d, j], 0.0)
            cols.append(val)
        return jnp.stack(cols, axis=-1)

    # -- precomputed-noise sampling (MCMC inner loops; see the linear-
    # gaussian counterpart for rationale). Gumbel-max and inverse-CDF
    # draws both factor into parent-independent noise + a parent-
    # dependent transform, so chain samplers hoist ALL steps' RNG out of
    # their lax.scan.
    def _noise_spec(self, params, m):
        c = params["counts"].shape[-1]
        if not 1 < c < self._LANE:
            return ((m, self.output_dim, c), "gumbel")
        return ((m, self.output_dim), "uniform")

    def _sample_flat_noise(self, params, noise, parents, m):
        c = params["counts"].shape[-1]
        if not 1 < c < self._LANE:
            lp = self._log_probs(params, parents, m)  # [M, Dout, C]
            mask = params["class_mask"][None]
            scores = jnp.where(mask, lp + noise.astype(lp.dtype), -jnp.inf)
            idx = jnp.argmax(scores, axis=-1)
            cv = params["class_values"]
            sel = jax.nn.one_hot(idx, cv.shape[-1], dtype=cv.dtype)
            return jnp.einsum("mdc,dc->md", sel, cv)
        pidx = (
            self._parents_to_index(params, parents)
            if self.input_dim > 0
            else None
        )
        cv = params["class_values"]
        cols = []
        for d in range(self.output_dim):
            total = self._count_col(params, pidx, d, 0)
            for j in range(1, c):
                total = total + self._count_col(params, pidx, d, j)
            thresh = noise[:, d].astype(jnp.float32) * total
            cum = self._count_col(params, pidx, d, 0)
            idx = jnp.zeros((m,), jnp.int32)
            for j in range(1, c):
                idx = idx + (cum <= thresh).astype(jnp.int32)
                cum = cum + self._count_col(params, pidx, d, j)
            val = jnp.zeros((m,), cv.dtype)
            for j in range(c):
                val = val + jnp.where(idx == j, cv[d, j], 0.0)
            cols.append(val)
        return jnp.stack(cols, axis=-1)

    def _log_prob_flat(self, params, x, parents):
        m = x.shape[0]
        c = params["counts"].shape[-1]
        if not 1 < c < self._LANE:
            lp = self._log_probs(params, parents, m)
            tidx = self._targets_to_index(params, x)  # [M, Dout]
            sel = jax.nn.one_hot(tidx, lp.shape[-1], dtype=lp.dtype)
            picked = jnp.sum(sel * lp, axis=-1)
            return jnp.sum(picked, axis=-1)
        # Small-C static loop: per-class [M]-shaped selects, no [M, C].
        pidx = (
            self._parents_to_index(params, parents)
            if self.input_dim > 0
            else None
        )
        cv = params["class_values"]  # [Dout, C]
        cm = params["class_mask"]
        out = jnp.zeros((m,), jnp.float32)
        for d in range(self.output_dim):
            xcol = x[:, d]
            tidx = jnp.zeros((m,), jnp.int32)
            for j in range(c):
                hit = (cv[d, j] < xcol) & cm[d, j]
                tidx = tidx + hit.astype(jnp.int32)
            total = self._count_col(params, pidx, d, 0)
            cnt_sel = jnp.where(
                tidx == 0, self._count_col(params, pidx, d, 0), 0.0
            )
            for j in range(1, c):
                col = self._count_col(params, pidx, d, j)
                total = total + col
                cnt_sel = cnt_sel + jnp.where(tidx == j, col, 0.0)
            prob = cnt_sel / jnp.maximum(total, 1e-12)
            out = out + jnp.log(jnp.maximum(prob, 1e-12))
        return out
