"""Mask-dynamic exact enumeration over a discrete network's joint support.

For a fully discrete network whose joint state space fits on chip, the
posterior ``p(target | evidence, do)`` is exact: enumerate all joint
states once (static tables), build each node's CPT in-graph from its
params, and reduce per-query with three GEMM-shaped contractions. ONE
compiled program per network answers every query skeleton — including
queries the reference's ``categorical_exact`` must route to a sampling
fallback (latent parents), cf.
``/root/reference/vbn/inference/categorical_exact.py:13-128``.

Design notes (TPU-first):
- State tables (digit matrix, per-node CPT row indices, one-hot state
  codes) are host-built numpy constants folded into the program.
- CPTs are built IN-GRAPH by evaluating ``categorical_probs`` on the
  enumerated parent-value combinations, so fitted params can change
  without retracing and any discrete CPD family (tables, embedded
  softmax MLPs, ...) is supported.
- Per-query work is three einsums over ``[B, S]`` — CPT mixture
  ``L @ (1-do)``, clamped-state match via a one-hot GEMM, and the
  target-class histogram — no ``[B, S, n]`` materialization, so batch
  and state axes both stay MXU-tileable.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.plan import InferencePlan

_BIG_NEG = jnp.float32(-1e30)


def _node_cards(plan: InferencePlan, cpds: Sequence) -> Optional[Tuple[int, ...]]:
    """Per-node class counts, or None if any node is not enum-compatible."""
    cards = []
    for idx, cpd in enumerate(cpds):
        if plan.node_dims[idx] != 1:
            return None
        if not (
            hasattr(cpd, "categorical_probs") and hasattr(cpd, "support_values")
        ):
            return None
        k = int(
            getattr(cpd, "resolved_classes", 0)
            or getattr(cpd, "n_classes", 0)
            or 0
        )
        if k <= 0:
            return None
        cards.append(k)
    return tuple(cards)


def exact_enum_supported(
    plan: InferencePlan, cpds: Sequence, max_states: int
) -> bool:
    cards = _node_cards(plan, cpds)
    if cards is None:
        return False
    states = 1
    for k in cards:
        states *= k
        if states > max_states:
            return False
    return True


def _mixed_radix_digits(count: int, radices: Sequence[int]) -> np.ndarray:
    """[count, len(radices)] digit matrix, last radix fastest-varying."""
    out = np.zeros((count, len(radices)), np.int32)
    rem = np.arange(count, dtype=np.int64)
    for j in range(len(radices) - 1, -1, -1):
        out[:, j] = rem % radices[j]
        rem //= radices[j]
    return out


def make_exact_enum_fn(plan: InferencePlan, cpds: Sequence, k_out: int):
    """Pure ``fn(params_tuple, packed_in) -> (pmf [B, k_out],)``.

    ``packed_in`` is the (fixed, ev_mask, do_mask, target_idx) tuple from
    ``pack_dynamic_inputs``; pmf rows are unnormalized (caller divides).
    """
    cards = _node_cards(plan, cpds)
    assert cards is not None
    n = plan.n_nodes
    k_enc = max(k_out, max(cards))
    digits = _mixed_radix_digits(int(np.prod(cards)), cards)  # [S, n]
    states = digits.shape[0]

    # Per-node static gather indices into the flattened in-graph CPT, and
    # the parent class-combination digits the CPT rows enumerate.
    flat_cpt_idx, combo_digits = [], []
    for i in range(n):
        pidx = plan.parent_idx[i]
        row = np.zeros(states, np.int64)
        for p in pidx:
            row = row * cards[p] + digits[:, p]
        flat_cpt_idx.append((row * cards[i] + digits[:, i]).astype(np.int32))
        combo_digits.append(
            _mixed_radix_digits(
                int(np.prod([cards[p] for p in pidx], dtype=np.int64)),
                [cards[p] for p in pidx],
            )
            if pidx
            else None
        )

    # One-hot state codes [S, n*k_enc]: column block i holds onehot(class_i).
    state_codes = np.zeros((states, n, k_enc), np.float32)
    rows = np.arange(states)
    for i in range(n):
        state_codes[rows, i, digits[:, i]] = 1.0
    state_codes = state_codes.reshape(states, n * k_enc)

    hi = jax.lax.Precision.HIGHEST

    def fn(params_tuple, packed_in):
        fixed, ev_mask, do_mask, target_idx = packed_in
        b = fixed.shape[0]
        codes = jnp.asarray(state_codes)

        log_cpts, fixed_onehot = [], []
        for i in range(n):
            cpd, k, pidx = cpds[i], cards[i], plan.parent_idx[i]
            support = cpd.support_values(params_tuple[i])[0][:k]  # [k] values
            if pidx:
                pmat = jnp.stack(
                    [
                        jnp.take(
                            cpds[p].support_values(params_tuple[p])[0][
                                : cards[p]
                            ],
                            jnp.asarray(combo_digits[i][:, j]),
                        )
                        for j, p in enumerate(pidx)
                    ],
                    axis=-1,
                )  # [n_combos, m] parent values
            else:
                pmat = None
            probs = cpd.categorical_probs(params_tuple[i], pmat)  # [rows, k]
            logp = jnp.log(jnp.maximum(probs[..., :k], 1e-30))
            log_cpts.append(
                jnp.take(logp.reshape(-1), jnp.asarray(flat_cpt_idx[i]))
            )  # [S]
            # Clamped value -> nearest support class, one-hot encoded.
            col = fixed[:, plan.node_offsets[i]]  # [B]
            cls = jnp.argmin(jnp.abs(col[:, None] - support[None, :]), axis=1)
            fixed_onehot.append(jax.nn.one_hot(cls, k_enc, dtype=jnp.float32))

        log_joint = jnp.stack(log_cpts, axis=1)  # [S, n]
        clamped = jnp.maximum(ev_mask, do_mask)  # [B, n]
        clamp_codes = (
            jnp.stack(fixed_onehot, axis=1) * clamped[:, :, None]
        ).reshape(b, n * k_enc)

        # do() drops the intervened node's own CPT factor (graph surgery);
        # evidence keeps every factor and only masks states.
        cpt_sum = jnp.einsum("si,bi->bs", log_joint, 1.0 - do_mask, precision=hi)
        matches = jnp.einsum("sm,bm->bs", codes, clamp_codes, precision=hi)
        mismatch = jnp.sum(clamped, axis=1)[:, None] - matches
        total = cpt_sum + jnp.where(mismatch > 0.5, _BIG_NEG, 0.0)

        weights = jnp.exp(total - jnp.max(total, axis=1, keepdims=True))
        hist = jnp.einsum("bs,sm->bm", weights, codes, precision=hi).reshape(
            b, n, k_enc
        )
        tgt = jax.nn.one_hot(target_idx, n, dtype=jnp.float32)
        pmf = jnp.einsum("bnc,bn->bc", hist, tgt, precision=hi)
        return (pmf[:, :k_out],)

    return fn
