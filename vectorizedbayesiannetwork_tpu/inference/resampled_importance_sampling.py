"""Sequential importance resampling (SIR).

Capability parity with
``/root/reference/vbn/inference/resampled_importance_sampling.py:13-105``:
after each evidence node's weight accumulation, compute ESS and, when below
``ess_threshold``·S on any batch row, resample all particles and reset the
weights. TPU-first: the whole sequential sweep *including* resampling is
one compiled program — the data-dependent "resample or not" branch becomes
a branchless per-batch-row ``where`` select (resampled vs original
particles), so no host sync happens mid-sweep (SURVEY.md §7 "dynamic-shape
traps").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.plan import pack_fixed_values
from ..core.registry import register_inference
from ..core.rng import fold
from ..ops.resample import (
    gather_particles,
    multinomial_resample_indices,
    systematic_resample_indices,
)
from ..ops.resample_distributed import (
    distributed_resample_gather,
    distributed_resample_supported,
)
from ..ops.resample_pallas import (
    multinomial_resample_gather,
    srg_available,
    srg_supported,
    systematic_resample_gather,
)
from ._base import CompiledMethod, Program
from ._sweep import node_values


@register_inference("resampled_importance_sampling")
class ResampledImportanceSampling(CompiledMethod):
    """``resample_method``: 'systematic' (default — the standard SMC
    choice, lower variance, and search-free on TPU) or 'multinomial' (the
    reference's ``torch.multinomial`` semantics; its searchsorted lowering
    costs ~20 rounds of random gathers at large S)."""

    def __init__(
        self,
        n_samples: int = 512,
        ess_threshold: float = 0.5,
        resample: bool = True,
        clamp_obs: bool = True,
        resample_method: str = "systematic",
        **_kwargs,
    ) -> None:
        super().__init__()
        self.n_samples = int(n_samples)
        self.ess_threshold = float(ess_threshold)
        self.resample = bool(resample)
        self.clamp_obs = bool(clamp_obs)
        if resample_method not in {"systematic", "multinomial"}:
            raise ValueError(
                "resample_method must be 'systematic' or 'multinomial'"
            )
        self.resample_method = resample_method
        self._last_ess: Optional[jax.Array] = None
        self._resampled_dev = None  # device bool from the last call

    @property
    def _last_resampled(self) -> bool:
        """Whether the last call resampled any row (lazy device sync)."""
        if self._resampled_dev is None:
            return False
        return bool(np.asarray(self._resampled_dev))

    def make_program(self, vbn, query: Query, **kwargs):
        s = int(kwargs.get("n_samples", self.n_samples))
        ess_threshold = float(kwargs.get("ess_threshold", self.ess_threshold))
        resample = bool(kwargs.get("resample", self.resample))
        clamp_obs = bool(kwargs.get("clamp_obs", self.clamp_obs))
        resample_method = str(
            kwargs.get("resample_method", self.resample_method)
        )
        resample_indices = (
            systematic_resample_indices
            if resample_method == "systematic"
            else multinomial_resample_indices
        )
        plan, b = self._plan_and_batch(vbn, query)
        fixed = pack_fixed_values(query, plan, b, clamp_obs=clamp_obs)
        cpds = self._cpds(vbn, plan)
        t = plan.target_idx
        threshold = (
            max(1.0, ess_threshold * float(s))
            if ess_threshold <= 1.0
            else float(ess_threshold)
        )

        def live_after(idx: int) -> list:
            """Nodes whose particle values are still read after node
            ``idx``'s resampling event: parents of an unprocessed node or
            the target itself. Fixed nodes are broadcast over the
            particle axis, so resampling is the identity on them — skip.
            Everything else is dead and XLA would drop its gather anyway;
            not emitting it keeps the HLO small."""
            out = []
            for j in range(idx + 1):
                if plan.is_fixed(j):
                    continue
                needed = j == t or any(
                    j in plan.parent_idx[k]
                    for k in range(idx + 1, plan.n_nodes)
                )
                if needed:
                    out.append(j)
            return out

        def fn(params_tuple, key, fixed_vals):
            bb = fixed_vals.shape[0]
            vals = [None] * plan.n_nodes
            log_w = jnp.zeros((bb, s), jnp.float32)
            any_resampled = jnp.zeros((), bool)
            last_ess = jnp.full((bb,), float(s), jnp.float32)
            for idx in range(plan.n_nodes):
                d = plan.node_dims[idx]
                off = plan.node_offsets[idx]
                pidx = plan.parent_idx[idx]
                if pidx:
                    parents = jnp.concatenate(
                        [vals[p] for p in pidx], axis=-1
                    )
                    pflat = parents.reshape(bb * s, -1)
                else:
                    pflat = None
                if plan.is_fixed(idx):
                    v = jnp.broadcast_to(
                        fixed_vals[:, None, off : off + d], (bb, s, d)
                    )
                    vals[idx] = v
                    if plan.evidence_mask[idx]:
                        lp = cpds[idx]._log_prob_flat(
                            params_tuple[idx], v.reshape(bb * s, d), pflat
                        )
                        log_w = log_w + lp.reshape(bb, s)
                        if resample:
                            weights = jax.nn.softmax(log_w, axis=1)
                            ess = 1.0 / jnp.sum(weights**2, axis=1)
                            last_ess = ess
                            need = ess < threshold  # [B]
                            # Branchless per-row select: resample the
                            # still-live sampled nodes + reset weights
                            # only where ESS collapsed. One fused gather
                            # over the concatenated live values instead
                            # of one gather per node.
                            live = [
                                j for j in live_after(idx)
                                if vals[j] is not None
                            ]
                            if live:
                                cat = jnp.concatenate(
                                    [vals[j] for j in live], axis=-1
                                )
                                d_live = cat.shape[-1]
                                mesh = getattr(vbn, "_mesh", None)
                                if mesh is not None and (
                                    distributed_resample_supported(
                                        mesh, bb, s
                                    )
                                ):
                                    # Sharded particle axis: ppermute-ring
                                    # distributed resampling — the fused
                                    # sorted-gather kernel per shard, one
                                    # rotation of values, no global
                                    # all-gather (SURVEY §5.8's
                                    # "distributed systematic
                                    # resampling" reduction point).
                                    res = distributed_resample_gather(
                                        fold(key, 10_000 + idx),
                                        weights,
                                        cat,
                                        mesh,
                                        method=resample_method,
                                    )
                                elif (
                                    mesh is None
                                    and srg_available()
                                    and srg_supported(s, d_live)
                                ):
                                    # Fused merge kernel: never
                                    # materializes ancestor indices
                                    # (ops/resample_pallas.py) — ~6.7x
                                    # over the index+gather XLA path at
                                    # 8 x 1M on v5e (multinomial rides
                                    # the same kernel via sorted uniform
                                    # order statistics).
                                    fused = (
                                        systematic_resample_gather
                                        if resample_method == "systematic"
                                        else multinomial_resample_gather
                                    )
                                    res = fused(
                                        fold(key, 10_000 + idx),
                                        weights,
                                        cat,
                                    )
                                else:
                                    ridx = resample_indices(
                                        fold(key, 10_000 + idx), weights
                                    )
                                    res = gather_particles(cat, ridx)
                                cat = jnp.where(
                                    need[:, None, None], res, cat
                                )
                                o = 0
                                for j in live:
                                    dj = plan.node_dims[j]
                                    vals[j] = cat[..., o : o + dj]
                                    o += dj
                            log_w = jnp.where(
                                need[:, None], jnp.zeros_like(log_w), log_w
                            )
                            any_resampled = any_resampled | jnp.any(need)
                    continue
                sub = fold(key, idx)
                v = cpds[idx]._sample_flat(
                    params_tuple[idx], sub, pflat, bb * s
                )
                vals[idx] = v.reshape(bb, s, d)
            packed = jnp.concatenate(vals, axis=-1)
            weights = jax.nn.softmax(log_w, axis=1)
            return (
                weights,
                node_values(plan, packed, t),
                last_ess,
                any_resampled,
            )


        def post(outs):
            weights, samples, ess, resampled = outs
            self._last_ess = ess
            self._resampled_dev = resampled
            return weights, samples

        return Program(
            plan,
            ("ris", s, threshold, resample, clamp_obs, resample_method),
            fn,
            self._params_tuple(vbn, plan),
            fixed,
            post,
        )

    def infer_posterior(self, vbn, query: Query, **kwargs):
        return self._run_program(vbn, self.make_program(vbn, query, **kwargs))
