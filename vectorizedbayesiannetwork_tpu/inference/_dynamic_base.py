"""Shared machinery for mask-dynamic inference programs (LW / IS / MCM).

``dynamic_masks=True`` moves ALL query structure — evidence/do masks,
their values, and the target index — to runtime inputs, so ONE compiled
program per network serves every query skeleton, and heterogeneous query
mixes fuse into one row-batched dispatch (see ``_dynamic_sweep.py`` for
the sweep itself). The reference recompiles nothing because it runs
eagerly (``/root/reference/vbn/inference/_core.py:27-33`` caches only a
plan); here the analogue of that plan cache is the jit cache, and this
module keeps it O(1) per network for benchmark-style PAC-diverse
workloads.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.base import Query
from ..core.plan import get_plan, pack_fixed_values
from ..core.utils import infer_batch_size
from ._base import CompiledMethod, Program


def pack_dynamic_inputs(
    plan, queries: Sequence[Query], *, clamp_obs: bool, pad_to: int = 1
):
    """Concat queries' rows + per-row masks/targets, pow2-padded.

    Returns ``(inputs_tuple, spans, b_tot, b_pad)`` where spans is
    ``[(lo, hi, target_idx)]`` per query. Shared by the single-query
    dynamic programs and the heterogeneous row-fused dispatch so the two
    paths can never drift. ``pad_to`` raises the padded row count to a
    fixed serving bucket so every dispatch below that size reuses ONE
    compiled program (a cold one-off query pays zero compiles once the
    bucket is warm).
    """
    node_to_idx = plan.node_to_idx()
    bs = [infer_batch_size(q.evidence, q.do) for q in queries]
    b_tot = sum(bs)
    # pad_to >= the true row count is honored EXACTLY (callers pick the
    # serving quantum — e.g. the benchmark runner's multiple-of-32
    # flush pads, where pow2 rounding 96 -> 128 cost 33% kernel time at
    # munin scale); smaller pad_to keeps the pow2 rule so ad-hoc call
    # sites reuse a bounded set of compiled shapes.
    pad_to = int(pad_to)
    b_pad = (
        pad_to
        if pad_to >= b_tot
        else max(1 << max(0, (b_tot - 1)).bit_length(), pad_to)
    )
    # ONE preallocated buffer per operand, filled by row-band views —
    # per-query allocations plus a final concatenate were ~15% of a
    # 96-query link-scale flush (round-5 epilogue profile).
    rows = np.zeros((b_pad, plan.total_dim), np.float32)
    evs = np.zeros((b_pad, plan.n_nodes), np.float32)
    dos = np.zeros((b_pad, plan.n_nodes), np.float32)
    tgts = np.zeros((b_pad,), np.int32)
    spans = []
    at = 0
    for q, b in zip(queries, bs):
        pack_fixed_values(
            q, plan, b, clamp_obs=clamp_obs, out=rows[at : at + b]
        )
        for n in q.evidence:
            evs[at : at + b, node_to_idx[n]] = 1.0
        for n in q.do:
            dos[at : at + b, node_to_idx[n]] = 1.0
        ti = node_to_idx[q.target]
        tgts[at : at + b] = ti
        spans.append((at, at + b, ti))
        at += b
    return (rows, evs, dos, tgts), spans, b_tot, b_pad


class DynamicMaskMethod(CompiledMethod):
    """Base for methods with a mask-dynamic program variant.

    Subclasses implement ``_dynamic_fn(plan, cpds, s, opts)`` returning a
    pure ``fn(params_tuple, key, inputs) -> (pdf[B,S], samples[B,S,maxd],
    *aux)`` and may override ``_dynamic_opts`` (extra static knobs keyed
    into the program tag) and ``_note_dynamic_aux`` (host bookkeeping for
    the aux outputs, e.g. ESS).
    """

    dynamic_tag = "dyn"
    pack_clamp_obs = False  # whether evidence values sanitize at pack time
    # Weight source for the STATIC fused-kernel posterior reductions
    # ("logw" = evidence weights / LW, "lpt" = target density / MCM,
    # None = no static reduction path). See _static_fused_reduce.
    _static_red_src = None

    @property
    def fused_pmf_capable(self) -> bool:
        """Whether ``infer_posterior_pmf`` will serve (vs return None)."""
        return bool(
            getattr(self, "dynamic_masks", False) or self._static_red_src
        )

    @property
    def fused_moments_capable(self) -> bool:
        """Whether ``infer_posterior_moments`` will serve (vs return None)."""
        return bool(
            getattr(self, "dynamic_masks", False) or self._static_red_src
        )

    def _static_fused_reduce(self, vbn, queries, kind, n_classes, kwargs):
        """Per-query fused-kernel posterior reductions on STATIC plans.

        The whole sweep AND the posterior summary run inside the Pallas
        kernel (``want="pmf_*"/"mom_*"``, ops/sweep_pallas.py): nothing
        per-particle ever reaches HBM, and only a [B, k] (or [B, 2])
        row block crosses to host — the in-kernel version of the
        reference's weighted-histogram epilogue
        (``/root/reference/benchmarking/models/vbn.py:202-242``) and
        posterior-moments epilogue (``/root/reference/vbn/vbn.py:483-504``).
        Returns None when the fused kernel does not apply (caller falls
        back to the stream path). Dispatches all queries before the
        first fetch so device work overlaps host-side numpy epilogues.
        """
        src = self._static_red_src
        if src is None:
            return None
        from .likelihood_weighting import LikelihoodWeighting

        if not LikelihoodWeighting._fused_gate(vbn):
            return None
        s = int(kwargs.get("n_samples", self.n_samples))
        pad_bucket = max(1, int(kwargs.get("pad_bucket", 1)))
        want = (f"{kind}_{src}",)
        pending = []
        for q in queries:
            plan, b = self._plan_and_batch(vbn, q)
            cpds = self._cpds(vbn, plan)
            # Pad rows up to the serving bucket (or the next power of
            # two) so every dispatch below that size reuses ONE compiled
            # program per plan instead of one per distinct batch size
            # (round-4 review finding: partial chunks retraced).
            b_pad = max(
                pad_bucket, 1 << max(0, (b - 1)).bit_length()
            )
            fixed = pack_fixed_values(
                q, plan, b, clamp_obs=self.pack_clamp_obs
            )
            if b_pad != b:
                fixed = np.concatenate(
                    [
                        fixed,
                        np.zeros(
                            (b_pad - b, fixed.shape[1]), fixed.dtype
                        ),
                    ],
                    axis=0,
                )
            raw = LikelihoodWeighting._fused_raw_fn(
                plan, cpds, s, vbn, want, batch=b_pad
            )
            if raw is None:
                return None

            def build(_raw=raw):
                def fn(params_tuple, key, fixed_vals):
                    _lw, _tg, _lp, red = _raw(params_tuple, key, fixed_vals)
                    return red  # (sums [B, 128], max_shift [B])

                return fn

            prog = self._compiled(
                vbn, plan, (self.dynamic_tag, "sred", kind, src, s), build
            )
            red = prog(
                self._params_tuple(vbn, plan), vbn.next_key_spec(), fixed
            )
            pending.append((red, plan, b))
        # ONE batched device->host transfer for the whole query list (a
        # per-array fetch pays a full link round-trip each on the remote
        # TPU runtime; the rows are kilobytes).
        fetched = jax.device_get([red[0] for red, _, _ in pending])
        rows, spans, at = [], [], 0
        for sums, (_red, plan, b) in zip(fetched, pending):
            sums = np.asarray(sums).astype(np.float64)[:b]  # drop padding
            if kind == "pmf":
                rows.append(sums[:, : int(n_classes)])
            else:
                s0 = np.maximum(sums[:, 0], 1e-30)
                mean = sums[:, 1] / s0
                var = np.maximum(sums[:, 2] / s0 - mean**2, 0.0)
                rows.append(np.stack([mean, np.sqrt(var)], axis=1))
            spans.append((at, at + b, plan.target_idx))
            at += b
        return np.concatenate(rows, axis=0), spans

    def _dynamic_enabled(self, kwargs) -> bool:
        return bool(
            kwargs.get("dynamic_masks", getattr(self, "dynamic_masks", False))
        )

    def _dynamic_opts(self, kwargs) -> Tuple:
        return ()

    def _dynamic_fn(self, plan, cpds, s: int, opts: Tuple, vbn=None):
        raise NotImplementedError

    def _dyn_red_raw(self, plan, cpds, s: int, opts, vbn, kind: str):
        """Mask-dynamic raw whose OUTPUT is the in-kernel posterior
        reduction (``want=(f"{kind}_{src}",)``), or None when the method
        cannot express its weighting as a single kernel reduction
        (e.g. IS's per-row ESS fallback needs both passes' streams).
        When available, ``infer_posterior_pmf``/``_moments`` skip the
        [B, S] weight/sample streams entirely — at link scale x 1M
        particles that is ~800 MB of HBM round-trip per dispatch the
        kernel never performs."""
        return None

    def _fused_dyn_raw(self, plan, cpds, s: int, vbn, want):
        """Mask-dynamic scan-form Pallas sweep (ops/sweep_scan_pallas.py)
        for this plan, or None. One compiled kernel per network serves
        every evidence pattern — the fused analogue of
        ``dynamic_sweep_trace`` (measured 27-38x over the XLA scan at
        724/1041 nodes, BENCH_NOTES r4). The caller must still check
        ``scan_batch_fits`` at trace time (SMEM holds the [N, B] packed
        query rows)."""
        from .likelihood_weighting import LikelihoodWeighting

        if not LikelihoodWeighting._fused_gate(vbn):
            return None
        from ..ops.sweep_scan_pallas import make_scan_sweep_fn

        return make_scan_sweep_fn(
            plan, cpds, s, want=want,
            mesh=getattr(vbn, "_mesh", None) if vbn is not None else None,
        )

    def _note_dynamic_aux(self, aux: List, sl: slice) -> None:
        pass

    def _canonical_plan(self, vbn):
        """The one network-wide plan every dynamic program shares (masks
        and target are runtime inputs, so any query's plan would do)."""
        topo = tuple(vbn.dag.topological_order())
        return get_plan(vbn, Query(target=topo[0], evidence={}, do={}))

    def _make_dynamic_program(self, vbn, query: Query, s: int, opts: Tuple):
        """Query structure as runtime inputs; one compile per network.

        Programs are keyed by (S, opts, padded batch bucket) only — the
        evidence/do masks, their values, and the target index cross as
        arrays. On the XLA fallback path latent draws match the static
        program bit-for-bit at equal (B, S) (same per-node key folds);
        when the fused scan kernel serves the dispatch instead, it draws
        from its own (seed, tile)-folded Pallas PRNG stream and sanitizes
        fixed values on entry, so draws are NOT bitwise-comparable to the
        static program (only statistically).
        """
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b, b_pad = pack_dynamic_inputs(
            plan, [query], clamp_obs=self.pack_clamp_obs
        )
        t_dim = plan.node_dims[spans[0][2]]

        def post(outs):
            pdf, samples, *aux = outs
            self._note_dynamic_aux(aux, slice(0, b))
            return pdf[:b], samples[:b, :, :t_dim]

        return Program(
            plan,
            (self.dynamic_tag, s) + opts + (b_pad,),
            self._dynamic_fn(plan, cpds, s, opts, vbn),
            self._params_tuple(vbn, plan),
            inputs,
            post,
        )

    def infer_posterior_many(self, vbn, queries, **kwargs):
        """Heterogeneous row-fused dispatch (dynamic mode): ANY mix of
        targets/evidence patterns rides ONE sweep — queries' rows are
        concatenated, per-row masks and target indices cross as arrays,
        and outputs are split back per query. Falls back to the generic
        program-tuple fusion otherwise."""
        if not self._dynamic_enabled(kwargs):
            kwargs.pop("pad_bucket", None)
            return super().infer_posterior_many(vbn, queries, **kwargs)
        pad_bucket = int(kwargs.pop("pad_bucket", 1))
        s = int(kwargs.get("n_samples", self.n_samples))
        opts = self._dynamic_opts(kwargs)
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b_tot, b_pad = pack_dynamic_inputs(
            plan, queries, clamp_obs=self.pack_clamp_obs, pad_to=pad_bucket
        )
        prog_fn = self._compiled(
            vbn,
            plan,
            (self.dynamic_tag, s) + opts + (b_pad,),
            lambda: self._dynamic_fn(plan, cpds, s, opts, vbn),
        )
        outs = prog_fn(
            self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
        )
        pdf, samples, *aux = outs
        self._note_dynamic_aux(aux, slice(0, b_tot))
        res = []
        for lo, hi, t_idx in spans:
            d = plan.node_dims[t_idx]
            res.append((pdf[lo:hi], samples[lo:hi, :, :d]))
        return res

    def infer_posterior_pmf(
        self, vbn, queries, *, n_classes: int, pad_bucket: int = 1, **kwargs
    ) -> Optional[Tuple[np.ndarray, List[Tuple[int, int, int]]]]:
        """Fused dispatch whose OUTPUT is the discrete posterior pmf.

        The particle cloud never leaves the device: the weighted class
        histogram ``sum_s w[b,s] * onehot(sample[b,s])`` — the reference
        backend's host-side epilogue
        (``/root/reference/benchmarking/models/vbn.py:202-242``) — runs
        in-graph as one ``[B*S, k]`` one-hot contraction, so a whole
        problem's query set costs ONE dispatch plus a ``[B, k]`` fetch
        (kilobytes) instead of shipping ``[B, S]`` weights and samples to
        host. Rows are UNNORMALIZED; the caller normalizes over each
        query's true class support (semantics stay in one place).

        Returns ``(pmf [b_tot, n_classes] numpy, spans)`` or None when the
        method has neither a dynamic-mask nor a static fused-kernel path.
        """
        if not self._dynamic_enabled(kwargs):
            return self._static_fused_reduce(
                vbn, queries, "pmf", n_classes,
                dict(kwargs, pad_bucket=pad_bucket),
            )
        k = int(n_classes)
        s = int(kwargs.get("n_samples", self.n_samples))
        opts = self._dynamic_opts(kwargs)
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b_tot, b_pad = pack_dynamic_inputs(
            plan, queries, clamp_obs=self.pack_clamp_obs, pad_to=pad_bucket
        )

        red_raw = self._dyn_red_raw(plan, cpds, s, opts, vbn, "pmf")
        if red_raw is not None and red_raw.fits(b_pad):
            # In-kernel reduction: only [B, 128] summary rows reach HBM.
            # Rows are normalized in-graph (the stream path's softmax
            # weights make its rows sum to 1 as well, so the two paths
            # agree on the caller-visible normalized pmf).
            def build_red():
                def fn(params_tuple, key, packed_in):
                    fixed_vals, evm, dom, ti = packed_in
                    _lw, _tg, _lp, red = red_raw(
                        params_tuple, key, fixed_vals, evm, dom, ti
                    )
                    sums, _m = red
                    pmf = sums[:, :k]
                    return (
                        pmf
                        / jnp.maximum(
                            jnp.sum(pmf, axis=1, keepdims=True), 1e-30
                        ),
                    )

                return fn

            prog_fn = self._compiled(
                vbn,
                plan,
                (self.dynamic_tag, "pmfred", k, s) + opts + (b_pad,),
                build_red,
            )
            (pmf,) = prog_fn(
                self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
            )
            if hasattr(self, "_last_ess"):
                self._last_ess = None  # not computed on the reduced path
            return np.asarray(pmf)[:b_tot], spans

        def build():
            inner = self._dynamic_fn(plan, cpds, s, opts, vbn)

            def fn(params_tuple, key, packed_in):
                pdf, samples, *aux = inner(params_tuple, key, packed_in)
                w = jnp.maximum(jnp.nan_to_num(pdf), 0.0)
                cls = jnp.clip(
                    jnp.round(samples[..., 0]).astype(jnp.int32), 0, k - 1
                )
                oh = jax.nn.one_hot(cls, k, dtype=jnp.float32)
                pmf = jnp.einsum(
                    "bs,bsk->bk", w, oh,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return (pmf,) + tuple(aux)

            return fn

        import os
        import time as _time

        dbg = os.environ.get("VBN_FLUSH_DEBUG")
        t0 = _time.perf_counter()
        prog_fn = self._compiled(
            vbn,
            plan,
            (self.dynamic_tag, "pmf", k, s) + opts + (b_pad,),
            build,
        )
        t1 = _time.perf_counter()
        outs = prog_fn(
            self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
        )
        t2 = _time.perf_counter()
        pmf, *aux = outs
        self._note_dynamic_aux(aux, slice(0, b_tot))
        res = np.asarray(pmf)[:b_tot], spans
        if dbg:
            t3 = _time.perf_counter()
            print(
                f"[pmf] tag={self.dynamic_tag} b_pad={b_pad} "
                f"compile_lookup={1e3 * (t1 - t0):.1f}ms "
                f"dispatch={1e3 * (t2 - t1):.1f}ms "
                f"fetch={1e3 * (t3 - t2):.1f}ms",
                flush=True,
            )
        return res

    def infer_posterior_moments(
        self, vbn, queries, *, pad_bucket: int = 1, **kwargs
    ) -> Optional[Tuple[np.ndarray, List[Tuple[int, int, int]]]]:
        """Fused dispatch whose OUTPUT is per-query posterior (mean, std).

        The continuous-target counterpart of ``infer_posterior_pmf``: the
        weighted first/second moments of a scalar target reduce in-graph
        (normalized weights with in-graph uniform fallback, exactly the
        ``VBN._posterior_stats`` semantics), so a serving batch fetches a
        ``[B, 2]`` array instead of the particle cloud. Returns
        ``(moments [b_tot, 2], spans)`` or None when the method has
        neither a dynamic-mask nor a static fused-kernel path.
        """
        if not self._dynamic_enabled(kwargs):
            return self._static_fused_reduce(
                vbn, queries, "mom", None,
                dict(kwargs, pad_bucket=pad_bucket),
            )
        s = int(kwargs.get("n_samples", self.n_samples))
        opts = self._dynamic_opts(kwargs)
        plan = self._canonical_plan(vbn)
        cpds = self._cpds(vbn, plan)
        inputs, spans, b_tot, b_pad = pack_dynamic_inputs(
            plan, queries, clamp_obs=self.pack_clamp_obs, pad_to=pad_bucket
        )

        red_raw = self._dyn_red_raw(plan, cpds, s, opts, vbn, "mom")
        if red_raw is not None and red_raw.fits(b_pad):
            # In-kernel moments: lanes (sum_w, sum_wx, sum_wx^2); the
            # per-row max shift cancels in the ratios.
            def build_red():
                def fn(params_tuple, key, packed_in):
                    fixed_vals, evm, dom, ti = packed_in
                    _lw, _tg, _lp, red = red_raw(
                        params_tuple, key, fixed_vals, evm, dom, ti
                    )
                    sums, _m = red
                    s0 = jnp.maximum(sums[:, 0], 1e-30)
                    mean = sums[:, 1] / s0
                    var = jnp.maximum(sums[:, 2] / s0 - mean**2, 0.0)
                    return (jnp.stack([mean, jnp.sqrt(var)], axis=1),)

                return fn

            prog_fn = self._compiled(
                vbn,
                plan,
                (self.dynamic_tag, "momred", s) + opts + (b_pad,),
                build_red,
            )
            (mom,) = prog_fn(
                self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
            )
            if hasattr(self, "_last_ess"):
                self._last_ess = None  # not computed on the reduced path
            return np.asarray(mom)[:b_tot], spans

        def build():
            inner = self._dynamic_fn(plan, cpds, s, opts, vbn)

            def fn(params_tuple, key, packed_in):
                pdf, samples, *aux = inner(params_tuple, key, packed_in)
                w = jnp.maximum(
                    jnp.nan_to_num(pdf, nan=0.0, posinf=0.0, neginf=0.0), 0.0
                )
                denom = jnp.sum(w, axis=1, keepdims=True)
                wn = jnp.where(
                    denom > 1e-12,
                    w / jnp.maximum(denom, 1e-12),
                    jnp.full_like(w, 1.0 / w.shape[1]),
                )
                x = samples[..., 0]
                mean = jnp.sum(wn * x, axis=1)
                var = jnp.sum(wn * (x - mean[:, None]) ** 2, axis=1)
                mom = jnp.stack(
                    [mean, jnp.sqrt(jnp.maximum(var, 0.0))], axis=1
                )
                return (mom,) + tuple(aux)

            return fn

        prog_fn = self._compiled(
            vbn,
            plan,
            (self.dynamic_tag, "moments", s) + opts + (b_pad,),
            build,
        )
        outs = prog_fn(
            self._params_tuple(vbn, plan), vbn.next_key_spec(), inputs
        )
        mom, *aux = outs
        self._note_dynamic_aux(aux, slice(0, b_tot))
        return np.asarray(mom)[:b_tot], spans
