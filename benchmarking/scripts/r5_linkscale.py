"""Round-5 link/munin-scale ACCURACY bundle (round-4 VERDICT next #1).

The round-4 link-scale rows (benchmarking/out/r4_linkscale_fused2) were
timing-only: the unconstrained ``random_bn`` fixtures at 724/1041 nodes
have unbounded treewidth, so every ``kl_common`` was NaN and the
329-489x serving claims had no accuracy evidence behind them. The real
link/munin networks ARE junction-tree tractable — the reference computes
exact GT for its whole corpus
(``/root/reference/benchmarking/II_query_generation/bnlearn.py:1201-1326``).

This driver regenerates the same scale regime with BOUNDED treewidth
(``networks.random_bn_treewidth``: partial-k-tree wiring, family state
counts <= 4096), so stage II computes exact VE ground truth (one
min-fill elimination order per network, ~26-39 ms/query at this scale)
and the aggregate's KL/JS/WS columns are numbers, not NaN — for the
fused scan-kernel serving rows AND the torch reference rows.

Usage (on the TPU host):
    python -m benchmarking.scripts.r5_linkscale \
        [--out benchmarking/out/r5_linkscale] [--skip-ref]
"""

from __future__ import annotations

import argparse

from ..bundles import BenchmarkBundle, BenchmarkBundleSpec
from ..pipeline import (
    stage_data,
    stage_networks,
    stage_queries,
    stage_report,
    stage_run,
)
from .r2_suite import _print_aggregate

# exact_oracle: host VE with the cached min-fill order (the honest host
# baseline AND the success-path cross-check against stage-II GT).
# vbn_ct_ce: the exact ladder — rides the compiled junction tree when the
# max clique fits, else delegates; included to pin device-exact rows at
# this scale. The sampling rows are the round-4 headline serving path
# (fused mask-dynamic scan kernel behind dynamic_masks=True).
TPU_MODELS = [
    "exact_oracle",
    "vbn_ct_lw_dyn",
    "vbn_ct_mcm_dyn",
]
REF_MODELS = ["ref_vbn_ct_lw"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r5_linkscale")
    ap.add_argument("--sizes", default="724,1041")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--models", default=",".join(TPU_MODELS))
    args = ap.parse_args(argv)

    spec = BenchmarkBundleSpec(
        source="random_tw",
        source_kwargs={
            "sizes": [int(s) for s in args.sizes.split(",")],
            "max_card": 4,
            "max_indegree": 3,
        },
        n_queries=args.n_queries,
        n_rows=args.n_rows,
        ground_truth=True,
    )
    bundle = BenchmarkBundle(args.out, spec)
    stage_networks(bundle)
    stage_queries(bundle)
    stage_data(bundle)
    stage_run(bundle, args.models.split(","), seed=spec.seed)
    if not args.skip_ref:
        # Reference pass on an otherwise-idle host (two-pass protocol,
        # round-3 VERDICT weak #4).
        stage_run(bundle, REF_MODELS, seed=spec.seed)
    stage_report(bundle)
    _print_aggregate(bundle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
