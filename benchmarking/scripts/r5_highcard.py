"""Round-5 high-cardinality ACCURACY bundle (round-4 VERDICT next #3).

barley (48n, card <= 67) / mildew (35n, card <= 100) / pathfinder (109n,
card <= 63) — the reference corpus's high-cardinality class
(``/root/reference/benchmarking/metadata/bnlearn.json``), previously
unrepresented: no committed fixture had card > ~12 and the scan kernel
gated at 64 classes. With the class-walk budget raised to the 128-lane
reduction limit, barley and pathfinder ride the fused scan kernel;
mildew's 916k-entry tables exceed the SMEM prefetch budget by design and
pin the documented XLA dyn-sweep fallback numbers at card 100.

All three have exact VE ground truth (bounded-treewidth reconstructions;
see ``benchmarking/highcard.py`` for provenance).

Usage (on the TPU host):
    python -m benchmarking.scripts.r5_highcard \
        [--out benchmarking/out/r5_highcard] [--skip-ref]
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

TPU_MODELS = ["exact_oracle", "vbn_ct_lw_dyn", "vbn_ct_mcm_dyn"]
REF_MODELS = ["ref_vbn_ct_lw"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r5_highcard")
    ap.add_argument("--names", default="barley,mildew,pathfinder")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--models", default=",".join(TPU_MODELS))
    args = ap.parse_args(argv)

    spec = BenchmarkBundleSpec(
        source="builtin",
        source_kwargs={"names": args.names.split(",")},
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
        stage_run(bundle, REF_MODELS, seed=spec.seed)
    stage_report(bundle)
    _print_aggregate(bundle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
