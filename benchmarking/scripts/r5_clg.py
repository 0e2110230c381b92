"""Round-5 clgaussian class at the named members' scales.

healthcare (7n) / sangiovese (15n) / mehra-class (24n) — the reference
suite's conditional-linear-Gaussian members
(``/root/reference/benchmarking/metadata/bnlearn.json``); previous
bundles ran the class at 8/16 nodes only. Seeded random CLG networks at
the three named scales with exact mixture-enumeration ground truth
(``clg_bn.clg_ground_truth``).

Usage: python -m benchmarking.scripts.r5_clg [--out ...] [--skip-ref]
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

TPU_MODELS = ["exact_oracle", "vbn_clg_mdn_lw_dyn", "vbn_clg_gnn_lw_dyn"]
REF_MODELS = ["ref_vbn_clg_gnn_lw"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r5_clg")
    # 7 ~ healthcare, 15 ~ sangiovese, 24 ~ mehra
    ap.add_argument("--sizes", default="7,15,24")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--models", default=",".join(TPU_MODELS))
    args = ap.parse_args(argv)

    spec = BenchmarkBundleSpec(
        source="random_clg",
        source_kwargs={"sizes": [int(s) for s in args.sizes.split(",")]},
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
