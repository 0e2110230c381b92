"""Round-5 gaussian class at ecoli70/magic/arth150 scale (VERDICT r4 #4).

The committed gaussian accuracy corpus stopped at 32 nodes although
exact linear-Gaussian posteriors are closed-form at ANY size (one
Schur-complement solve — ``gaussian_bn.GaussianBN.conditional``); the
reference's gaussian flagship is arth150 (107 nodes / 150 arcs), with
ecoli70 (46n) and magic_niab/magic_irri (44/64n) in between
(``/root/reference/benchmarking/metadata/bnlearn.json``). This driver
runs seeded random linear-Gaussian networks at those three scales with
exact GT rows for every query — the regime where the LG scan kernel's
6x-over-XLA-dyn-sweep claim previously had only a BENCH_NOTES one-liner.

Usage (on the TPU host):
    python -m benchmarking.scripts.r5_gaussian \
        [--out benchmarking/out/r5_gaussian] [--skip-ref]
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

TPU_MODELS = [
    "exact_oracle",
    "vbn_lg_exact",
    "vbn_lg_lw_dyn",
    "vbn_lg_is_dyn",
]
REF_MODELS = ["ref_vbn_lg_lw"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r5_gaussian")
    # 46 ~ ecoli70, 64 ~ magic_irri, 107 ~ arth150 (the flagship)
    ap.add_argument("--sizes", default="46,64,107")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--models", default=",".join(TPU_MODELS))
    args = ap.parse_args(argv)

    spec = BenchmarkBundleSpec(
        source="random_gaussian",
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
