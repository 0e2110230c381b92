"""Round-5 remaining-corpus ACCURACY bundle (VERDICT r4 missing #6).

sachs / child / water / munin_sub1 / andes / pigs / diabetes — the
named discrete bnlearn members that had no committed fixture, now
seeded reconstructions with exact VE ground truth
(``benchmarking/corpus.py``). With these plus the canonical, midsize,
large, high-cardinality, and link-scale classes, every DISCRETE member
of the reference corpus (`/root/reference/benchmarking/metadata/
bnlearn.json`) has an accuracy-bearing stand-in; the gaussian/clg
classes are covered by r5_gaussian and the clg bundles.

Usage (on the TPU host):
    python -m benchmarking.scripts.r5_corpus \
        [--out benchmarking/out/r5_corpus] [--skip-ref]
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

NAMES = "sachs,child,water,munin_sub1,andes,pigs,diabetes"
TPU_MODELS = ["exact_oracle", "vbn_ct_lw_dyn", "vbn_ct_mcm_dyn"]
REF_MODELS = ["ref_vbn_ct_lw"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r5_corpus")
    ap.add_argument("--names", default=NAMES)
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
