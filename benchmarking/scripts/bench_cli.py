"""Benchmark pipeline CLI (the reference's 01..05 stage scripts in one).

Usage:
    python -m benchmarking.scripts.bench_cli all \
        --out benchmarking/out --models vbn_ct_lw exact_oracle \
        --source builtin --n-queries 64 --n-rows 2000

    python -m benchmarking.scripts.bench_cli networks|queries|data|run|report \
        --bundle <path> [stage options]

Parity: ``/root/reference/benchmarking/scripts/0{1..5}_*.py`` argparse CLIs
with JSON-valued overrides (``04_run_benchmark.py:14-120``).
"""

from __future__ import annotations

import argparse
import json
import sys

from ..bundles import BenchmarkBundle, BenchmarkBundleSpec, find_latest_bundle
from ..pipeline import (
    run_pipeline,
    stage_data,
    stage_networks,
    stage_queries,
    stage_report,
    stage_run,
)


def _spec_from_args(args) -> BenchmarkBundleSpec:
    source_kwargs = json.loads(args.source_kwargs) if args.source_kwargs else {}
    return BenchmarkBundleSpec(
        mode=args.mode,
        source=args.source,
        source_kwargs=source_kwargs,
        n_queries=args.n_queries,
        n_rows=args.n_rows,
        seed=args.seed,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="bench_cli")
    sub = parser.add_subparsers(dest="stage", required=True)

    def common(p):
        p.add_argument("--out", default="benchmarking/out")
        p.add_argument("--bundle", default=None)
        p.add_argument("--mode", default="inference",
                       choices=["cpds", "inference", "both"])
        p.add_argument("--source", default="builtin")
        p.add_argument("--source-kwargs", default=None,
                       help="JSON kwargs for the network source")
        p.add_argument("--n-queries", type=int, default=64)
        p.add_argument("--n-rows", type=int, default=2000)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--models", nargs="*", default=["vbn_ct_lw"])
        p.add_argument("--max-batch", type=int, default=256)
        p.add_argument("--dry-run", action="store_true")

    for name in ["all", "networks", "queries", "data", "run", "report"]:
        common(sub.add_parser(name))

    args = parser.parse_args(argv)

    if args.stage == "all":
        if args.dry_run:
            print(json.dumps({"stage": "all", "models": args.models}))
            return 0
        bundle = run_pipeline(args.out, args.models, _spec_from_args(args))
        print(f"bundle: {bundle.path}")
        print(f"report: {bundle.dir('report')}/index.md")
        return 0

    if args.bundle:
        bundle = BenchmarkBundle.load(args.bundle)
    elif args.stage == "networks":
        bundle = BenchmarkBundle(args.out, _spec_from_args(args))
    else:
        latest = find_latest_bundle(args.out)
        if latest is None:
            print("No bundle found; run `networks` first.", file=sys.stderr)
            return 1
        bundle = BenchmarkBundle.load(latest)

    if args.stage == "networks":
        names = stage_networks(bundle)
        print(f"{bundle.path}: networks {names}")
    elif args.stage == "queries":
        stage_queries(bundle)
        print("queries + ground truth written")
    elif args.stage == "data":
        stage_data(bundle)
        print("datasets written")
    elif args.stage == "run":
        if args.dry_run:
            print(json.dumps({"models": args.models,
                              "problems": bundle.problems()}))
            return 0
        summary = stage_run(bundle, args.models, seed=args.seed,
                            max_batch=args.max_batch)
        print(json.dumps(summary, indent=2))
    elif args.stage == "report":
        path = stage_report(bundle)
        print(f"report: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
