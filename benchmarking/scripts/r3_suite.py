"""Round-3 artifact driver: all benchmark classes + mid-size canonicals.

Extends the round-2 driver (r2_suite.py) with the insurance/alarm
mid-size canonical fixtures (benchmarking/midsize.py) run with the full
discrete backend set and exact VE ground truth, closing the accuracy
regime between the 8-node textbook nets and the link-scale timing-only
runs (round-2 VERDICT next #9). One process so the single TPU-tunnel
grant is acquired once.

Usage:
    python -m benchmarking.scripts.r3_suite --out benchmarking/out/r3 \
        [--discrete-bundle <path>] [--skip discrete,midsize,gaussian,clg]
"""

from __future__ import annotations

import argparse

from ..bundles import BenchmarkBundle, BenchmarkBundleSpec
from ..pipeline import run_pipeline, stage_report, stage_run
from .r2_suite import (
    CLG_MODELS,
    DISCRETE_MODELS,
    GAUSSIAN_MODELS,
    _print_aggregate,
)

MIDSIZE_MODELS = DISCRETE_MODELS


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r3")
    ap.add_argument("--discrete-bundle", default=None)
    ap.add_argument("--skip", default="")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    args = ap.parse_args(argv)
    skip = set(args.skip.split(",")) if args.skip else set()

    if "discrete" not in skip and args.discrete_bundle:
        bundle = BenchmarkBundle.load(args.discrete_bundle)
        print("[discrete] run", flush=True)
        stage_run(bundle, DISCRETE_MODELS)
        stage_report(bundle)
        _print_aggregate(bundle)

    if "midsize" not in skip:
        print("[midsize] pipeline", flush=True)
        bundle = run_pipeline(
            args.out,
            MIDSIZE_MODELS,
            BenchmarkBundleSpec(
                source="builtin",
                source_kwargs={"names": ["insurance", "alarm"]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
        )
        _print_aggregate(bundle)

    if "gaussian" not in skip:
        print("[gaussian] pipeline", flush=True)
        bundle = run_pipeline(
            args.out,
            GAUSSIAN_MODELS,
            BenchmarkBundleSpec(
                source="random_gaussian",
                source_kwargs={"sizes": [8, 16, 32]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
        )
        _print_aggregate(bundle)

    if "clg" not in skip:
        print("[clg] pipeline", flush=True)
        bundle = run_pipeline(
            args.out,
            CLG_MODELS,
            BenchmarkBundleSpec(
                source="random_clg",
                source_kwargs={"sizes": [8, 12]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
        )
        _print_aggregate(bundle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
