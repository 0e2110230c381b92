"""Round-4 artifact driver: all benchmark classes, two-pass execution.

Differences from r3_suite:
- TWO-PASS model execution (round-3 VERDICT weak #4 / next #7): all
  TPU-backend models run first, then the torch reference backends run in
  a second pass on an otherwise-idle host, so reference-CPU wall-clock
  rows are not contaminated by TPU-host load. Timing columns aggregate
  on the median (benchmarking/report.py).
- The canonical discrete class is regenerated in-bundle (asia, cancer,
  earthquake, sprinkler, survey) rather than reusing a prior bundle.
- gaussian class gains the ref_vbn_kde parity row (VERDICT next #6).
- vbn_ct_ce now rides the compiled junction tree on insurance/alarm
  (inference/_jtree.py) instead of delegating to LW.

Usage:
    python -m benchmarking.scripts.r4_suite --out benchmarking/out/r4 \
        [--skip discrete,midsize,gaussian,clg]
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

DISCRETE_TPU = [
    "exact_oracle", "vbn_ct_ce", "vbn_ct_is_dyn", "vbn_ct_lw_dyn",
    "vbn_ct_mcm_dyn", "vbn_emb_lw_dyn",
]
DISCRETE_REF = ["ref_vbn_ct_lw", "ref_vbn_ct_mcm"]
GAUSSIAN_TPU = [
    "exact_oracle", "vbn_lg_exact", "vbn_lg_lw_dyn", "vbn_lg_is_dyn",
    "vbn_gnn_lw_dyn", "vbn_mdn_lw_dyn", "vbn_kde_lw_dyn",
]
GAUSSIAN_REF = ["ref_vbn_lg_lw", "ref_vbn_kde"]
CLG_TPU = ["exact_oracle", "vbn_clg_mdn_lw_dyn", "vbn_clg_gnn_lw_dyn"]
CLG_REF = ["ref_vbn_clg_gnn_lw"]


def _run_class(root, spec, tpu_models, ref_models) -> BenchmarkBundle:
    bundle = BenchmarkBundle(root, spec)
    stage_networks(bundle)
    stage_queries(bundle)
    stage_data(bundle)
    stage_run(bundle, tpu_models, seed=spec.seed)
    # Reference pass on an idle host: the TPU pass above has completed
    # (its dispatches are synchronous at the serving API), so the torch
    # rows below see no host contention from TPU work.
    stage_run(bundle, ref_models, seed=spec.seed)
    stage_report(bundle)
    return bundle


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out/r4")
    ap.add_argument("--skip", default="")
    ap.add_argument("--n-queries", type=int, default=96)
    ap.add_argument("--n-rows", type=int, default=4096)
    args = ap.parse_args(argv)
    skip = set(args.skip.split(",")) if args.skip else set()

    classes = {
        "discrete": (
            BenchmarkBundleSpec(
                source="builtin",
                source_kwargs={
                    "names": [
                        "asia", "cancer", "earthquake", "sprinkler", "survey"
                    ]
                },
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
            DISCRETE_TPU,
            DISCRETE_REF,
        ),
        "midsize": (
            BenchmarkBundleSpec(
                source="builtin",
                source_kwargs={"names": ["insurance", "alarm"]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
            DISCRETE_TPU,
            DISCRETE_REF,
        ),
        "large": (
            BenchmarkBundleSpec(
                source="builtin",
                source_kwargs={
                    "names": ["hailfinder", "hepar2", "win95pts"]
                },
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
            DISCRETE_TPU,
            DISCRETE_REF,
        ),
        "gaussian": (
            BenchmarkBundleSpec(
                source="random_gaussian",
                source_kwargs={"sizes": [8, 16, 32]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
            GAUSSIAN_TPU,
            GAUSSIAN_REF,
        ),
        "clg": (
            BenchmarkBundleSpec(
                source="random_clg",
                source_kwargs={"sizes": [8, 16]},
                n_queries=args.n_queries,
                n_rows=args.n_rows,
            ),
            CLG_TPU,
            CLG_REF,
        ),
    }
    for name, (spec, tpu_models, ref_models) in classes.items():
        if name in skip:
            continue
        print(f"[{name}] pipeline", flush=True)
        bundle = _run_class(args.out, spec, tpu_models, ref_models)
        _print_aggregate(bundle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
