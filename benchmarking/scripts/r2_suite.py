"""Round-2 artifact driver: the three benchmark classes in one process.

Runs (a) the canonical discrete textbook networks (existing bundle if
given), (b) random gaussian networks, (c) random clgaussian networks —
each through run+report — in ONE python process so the single TPU-tunnel
grant is acquired once. Mirrors the reference's multi-class suite
(``metadata/bnlearn.json`` discrete/gaussian/clgaussian).

Usage:
    python -m benchmarking.scripts.r2_suite --out benchmarking/out \
        [--discrete-bundle <path>] [--skip discrete,gaussian,clg]
"""

from __future__ import annotations

import argparse
import json

from ..bundles import BenchmarkBundle, BenchmarkBundleSpec
from ..pipeline import run_pipeline, stage_report, stage_run

DISCRETE_MODELS = [
    "exact_oracle", "ref_vbn_ct_lw", "ref_vbn_ct_mcm", "vbn_ct_ce",
    "vbn_ct_is_dyn", "vbn_ct_lw_dyn", "vbn_ct_mcm_dyn", "vbn_emb_lw_dyn",
]
GAUSSIAN_MODELS = [
    "exact_oracle", "ref_vbn_lg_lw", "vbn_lg_exact", "vbn_lg_lw_dyn",
    "vbn_lg_is_dyn", "vbn_gnn_lw_dyn", "vbn_mdn_lw_dyn", "vbn_kde_lw_dyn",
]
CLG_MODELS = [
    "exact_oracle", "ref_vbn_clg_gnn_lw", "vbn_clg_mdn_lw_dyn",
    "vbn_clg_gnn_lw_dyn",
]


def _print_aggregate(bundle: BenchmarkBundle) -> None:
    import os

    path = os.path.join(bundle.dir("report"), "aggregate.json")
    with open(path, encoding="utf-8") as f:
        agg = json.load(f)
    for net, models in agg.items():
        print(f"== {net}")
        for m, s in sorted(models.items()):
            t = s["timing_ms"].get("iqm")
            kl = (s.get("kl") or {}).get("iqm")
            print(f"   {m:22s} t={t} kl={kl}", flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarking/out")
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
