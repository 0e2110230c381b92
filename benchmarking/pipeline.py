"""End-to-end pipeline orchestration over a bundle (stages I–V).

The programmatic equivalent of the reference's ``scripts/01..05_*.py``
stage CLIs, callable as functions (used by the CLI in
``benchmarking/scripts/bench_cli.py`` and by tests).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from .bif import to_bif
from .bundles import BenchmarkBundle, BenchmarkBundleSpec, write_jsonl
from .data_gen import write_problem_assets
from .networks import acquire
from .query_gen import (
    compute_ground_truth,
    cpd_ground_truth,
    generate_cpd_queries,
    generate_inference_queries,
)


def stage_networks(bundle: BenchmarkBundle) -> List[str]:
    """Stage I: acquire networks; discrete ones persist as .bif, gaussian
    ones as .gbn.json (the reference's gaussian class ships as R bn.fit
    RDS files, which have no open text format — JSON stands in)."""
    from .clg_bn import CLGaussianBN
    from .gaussian_bn import GaussianBN

    nets = acquire(bundle.spec.source, **bundle.spec.source_kwargs)
    ndir = bundle.dir("networks")
    for bn in nets:
        if isinstance(bn, GaussianBN):
            path = os.path.join(ndir, f"{bn.name}.gbn.json")
            with open(path, "w", encoding="utf-8") as f:
                f.write(bn.to_json())
        elif isinstance(bn, CLGaussianBN):
            path = os.path.join(ndir, f"{bn.name}.clg.json")
            with open(path, "w", encoding="utf-8") as f:
                f.write(bn.to_json())
        else:
            with open(
                os.path.join(ndir, f"{bn.name}.bif"), "w", encoding="utf-8"
            ) as f:
                f.write(to_bif(bn))
    bundle.save_metadata({"networks": [bn.name for bn in nets]})
    return [bn.name for bn in nets]


def _load_network(bundle: BenchmarkBundle, problem: str):
    from .bif import load_bif

    gpath = os.path.join(bundle.dir("networks"), f"{problem}.gbn.json")
    if os.path.exists(gpath):
        from .gaussian_bn import GaussianBN

        with open(gpath, encoding="utf-8") as f:
            return GaussianBN.from_json(f.read())
    cpath = os.path.join(bundle.dir("networks"), f"{problem}.clg.json")
    if os.path.exists(cpath):
        from .clg_bn import CLGaussianBN

        with open(cpath, encoding="utf-8") as f:
            return CLGaussianBN.from_json(f.read())
    path = os.path.join(bundle.dir("networks"), f"{problem}.bif")
    if not os.path.exists(path) and os.path.exists(path + ".gz"):
        # committed bundles gzip their largest fixtures (mildew's 916k
        # CPT entries are ~11 MB of BIF text)
        path += ".gz"
    return load_bif(path)


def stage_queries(bundle: BenchmarkBundle) -> None:
    """Stage II: generate queries + exact ground truth per problem."""
    from .clg_bn import (
        CLGaussianBN,
        clg_ground_truth,
        generate_clg_inference_queries,
    )
    from .gaussian_bn import (
        GaussianBN,
        gaussian_ground_truth,
        generate_gaussian_inference_queries,
    )

    spec = bundle.spec
    for problem in bundle.problems():
        bn = _load_network(bundle, problem)
        qdir = bundle.dir("queries", problem)
        gdir = bundle.dir("ground_truth", problem)
        gt_records: List[Dict] = []
        if spec.mode in ("inference", "both"):
            if isinstance(bn, CLGaussianBN):
                gen, gt_fn = generate_clg_inference_queries, clg_ground_truth
            elif isinstance(bn, GaussianBN):
                gen, gt_fn = (
                    generate_gaussian_inference_queries,
                    gaussian_ground_truth,
                )
            else:
                gen, gt_fn = generate_inference_queries, compute_ground_truth
            queries = gen(
                bn,
                n_queries=spec.n_queries,
                seed=spec.seed,
                evidence_modes=tuple(spec.evidence_modes),
            )
            write_jsonl(
                os.path.join(qdir, "inference_queries.jsonl"),
                [q.to_dict() for q in queries],
            )
            if spec.ground_truth:
                gt_records += gt_fn(bn, queries)
        if spec.mode in ("cpds", "both"):
            if isinstance(bn, CLGaussianBN):
                from .clg_bn import (
                    clg_cpd_ground_truth,
                    generate_clg_cpd_queries,
                )

                cgen, cgt = generate_clg_cpd_queries, clg_cpd_ground_truth
            elif isinstance(bn, GaussianBN):
                from .gaussian_bn import (
                    gaussian_cpd_ground_truth,
                    generate_gaussian_cpd_queries,
                )

                cgen, cgt = (
                    generate_gaussian_cpd_queries,
                    gaussian_cpd_ground_truth,
                )
            else:
                cgen, cgt = generate_cpd_queries, cpd_ground_truth
            cqueries = cgen(bn, n_queries=spec.n_queries, seed=spec.seed)
            write_jsonl(
                os.path.join(qdir, "cpd_queries.jsonl"),
                [q.to_dict() for q in cqueries],
            )
            if spec.ground_truth:
                gt_records += cgt(bn, cqueries)
        write_jsonl(os.path.join(gdir, "ground_truth.jsonl"), gt_records)


def stage_data(bundle: BenchmarkBundle, n_datasets: int = 1) -> None:
    """Stage III: exact ancestral training data + domain schema."""
    from .clg_bn import CLGaussianBN
    from .data_gen import write_clg_problem_assets, write_gaussian_problem_assets
    from .gaussian_bn import GaussianBN

    for problem in bundle.problems():
        bn = _load_network(bundle, problem)
        if isinstance(bn, GaussianBN):
            writer = write_gaussian_problem_assets
        elif isinstance(bn, CLGaussianBN):
            writer = write_clg_problem_assets
        else:
            writer = write_problem_assets
        writer(
            bn,
            bundle.dir("datasets", problem),
            n_rows=bundle.spec.n_rows,
            base_seed=bundle.spec.seed,
            n_datasets=n_datasets,
        )


def stage_run(
    bundle: BenchmarkBundle,
    model_specs: List[str],
    seed: int = 0,
    max_batch: int = 256,
) -> Dict:
    """Stage IIII: run models."""
    from .models.presets import resolve_model_spec
    from .runner import BenchmarkRunner

    configs = [resolve_model_spec(s) for s in model_specs]
    runner = BenchmarkRunner(bundle)
    return runner.run_all(configs, seed=seed, max_batch=max_batch)


def stage_report(bundle: BenchmarkBundle) -> str:
    """Stage V: metrics + markdown report."""
    from .report import render_report

    return render_report(bundle)


def run_pipeline(
    root: str,
    model_specs: List[str],
    spec: Optional[BenchmarkBundleSpec] = None,
) -> BenchmarkBundle:
    """All five stages end-to-end into a fresh bundle."""
    spec = spec or BenchmarkBundleSpec()
    bundle = BenchmarkBundle(root, spec)
    stage_networks(bundle)
    stage_queries(bundle)
    stage_data(bundle)
    stage_run(bundle, model_specs, seed=spec.seed)
    stage_report(bundle)
    return bundle
