"""Round-2 TPU batch #2: link-scale timing, kernel ablation, headline.

1. Timing-only benchmark on large random discrete networks (128/512
   nodes — the reference suite's link/munin scale; exact ground truth is
   treewidth-exponential there, so the bundle runs with ground_truth
   disabled and reports timing + success only).
2. Merge-kernel tiles-per-instance ablation at 8x1M (resample_micro).
3. One bench.py headline pass (validates the asia-at-1M memory budget
   before the round driver runs it).
"""

from __future__ import annotations

import json
import subprocess
import sys

from ..bundles import BenchmarkBundleSpec
from ..pipeline import run_pipeline
from .r2_suite import _print_aggregate

LARGE_MODELS = ["ref_vbn_ct_lw", "vbn_ct_lw_dyn", "vbn_ct_mcm_dyn"]


def run_large(out: str) -> None:
    print("[large] timing-only pipeline", flush=True)
    bundle = run_pipeline(
        out,
        LARGE_MODELS,
        BenchmarkBundleSpec(
            source="random",
            source_kwargs={"sizes": [128, 512], "max_card": 3},
            n_queries=96,
            n_rows=4096,
            ground_truth=False,
        ),
    )
    _print_aggregate(bundle)


def run_kernel_ablation() -> None:
    """Merge-kernel tiles-per-instance ablation, completion-synced."""
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vectorizedbayesiannetwork_tpu.ops.resample_pallas import (
        systematic_resample_gather,
    )

    print("[kernel] tiles-per-instance ablation 8x1M", flush=True)
    b, s = 8, 1 << 20
    key = jax.random.PRNGKey(0)
    results = {}
    for d in (1, 8):
        w = jax.random.uniform(jax.random.fold_in(key, d), (b, s))
        vals = jax.random.normal(jax.random.fold_in(key, 10 + d), (b, s, d))
        jax.block_until_ready((w, vals))
        ref = None
        for tpi in ("1", "2", "4", "8"):
            os.environ["VBN_SRG_TPI"] = tpi
            out = systematic_resample_gather(key, w, vals)
            np.asarray(out[0, 0])  # completion sync
            t0 = time.perf_counter()
            for _ in range(6):
                out = systematic_resample_gather(key, w, vals)
            np.asarray(out[0, 0])
            ms = (time.perf_counter() - t0) * 1e3 / 6
            if ref is None:
                ref = np.asarray(out)
            else:  # same key => identical ancestors for every TPI
                np.testing.assert_array_equal(ref, np.asarray(out))
            results[f"d{d}_tpi{tpi}"] = round(ms, 2)
            print(f"  d={d} TPI={tpi}: {ms:.2f} ms", flush=True)
    print(json.dumps({"srg_ablation_8x1M": results}), flush=True)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "benchmarking/out"
    run_large(out)
    run_kernel_ablation()
    print("[bench] headline", flush=True)
    proc = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=3600,
    )
    print(proc.stdout.strip(), flush=True)
    if proc.returncode != 0:
        print("bench STDERR:", proc.stderr[-2000:], flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
