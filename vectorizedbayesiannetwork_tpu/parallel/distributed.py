"""Multi-host initialization and scaling-efficiency measurement.

The reference has no multi-host anything (SURVEY.md §5.8). Here:

  * ``initialize_distributed()`` wraps ``jax.distributed.initialize`` —
    call once per host before building a mesh; afterwards
    ``jax.devices()`` spans the pod slice and the same
    ('data','particle') mesh + sharding constraints used single-host make
    XLA route collectives over ICI within a slice and DCN across hosts.
  * ``scaling_efficiency()`` measures throughput at 1 device vs N devices
    for a given closure — the harness for the BASELINE.json ">90% 2-host
    scaling efficiency" target.

On a single-host run both are exercised with the forced-multi-device CPU
backend (tests) and the chip counts available.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op if already initialized or 1 proc).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:
        if "already initialized" not in str(exc).lower():
            raise


def scaling_efficiency(
    run_fn: Callable[[object], float],
    mesh_small,
    mesh_large,
) -> Dict[str, float]:
    """Measure throughput(run_fn) on two meshes -> efficiency report.

    ``run_fn(mesh) -> items_per_second`` must build+run the workload on the
    given mesh (compile excluded by the caller via warmup inside run_fn).
    """
    small = run_fn(mesh_small)
    large = run_fn(mesh_large)
    n_small = mesh_small.devices.size
    n_large = mesh_large.devices.size
    ideal = small * (n_large / n_small)
    return {
        "throughput_small": small,
        "throughput_large": large,
        "devices_small": n_small,
        "devices_large": n_large,
        "speedup": large / small,
        "efficiency": large / ideal,
    }


def measure_queries_per_s(vbn, query, n_samples: int, reps: int = 5) -> float:
    """Warm up (compile) then measure posterior queries/s."""
    from ..core.utils import infer_batch_size

    b = infer_batch_size(query.get("evidence", {}), query.get("do", {}))
    out = vbn.infer_posterior(query, n_samples=n_samples)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = vbn.infer_posterior(query, n_samples=n_samples)
    jax.block_until_ready(out)
    return b * reps / (time.perf_counter() - t0)
