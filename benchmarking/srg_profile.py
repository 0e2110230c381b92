"""Merge-kernel on-chip cost decomposition (round-4 VERDICT next #7).

Round 4 falsified three optimization hypotheses (quarter ILP, TPI, MXU
count offload) without ever measuring WHERE the 14 ms at 8x1M goes.
jax.profiler device traces are not exposed through the axon TPU tunnel,
so this uses trace-time ABLATION instead: each mode removes one stage of
the rank search (see ``resample_pallas._srg_ablate``), and the deltas
between modes attribute wall-clock to block streaming, supercolumn
counts, column/entry probes, and value gathers. Each mode runs in a
FRESH subprocess (the flag is read at trace time; the jit cache does not
key on it).

Run on the TPU host:  python -m benchmarking.srg_profile [S_log2=20] [B=8]
Writes benchmarking/results/srg_profile.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MODES = ["stream", "sc", "ranks", ""]  # cumulative stages, cheap->full


def _one(mode: str, s_log2: int, b: int) -> float:
    code = (
        "import jax, jax.numpy as jnp, json\n"
        "from benchmarking._timing import measure\n"
        "from vectorizedbayesiannetwork_tpu.ops import resample_pallas as rp\n"
        f"s = 1 << {s_log2}; b = {b}\n"
        "key = jax.random.key(0)\n"
        "kw, kv, ku = jax.random.split(jax.random.fold_in(key, 1), 3)\n"
        "w = jax.nn.softmax(jax.random.normal(kw, (b, s)) * 2.0, axis=1)\n"
        "vals = jax.random.normal(kv, (b, s, 1), jnp.float32)\n"
        "rk = jax.random.fold_in(ku, 7)\n"
        "ms = measure(lambda: rp.systematic_resample_gather(rk, w, vals))"
        " * 1e3\n"
        "print(json.dumps({'ms': ms}))\n"
    )
    env = dict(os.environ, VBN_SRG_ABLATE=mode)
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["ms"])
        except (json.JSONDecodeError, KeyError):
            continue
    raise RuntimeError(
        f"mode {mode!r} produced no timing:\n{out.stdout}\n{out.stderr}"
    )


def main() -> None:
    s_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rows = {}
    for mode in MODES:
        label = mode or "full"
        rows[label] = _one(mode, s_log2, b)
        print(json.dumps({"mode": label, "ms": round(rows[label], 2)}),
              flush=True)
    prof = {
        "shape": {"B": b, "S": 1 << s_log2, "d": 1},
        "wall_ms": rows,
        "attribution_ms": {
            "stream+write": rows["stream"],
            "supercolumn_counts": rows["sc"] - rows["stream"],
            "column_entry_probes": rows["ranks"] - rows["sc"],
            "value_gathers": rows["full"] - rows["ranks"],
        },
    }
    os.makedirs("benchmarking/results", exist_ok=True)
    with open("benchmarking/results/srg_profile.json", "w") as f:
        json.dump(prof, f, indent=2)
    print(json.dumps(prof["attribution_ms"]), flush=True)


if __name__ == "__main__":
    main()
