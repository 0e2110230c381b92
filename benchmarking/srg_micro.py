"""Merge-kernel (systematic_resample_gather) A/B microbench at 8x1M.

Times the fused kernel + the XLA reference at d in {1, 8}, prints one JSON
line per point, and cross-checks the kernel against the XLA ancestors
bit-for-bit. Used to evaluate rank-search restructures (VERDICT r1 weak
#4: 22.7 ms at 8x1M vs ~2 ms HBM speed-of-light).

Run: python -m benchmarking.srg_micro [S_log2=20] [B=8]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

from benchmarking._timing import measure
from vectorizedbayesiannetwork_tpu.ops import resample_pallas as rp


def main():
    s = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps({"device": str(jax.devices()[0]), "B": b, "S": s}),
          flush=True)
    key = jax.random.key(0)
    for d in (1, 8):
        kw, kv, ku = jax.random.split(jax.random.fold_in(key, d), 3)
        w = jax.nn.softmax(jax.random.normal(kw, (b, s)) * 2.0, axis=1)
        vals = jax.random.normal(kv, (b, s, d), jnp.float32)
        rk = jax.random.fold_in(ku, 7)
        rec = {"d": d}
        if os.environ.get("SRG_MICRO_CHECK", "1") == "1":
            out = rp.systematic_resample_gather(rk, w, vals)
            ref = rp.systematic_resample_gather_xla(rk, w, vals)
            rec["maxerr"] = float(jnp.max(jnp.abs(out - ref)))
        ms = measure(lambda: rp.systematic_resample_gather(rk, w, vals)) * 1e3
        rec["fused_ms"] = round(ms, 2)
        if os.environ.get("SRG_MICRO_XLA", "0") == "1":
            rec["xla_ms"] = round(measure(
                lambda: rp.systematic_resample_gather_xla(rk, w, vals)
            ) * 1e3, 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
