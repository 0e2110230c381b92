"""Re-plot saved stress-test run directories.

Parity: ``/root/reference/stress_test/plot_stress_test.py:34-141``.

Usage: python -m stress_test.plot_stress_test <run.json> [--out grid.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="plot_stress_test")
    parser.add_argument("run_json", help="stress_<ts>.json produced by run.py")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    with open(args.run_json, encoding="utf-8") as f:
        payload = json.load(f)
    results = payload.get("results", [])
    if not results:
        print("no results in file", file=sys.stderr)
        return 1
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.run_json)), "stress_grid.png"
    )
    from .run import plot_metrics_grid

    plot_metrics_grid(results, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
