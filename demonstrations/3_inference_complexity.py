"""Treewidth vs sampling: exact VE cost explosion and the MC alternative.

Parity: demonstrations/3_inference_complexity.py (own Factor VE impl) —
uses the benchmarking suite's variable-elimination engine to show factor
blowup on dense graphs while particle methods stay linear in node count.
"""

import time

import numpy as np

import _path  # noqa: F401  (repo-checkout sys.path bootstrap)
from benchmarking.exact import exact_posterior
from benchmarking.networks import random_bn


def main() -> None:
    print(f"{'nodes':>6} {'max indeg':>10} {'VE time (s)':>12}")
    for n_nodes, indeg in [(8, 2), (12, 3), (16, 4), (20, 5)]:
        bn = random_bn(n_nodes, max_indegree=indeg, max_card=3, seed=1)
        target = bn.nodes[-1]
        t0 = time.perf_counter()
        exact_posterior(bn, target, {bn.nodes[0]: 0})
        dt = time.perf_counter() - t0
        print(f"{n_nodes:>6} {indeg:>10} {dt:>12.4f}")
    print("\nVE cost grows with induced treewidth; the TPU particle sweep is"
          "\nO(nodes x particles) regardless of connectivity.")


if __name__ == "__main__":
    main()
