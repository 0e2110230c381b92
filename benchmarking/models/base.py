"""Benchmark backend ABC.

Capability parity with /root/reference/benchmarking/models/base.py:13-62:
fit / answer_cpd_query / answer_inference_queries with millisecond timing;
batched same-skeleton inference is the default entry point.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Dict, Iterable, List, Optional

import numpy as np


def iter_inference_batches(queries: List, max_batch: int = 256) -> Iterable[List]:
    """Group by skeleton_id, preserving first-seen order.

    Parity: ``/root/reference/benchmarking/IIII_run_benchmark/base.py:69-110``
    (``_iter_inference_batches``) — the reference batches queries that share
    an evidence-key skeleton into one model call.
    """
    groups: "OrderedDict[str, List]" = OrderedDict()
    for q in queries:
        groups.setdefault(q.skeleton_id, []).append(q)
    for _, batch in groups.items():
        for i in range(0, len(batch), max_batch):
            yield batch[i : i + max_batch]


class BaseBenchmarkModel:
    backend_name = "?"

    def __init__(self, domain: Dict, seed: int = 0, config: Optional[Dict] = None):
        self.domain = domain
        self.seed = int(seed)
        self.config = config or {}

    @staticmethod
    def _timed(fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        return out, (time.perf_counter() - t0) * 1000.0

    # -- interface ---------------------------------------------------------
    def fit(self, data: Dict[str, np.ndarray]) -> float:
        """Fit from integer-coded columns; returns fit time in ms."""
        raise NotImplementedError

    def answer_cpd_query(self, query) -> Dict:
        """-> {ok, probs, timing_ms}."""
        raise NotImplementedError

    def answer_inference_query(self, query) -> Dict:
        return self.answer_inference_queries([query])[0]

    def answer_inference_queries(self, queries: List) -> List[Dict]:
        """Batched (same skeleton) -> list of {ok, probs, timing_ms}."""
        raise NotImplementedError

    def answer_all_inference_queries(
        self, queries: List, max_batch: int = 256
    ) -> List[Dict]:
        """Answer ALL of a problem's inference queries, in input order.

        Default: skeleton-grouped batching with per-batch failure
        isolation (the reference's runner loop,
        ``IIII_run_benchmark/base.py:577-1416``). Backends that can fuse
        heterogeneous skeletons into one device dispatch override this.
        """
        by_id = {id(q): i for i, q in enumerate(queries)}
        out: List[Optional[Dict]] = [None] * len(queries)
        for batch in iter_inference_batches(queries, max_batch):
            try:
                results = self.answer_inference_queries(batch)
            except Exception as exc:  # failure isolated to this batch
                from ..errors import failure_record

                rec = failure_record(exc)
                results = [dict(rec) for _ in batch]
            for q, r in zip(batch, results):
                out[by_id[id(q)]] = r
        return [r if r is not None else {"ok": False} for r in out]
