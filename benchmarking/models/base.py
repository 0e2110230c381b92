"""Benchmark backend ABC.

Capability parity with /root/reference/benchmarking/models/base.py:13-62:
fit / answer_cpd_query / answer_inference_queries with millisecond timing;
batched same-skeleton inference is the default entry point.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np


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
