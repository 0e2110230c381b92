"""Benchmark error taxonomy.

Capability parity with ``/root/reference/benchmarking/utils_errors.py:21-248``:
OOM detection, error-signature normalization (numbers/hashes/paths stripped
so identical failure modes aggregate), and an ``ErrorSummary`` that groups
failure records and renders a markdown table.
"""

from __future__ import annotations

import re
import traceback
from collections import defaultdict
from typing import Dict, List, Optional

_OOM_PATTERNS = (
    "out of memory",
    "oom",
    "resource exhausted",
    "resource_exhausted",
    "failed to allocate",
)


def is_oom_error(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(p in msg for p in _OOM_PATTERNS)


_NUM_RE = re.compile(r"\b\d+(\.\d+)?\b")
_HEX_RE = re.compile(r"0x[0-9a-fA-F]+")
_PATH_RE = re.compile(r"(/[\w.\-]+)+")


def error_signature(exc: BaseException, max_len: int = 160) -> str:
    """Stable signature: type + normalized message."""
    msg = str(exc)
    msg = _PATH_RE.sub("<path>", msg)
    msg = _HEX_RE.sub("<hex>", msg)
    msg = _NUM_RE.sub("<n>", msg)
    msg = " ".join(msg.split())
    return f"{type(exc).__name__}: {msg}"[:max_len]


def failure_record(exc: BaseException, *, context: Optional[Dict] = None) -> Dict:
    rec = {
        "ok": False,
        "error_type": type(exc).__name__,
        "error": str(exc)[:500],
        "signature": error_signature(exc),
        "oom": is_oom_error(exc),
        "traceback": traceback.format_exc(limit=5)[-1500:],
    }
    if context:
        rec.update(context)
    return rec


class ErrorSummary:
    def __init__(self) -> None:
        self._groups: Dict[str, List[Dict]] = defaultdict(list)

    def add(self, record: Dict) -> None:
        self._groups[record.get("signature", "unknown")].append(record)

    def add_exception(self, exc: BaseException, **context) -> Dict:
        rec = failure_record(exc, context=context)
        self.add(rec)
        return rec

    @property
    def total(self) -> int:
        return sum(len(v) for v in self._groups.values())

    def counts(self) -> Dict[str, int]:
        return {sig: len(v) for sig, v in self._groups.items()}

    def to_markdown(self) -> str:
        if not self._groups:
            return "No errors.\n"
        lines = [
            "| count | oom | signature |",
            "|---|---|---|",
        ]
        for sig, recs in sorted(
            self._groups.items(), key=lambda kv: -len(kv[1])
        ):
            oom = "yes" if any(r.get("oom") for r in recs) else "no"
            lines.append(f"| {len(recs)} | {oom} | `{sig}` |")
        return "\n".join(lines) + "\n"
