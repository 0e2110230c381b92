"""Plot guards and shared helpers.

Parity with ``/root/reference/vbn/display/plots.py:11-58``: plotting is
optional — gated by the ``VBN_SKIP_PLOTS`` env var and a lazy matplotlib
import so headless/CI runs never touch a display stack.
"""

from __future__ import annotations

import os
from typing import Optional

_DPI = 300


def plots_enabled() -> bool:
    return os.environ.get("VBN_SKIP_PLOTS", "0") not in {"1", "true", "yes"}


def get_pyplot():
    """Lazy matplotlib import; None when unavailable or disabled."""
    if not plots_enabled():
        return None
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def finish(plt, fig, save_path: Optional[str], show: bool) -> None:
    if save_path:
        fig.savefig(save_path, dpi=_DPI, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
