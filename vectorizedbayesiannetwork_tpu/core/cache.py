"""Persistent XLA compilation cache (on by default, env-overridable).

The reference runs eagerly and compiles nothing; this framework's analogue
of its "no warmup" property is the XLA persistent compilation cache: every
jitted program (CPD trainers, sweep programs, fused kernels) is keyed by
its HLO + compile options and written to disk, so a SECOND process serving
the same network skips the multi-second XLA compile entirely (round-3
committed evidence: 197 s cold warmup for ``vbn_ct_ce`` on asia, 59-63 s
for is_dyn on insurance/alarm — all re-paid per process before this).

Configuration:
- ``VBN_COMPILATION_CACHE=<dir>`` overrides the location;
- ``VBN_COMPILATION_CACHE=0`` (or ``off``/``none``) disables;
- an explicit JAX-level setting (``JAX_COMPILATION_CACHE_DIR`` env or
  ``jax.config.update("jax_compilation_cache_dir", ...)`` before import)
  wins — this module never overrides user configuration.

Cache-key hygiene: entries are keyed by XLA on the compiled computation,
so fitted parameter VALUES never key the cache (they are runtime inputs
to every program in this package); plan structure, shapes, and mesh
signatures do — exactly the jit-cache keys (``inference/_base.py``).
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLE = ("", "0", "off", "none", "false")


def enable_compilation_cache() -> Optional[str]:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the cache dir in effect, or None when disabled/unavailable.
    Safe to call multiple times; called once at package import.
    """
    import jax

    try:
        existing = jax.config.jax_compilation_cache_dir
    except AttributeError:  # very old jax: no persistent cache support
        return None
    if existing:
        return existing  # user already configured the JAX-level cache
    override = os.environ.get("VBN_COMPILATION_CACHE")
    if override is not None and override.strip().lower() in _DISABLE:
        return None
    cache_dir = override or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "vbn_tpu",
        "xla",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # Cache every compile: the serving programs worth caching span
        # ~0.5 s (small sweeps) to minutes (fused trainers); entry sizes
        # are small next to the compile times they save. Thresholds are
        # best-effort per jax version; the dir is set LAST so a partial
        # failure can never leave the cache active while this function
        # reports it disabled (round-4 review finding).
        for flag, val in (
            ("jax_persistent_cache_min_compile_time_secs", 0.0),
            ("jax_persistent_cache_min_entry_size_bytes", -1),
        ):
            try:
                jax.config.update(flag, val)
            except Exception:
                pass
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return None
    return cache_dir
