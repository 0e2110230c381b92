"""Device banner logging.

Capability parity with ``/root/reference/vbn/utils/device_logging.py:7-48``:
a one-per-process device banner, env-guarded so repeated constructions stay
quiet.
"""

from __future__ import annotations

import os


def get_device_string() -> str:
    import jax

    devices = jax.devices()
    kinds = {}
    for d in devices:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    desc = ", ".join(f"{n}x {k}" for k, n in kinds.items())
    return f"{jax.default_backend()} [{desc}]"


def log_device(force: bool = False) -> None:
    guard = "VBN_LOGGED_DEVICE"
    if not force and os.environ.get(guard):
        return
    os.environ[guard] = "1"
    print(f"[vbn-tpu] devices: {get_device_string()}")
