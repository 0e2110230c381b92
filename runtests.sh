#!/bin/bash
# CPU test runner: strips the axon TPU-tunnel hook (sitecustomize grabs the
# single TPU chip in EVERY python process when PALLAS_AXON_POOL_IPS is set,
# and can hang if the grant is held). conftest.py also sets these, but the
# sitecustomize hook runs before conftest — so strip at shell level.
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
