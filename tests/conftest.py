"""Test configuration: force an 8-device virtual CPU mesh and float64.

Correctness tests run on the CPU backend with x64 enabled so that analytic
gradients/Hessians can be validated against finite differences at tight
tolerances; sharding tests use the 8 virtual devices
(`--xla_force_host_platform_device_count=8`) to exercise multi-chip code paths
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon site config force-prepends the TPU platform regardless of
# JAX_PLATFORMS; override it after import, before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (every test file /
# xdist worker re-jits the solver at its shapes); cached CPU compiles make
# repeat runs and parallel workers start in seconds.
from trajopt_tpu.runtime import cache as _cache  # noqa: E402

_cache.enable()
