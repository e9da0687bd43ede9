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

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# XLA:CPU serializes AOT executables with the *compile* machine's CPU feature
# set; reloading them on a host whose feature validation disagrees
# ("+prefer-no-scatter is not supported on the host machine ... could lead to
# execution errors such as SIGILL") intermittently SEGFAULTS the test process
# inside compilation_cache.get_executable_and_time.  TPU executables don't
# have this problem — the solver/bench entry points still enable the cache.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A single-process full-suite run accumulates hundreds of large XLA:CPU
    executables; past ~16 heavy tests the NEXT big (shard_map) compile
    segfaults inside ``backend_compile_and_load`` — reproducible in suite
    order, never in isolation.  Releasing the in-memory jit caches at module
    boundaries keeps the process under that threshold while preserving
    within-module reuse.
    """
    yield
    jax.clear_caches()
