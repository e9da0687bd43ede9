"""Persistent XLA compilation cache setup.

TPU compiles of the fused ADMM step take minutes; caching them on disk makes
every process after the first start in seconds.  Call once, early.
"""

import os

import jax


def enable(path: str | None = None) -> str | None:
    """Enable the on-disk compile cache (TPU/GPU backends only).

    XLA:CPU AOT executables are serialized against the compile machine's CPU
    feature set and can SIGILL/segfault when a host's feature validation
    disagrees on reload — so the cache stays off for the CPU backend."""
    if jax.default_backend() == "cpu":
        return None
    path = path or os.environ.get(
        "TRAJOPT_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
