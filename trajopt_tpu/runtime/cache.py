"""Persistent XLA compilation cache setup.

TPU compiles of the fused ADMM step take minutes; caching them on disk makes
every process after the first start in seconds.  Call once, early.
"""

import os

import jax


def enable(path: str | None = None) -> str:
    path = path or os.environ.get(
        "TRAJOPT_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
