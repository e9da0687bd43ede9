"""Checkpoint / resume for solver state.

The reference has no mid-run checkpointing — only file-based warm starts
(init waypoint files, SURVEY.md §5).  Here the whole ADMM state is a pytree of
fixed-shape arrays, so preemption-safe checkpointing is a straight
save/restore.  Plain ``.npz`` is the default (zero extra deps, atomic rename);
an orbax-backed variant is provided for multi-host async use when available.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..types import PairPlaneCache, PlaneCache, SolverState

_META = "_trajopt_meta"
_CACHE_PREFIX = "plane_cache_"
_PAIR_PREFIX = "pair_cache_"


def save(
    path: str,
    state: SolverState,
    *,
    step: int = 0,
    extra: dict | None = None,
    cache=None,
) -> None:
    """Atomic .npz checkpoint of a (possibly robot-batched) SolverState.

    ``cache``: the persistent optimal_plane=1 separating-plane state — saved
    alongside so a resume keeps the accumulated refinement (the reference's
    plane tables live across the whole run, CCDUtils.h:64-70).  Either a
    single-robot `PlaneCache`, or the multi-robot pair
    ``(obstacle PlaneCache [U,...], PairPlaneCache)`` mirroring
    ``is_self_seperate/self_seperate_c/d`` (Optimization3D_multi.h:278-327)."""
    arrays = {f: np.asarray(x) for f, x in zip(state._fields, state)}
    cache_kind = None
    if isinstance(cache, tuple) and not isinstance(cache, PlaneCache):
        obs, pair = cache
        for f, x in zip(obs._fields, obs):
            arrays[_CACHE_PREFIX + f] = np.asarray(x)
        for f, x in zip(pair._fields, pair):
            arrays[_PAIR_PREFIX + f] = np.asarray(x)
        cache_kind = "multi"
    elif cache is not None:
        for f, x in zip(cache._fields, cache):
            arrays[_CACHE_PREFIX + f] = np.asarray(x)
        cache_kind = "single"
    meta = {
        "step": step,
        "fields": list(state._fields),
        "extra": extra or {},
        "has_plane_cache": cache is not None,
        "cache_kind": cache_kind,
    }
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays, **{_META: np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8)})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str, dtype=None) -> tuple[SolverState, dict]:
    """Restore (state, meta)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z[_META]).decode())
        state = SolverState(
            **{f: jnp.asarray(z[f], dtype=dtype) for f in meta["fields"]}
        )
    return state, meta


def load_full(
    path: str, dtype=None
) -> tuple[SolverState, dict, object]:
    """Restore (state, meta, plane_cache) — cache is None when the
    checkpoint was written without one, a `PlaneCache` for single-robot
    checkpoints, or ``(obstacle PlaneCache, PairPlaneCache)`` for
    multi-robot ones."""
    state, meta = load(path, dtype=dtype)
    cache = None
    if meta.get("has_plane_cache"):
        with np.load(path) as z:
            obs = PlaneCache(
                obs_id=jnp.asarray(z[_CACHE_PREFIX + "obs_id"]),
                c=jnp.asarray(z[_CACHE_PREFIX + "c"], dtype=dtype),
            )
            if meta.get("cache_kind") == "multi":
                pair = PairPlaneCache(
                    partner=jnp.asarray(z[_PAIR_PREFIX + "partner"]),
                    c=jnp.asarray(z[_PAIR_PREFIX + "c"], dtype=dtype),
                    d=jnp.asarray(z[_PAIR_PREFIX + "d"], dtype=dtype),
                )
                cache = (obs, pair)
            else:
                cache = obs
    return state, meta, cache


class CheckpointManager:
    """Keep the latest K checkpoints, save every N iterations."""

    def __init__(self, directory: str, every: int = 10, keep: int = 3):
        self.directory = directory
        self.every = max(1, every)
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def maybe_save(
        self,
        it: int,
        state: SolverState,
        extra: dict | None = None,
        cache=None,
    ) -> bool:
        if it % self.every != 0:
            return False
        save(os.path.join(self.directory, f"ckpt_{it:08d}.npz"), state,
             step=it, extra=extra, cache=cache)
        self._gc()
        return True

    def _gc(self) -> None:
        ck = sorted(
            f for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )
        for f in ck[: -self.keep]:
            os.unlink(os.path.join(self.directory, f))

    def latest(self) -> str | None:
        ck = sorted(
            f for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".npz")
        )
        return os.path.join(self.directory, ck[-1]) if ck else None

    def restore_latest(self, dtype=None) -> tuple[SolverState, dict] | None:
        p = self.latest()
        return load(p, dtype=dtype) if p else None

    def restore_latest_full(
        self, dtype=None
    ) -> tuple[SolverState, dict, PlaneCache | None] | None:
        p = self.latest()
        return load_full(p, dtype=dtype) if p else None
