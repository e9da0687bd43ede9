"""ctypes bindings for the C++ host runtime (csrc/trajopt_host.cpp).

Builds ``libtrajopt_host.so`` on demand with g++ (cached next to the source).
Every entry point has a NumPy/SciPy fallback so the package works without a
toolchain; `available()` reports which path is active.  The native layer plays
the role the reference assigns to its C++ BVH + OMPL + OBJ reader: host-side
scene structures and initial guesses, outside the jitted device loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "trajopt_host.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libtrajopt_host.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", src, "-o", lib]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError):
        return None
    return lib


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.tg_grid_build.restype = ctypes.c_int64
        lib.tg_grid_build.argtypes = [_f64p, ctypes.c_int64, ctypes.c_double]
        lib.tg_grid_free.argtypes = [ctypes.c_int64]
        lib.tg_grid_query_aabbs.restype = ctypes.c_int32
        lib.tg_grid_query_aabbs.argtypes = [
            ctypes.c_int64, _f64p, _f64p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int64, _i64p, _i64p,
        ]
        lib.tg_grid_min_dist.restype = ctypes.c_int32
        lib.tg_grid_min_dist.argtypes = [ctypes.c_int64, _f64p, ctypes.c_int64, _f64p]
        lib.tg_read_obj.restype = ctypes.c_int64
        lib.tg_read_obj.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.tg_rrt_plan.restype = ctypes.c_int64
        lib.tg_rrt_plan.argtypes = [
            ctypes.c_int64, _f64p, _f64p, ctypes.c_double, _f64p, _f64p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
            ctypes.c_uint64, _f64p, ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class VoxelGrid:
    """Uniform-grid broad phase over a static point cloud."""

    def __init__(self, points: np.ndarray, cell: float = 1.0):
        self.points = np.ascontiguousarray(points, dtype=np.float64)
        self.cell = float(cell)
        lib = _load()
        self._lib = lib
        self._handle = (
            lib.tg_grid_build(self.points, len(self.points), self.cell) if lib else 0
        )
        self._tree = None
        if lib is None:
            from scipy.spatial import cKDTree

            self._tree = cKDTree(self.points)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.tg_grid_free(self._handle)

    def query_aabbs(
        self, lo: np.ndarray, hi: np.ndarray, radius: float, max_k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Candidate point ids per AABB, nearest first, -1 padded.

        Returns (idx [m, max_k], total_count [m]); ``total_count > max_k``
        signals fixed-K overflow (telemetry per SURVEY.md §7.3).
        """
        lo = np.ascontiguousarray(lo, dtype=np.float64).reshape(-1, 3)
        hi = np.ascontiguousarray(hi, dtype=np.float64).reshape(-1, 3)
        m = len(lo)
        idx = np.empty((m, max_k), dtype=np.int64)
        count = np.empty(m, dtype=np.int64)
        if self._lib:
            rc = self._lib.tg_grid_query_aabbs(
                self._handle, lo, hi, m, float(radius), max_k, idx, count
            )
            assert rc == 0
            return idx, count
        # scipy fallback: query the ball around the AABB center with radius
        # covering the box diagonal + radius (superset), then filter exactly
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        rad = np.linalg.norm(half, axis=1) + radius
        for q in range(m):
            cand = self._tree.query_ball_point(center[q], rad[q])
            p = self.points[cand]
            d = np.maximum(lo[q] - p, 0) + np.maximum(p - hi[q], 0)
            d2 = (d * d).sum(1)
            ok = np.asarray(cand)[d2 <= radius * radius]
            d2 = d2[d2 <= radius * radius]
            order = np.argsort(d2)[:max_k]
            count[q] = len(ok)
            row = np.full(max_k, -1, dtype=np.int64)
            row[: len(order)] = ok[order]
            idx[q] = row
        return idx, count

    def min_dist(self, query: np.ndarray) -> np.ndarray:
        query = np.ascontiguousarray(query, dtype=np.float64).reshape(-1, 3)
        out = np.empty(len(query), dtype=np.float64)
        if self._lib:
            rc = self._lib.tg_grid_min_dist(self._handle, query, len(query), out)
            assert rc == 0
            return out
        d, _ = self._tree.query(query)
        return d


def read_obj(path: str) -> np.ndarray:
    """Fast vertices-only OBJ reader (native; falls back to scenes.io)."""
    lib = _load()
    if lib is None:
        from ..scenes.io import read_obj_vertices

        return read_obj_vertices(path)
    n = lib.tg_read_obj(path.encode(), None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, 3), dtype=np.float64)
    got = lib.tg_read_obj(path.encode(), out.ctypes.data_as(ctypes.c_void_p), n)
    assert got == n
    return out


def rrt_plan(
    cloud: np.ndarray,
    start: np.ndarray,
    goal: np.ndarray,
    clearance: float,
    bounds: tuple[np.ndarray, np.ndarray] | None = None,
    prev_paths=(),
    step: float = 0.5,
    max_samples: int = 20000,
    seed: int = 0,
    cell: float | None = None,
) -> np.ndarray | None:
    """Native RRT-Connect + shortcutting; NumPy fallback in scenes.rrt."""
    lib = _load()
    cloud = np.ascontiguousarray(cloud, dtype=np.float64)
    start = np.ascontiguousarray(start, dtype=np.float64)
    goal = np.ascontiguousarray(goal, dtype=np.float64)
    if lib is None:
        from ..scenes import rrt as pyrrt

        return pyrrt.plan_rrt_connect(
            cloud, start, goal, clearance, bounds=bounds,
            prev_paths=prev_paths, step=step, max_samples=max_samples, seed=seed,
        )
    if bounds is None:
        lo = 1.2 * np.minimum(cloud.min(axis=0), np.minimum(start, goal))
        hi = 1.2 * np.maximum(cloud.max(axis=0), np.maximum(start, goal))
    else:
        lo, hi = bounds
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    hi = np.ascontiguousarray(hi, dtype=np.float64)
    edges = []
    for path in prev_paths:
        p = np.asarray(path, dtype=np.float64)
        for i in range(len(p) - 1):
            edges.append(np.concatenate([p[i], p[i + 1]]))
    prev = (
        np.ascontiguousarray(np.stack(edges), dtype=np.float64)
        if edges
        else np.zeros((0, 6))
    )
    grid_handle = lib.tg_grid_build(
        cloud, len(cloud), cell if cell else max(4 * clearance, 0.25)
    )
    try:
        out = np.empty((4096, 3), dtype=np.float64)
        n = lib.tg_rrt_plan(
            grid_handle, start, goal, float(clearance), lo, hi,
            prev.ctypes.data_as(ctypes.c_void_p), len(prev), float(step),
            int(max_samples), int(seed), out, len(out),
        )
    finally:
        lib.tg_grid_free(grid_handle)
    if n <= 0:
        return None
    return out[:n].copy()
