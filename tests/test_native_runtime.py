"""C++ host runtime vs pure-Python oracles (grid broadphase, OBJ, RRT)."""

import numpy as np
import pytest

from trajopt_tpu.runtime import native
from trajopt_tpu.scenes import generators as gen


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_lib_builds():
    assert native.available()


@needs_native
def test_grid_query_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (3000, 3))
    grid = native.VoxelGrid(pts, cell=0.8)
    lo = rng.uniform(-4, 3, (20, 3))
    hi = lo + rng.uniform(0.1, 1.5, (20, 3))
    radius = 0.4
    idx, count = grid.query_aabbs(lo, hi, radius, max_k=64)
    for q in range(20):
        d = np.maximum(lo[q] - pts, 0) + np.maximum(pts - hi[q], 0)
        inside = np.where(((d <= radius).all(axis=1)))[0]
        # native counts points inside the fattened box (L-inf padding)
        got = set(int(i) for i in idx[q] if i >= 0)
        assert got <= set(inside.tolist())
        # all L2-within-radius points must be found (they are a subset)
        d2 = (np.maximum(lo[q] - pts, 0) + np.maximum(pts - hi[q], 0)) ** 2
        l2 = np.where(d2.sum(1) <= radius * radius)[0]
        if len(l2) <= 64:
            assert set(l2.tolist()) <= got


@needs_native
def test_grid_min_dist_matches_kdtree():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, (2000, 3))
    grid = native.VoxelGrid(pts, cell=0.5)
    q = rng.uniform(-4, 4, (50, 3))
    got = grid.min_dist(q)
    ref, _ = cKDTree(pts).query(q)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


@needs_native
def test_read_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    v = rng.standard_normal((100, 3))
    p = tmp_path / "cloud.obj"
    with open(p, "w") as f:
        f.write("# comment\n")
        for row in v:
            f.write(f"v {row[0]:.17g} {row[1]:.17g} {row[2]:.17g}\n")
        f.write("f 1 2 3\n")
    got = native.read_obj(str(p))
    np.testing.assert_allclose(got, v)


@needs_native
def test_rrt_plan_native():
    cloud = gen.sphere_scene(500, radius=1.0, seed=3)
    start, goal = np.array([-3.0, 0, 0]), np.array([3.0, 0, 0])
    path = native.rrt_plan(cloud, start, goal, clearance=0.15, seed=4)
    assert path is not None
    np.testing.assert_allclose(path[0], start, atol=1e-9)
    np.testing.assert_allclose(path[-1], goal, atol=1e-9)
    # every densely sampled path point keeps clearance
    from scipy.spatial import cKDTree

    tree = cKDTree(cloud)
    for i in range(len(path) - 1):
        seg = path[i][None] + np.linspace(0, 1, 50)[:, None] * (path[i + 1] - path[i])
        d, _ = tree.query(seg)
        assert (d > 0.15).all()


def test_python_rrt_fallback():
    from trajopt_tpu.scenes import rrt as pyrrt

    cloud = gen.sphere_scene(300, radius=0.8, seed=5)
    path = pyrrt.plan_rrt_connect(
        cloud, np.array([-3.0, 0, 0]), np.array([3.0, 0, 0]), clearance=0.15, seed=6
    )
    assert path is not None
    from scipy.spatial import cKDTree

    tree = cKDTree(cloud)
    for i in range(len(path) - 1):
        seg = path[i][None] + np.linspace(0, 1, 50)[:, None] * (path[i + 1] - path[i])
        d, _ = tree.query(seg)
        assert (d > 0.15).all()
