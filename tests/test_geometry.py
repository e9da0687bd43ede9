"""GJK / plane / CCD geometry kernels vs brute-force oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.ops import geometry as geo


def brute_point_hull(verts, point, n_grid=0):
    """Exact distance via scipy-free QP: dense sampling of barycentric simplex
    is hopeless; instead solve with projected gradient to high accuracy."""
    u = verts - point
    m = len(u)
    w = np.full(m, 1.0 / m)
    for _ in range(20000):
        v = w @ u
        g = u @ v
        # exact FW + away for reference, tiny step sizes
        s = np.argmin(g)
        d = u[s] - v
        denom = d @ d
        if denom < 1e-18:
            break
        gamma = np.clip(-(v @ d) / denom, 0, 1)
        w = w + gamma * (np.eye(m)[s] - w)
        sup = np.where(w > 1e-14, g, -np.inf)
        a = np.argmax(sup)
        d2 = u[s] - u[a]
        den2 = d2 @ d2
        if den2 > 1e-18:
            g2 = np.clip(-(v @ d2) / den2, 0, w[a])
            w2 = w.copy()
            w2[s] += g2
            w2[a] -= g2
            if np.linalg.norm(w2 @ u) < np.linalg.norm(w @ u):
                w = w2
    return np.linalg.norm(w @ u)


class TestPointHull:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_bruteforce(self, seed):
        rng = np.random.default_rng(seed)
        verts = rng.standard_normal((6, 3))
        point = rng.standard_normal(3) * 2
        hd = geo.point_hull_distance(jnp.asarray(verts), jnp.asarray(point), iters=40)
        ref = brute_point_hull(verts, point)
        assert float(hd.dist) >= ref - 1e-8   # upper bound
        assert float(hd.lb) <= ref + 1e-8     # lower bound
        assert abs(float(hd.dist) - ref) < 1e-5
        if ref > 1e-3:
            assert abs(float(hd.lb) - ref) < 1e-4

    def test_point_inside_hull(self):
        rng = np.random.default_rng(42)
        verts = np.array(
            [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1], [0, 0, 2], [0, 0, -2]],
            dtype=float,
        )
        point = np.array([0.05, 0.02, 0.01])
        hd = geo.point_hull_distance(jnp.asarray(verts), jnp.asarray(point), iters=40)
        assert float(hd.dist) < 0.2
        assert float(hd.lb) <= 1e-6  # no positive separation certificate

    def test_vertex_closest(self):
        verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1], [1, 1, 1]])
        point = np.array([-3.0, 0, 0])
        hd = geo.point_hull_distance(jnp.asarray(verts), jnp.asarray(point), iters=40)
        np.testing.assert_allclose(float(hd.dist), 3.0, atol=1e-6)
        np.testing.assert_allclose(float(hd.lb), 3.0, atol=1e-5)


class TestDegenerateHulls:
    """Affinely-dependent vertex sets — the COMMON case in this workload
    (straight trajectory segments have collinear control points).  r3
    regression: the subset-GJK accepted roundoff-noise barycentric solutions
    of degenerate faces, collapsing v toward 0 — a false 'in contact' that
    froze the 64-robot CCD and mis-measured clearances."""

    @pytest.mark.parametrize("seed", range(6))
    @pytest.mark.slow
    def test_collinear_exact(self, seed):
        rng = np.random.default_rng(seed)
        a, b = rng.standard_normal(3), rng.standard_normal(3)
        t = np.sort(rng.uniform(0, 1, 6))[:, None]
        verts = a * (1 - t) + b * t
        point = rng.standard_normal(3) * 1.5
        # closed-form point-to-segment oracle
        ab = b - a
        s = np.clip((point - a) @ ab / (ab @ ab), t.min(), t.max())
        ref = np.linalg.norm(a + s * ab - point)
        for dtype in (np.float32, np.float64):
            hd = geo.point_hull_distance(
                jnp.asarray(verts.astype(dtype)), jnp.asarray(point.astype(dtype)), 16
            )
            tol = 2e-4 if dtype == np.float32 else 1e-9
            assert abs(float(hd.dist) - ref) < tol * max(ref, 1.0), (float(hd.dist), ref)
            assert float(hd.lb) <= ref + tol
            assert float(hd.dist) - float(hd.lb) < tol * max(ref, 1.0)

    def test_duplicate_vertices(self):
        rng = np.random.default_rng(3)
        base = rng.standard_normal((3, 3))
        verts = np.repeat(base, 2, axis=0)
        point = rng.standard_normal(3) * 2
        hd = geo.point_hull_distance(jnp.asarray(verts), jnp.asarray(point), 16)
        ref = brute_point_hull(base, point)
        assert abs(float(hd.dist) - ref) < 1e-5

    def test_regression_bridge_hull(self):
        """The exact (hull, point) pair that produced dist=2.9e-6 vs truth
        4.083 in round 3 and froze the 64-robot bench."""
        hull = np.array(
            [[2.2809587, 0.0, 0.67651784], [2.5089912, 0.0, 0.6756201],
             [2.7371867, 0.0, 0.67448187], [2.9656165, 0.0, 0.6728897],
             [3.1942744, 0.0, 0.6706719], [3.4229255, 0.0, 0.66803765]],
            dtype=np.float32,
        )
        point = np.array([3.0375373, -1.1192315, 4.5992527], dtype=np.float32)
        hd = geo.point_hull_distance(jnp.asarray(hull), jnp.asarray(point), 16)
        ref = brute_point_hull(hull.astype(np.float64), point.astype(np.float64))
        assert abs(float(hd.dist) - ref) < 1e-4, (float(hd.dist), ref)
        assert float(hd.dist) - float(hd.lb) < 1e-4


class TestHullHull:
    @pytest.mark.parametrize("seed", range(4))
    def test_separated_clouds_vs_bruteforce(self, seed):
        rng = np.random.default_rng(seed)
        a = rng.uniform(0, 1, (8, 3))
        gap = 0.5 + seed * 0.2
        b = rng.uniform(0, 1, (8, 3)) + np.array([1.0 + gap, 0, 0])
        hd = geo.hull_hull_distance(jnp.asarray(a), jnp.asarray(b), iters=48)
        diff = (a[:, None, :] - b[None, :, :]).reshape(-1, 3)
        true = brute_point_hull(diff, np.zeros(3))
        assert float(hd.lb) <= true + 1e-8
        assert float(hd.dist) >= true - 1e-8
        assert abs(float(hd.dist) - true) < 1e-4
        assert true > (b[:, 0].min() - a[:, 0].max()) - 1e-9  # sanity: >= x-gap

    def test_known_distance(self):
        a = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
        b = a + np.array([3.0, 0, 0])
        hd = geo.hull_hull_distance(jnp.asarray(a), jnp.asarray(b), iters=40)
        np.testing.assert_allclose(float(hd.dist), 2.0, atol=1e-6)
        np.testing.assert_allclose(float(hd.lb), 2.0, atol=1e-5)


class TestObstaclePlane:
    @pytest.mark.slow
    def test_plane_separates(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            hull = rng.standard_normal((6, 3)) * 0.3 + np.array([0, 0, 1.0])
            point = rng.standard_normal(3) * 0.1
            fit = geo.obstacle_plane(
                jnp.asarray(hull), jnp.asarray(point), offset=0.1, margin=0.5, iters=40
            )
            if not bool(fit.valid):
                continue
            c, d = np.asarray(fit.c), float(fit.d)
            # plane holds on the hull with clearance offset
            assert (hull @ c + d > -1e-6).all()
            # obstacle on the negative side by exactly offset
            np.testing.assert_allclose(point @ c + d, -0.1, atol=1e-6)

    def test_invalid_when_far(self):
        hull = np.eye(3).repeat(2, 0).astype(float)
        point = np.array([50.0, 0, 0])
        fit = geo.obstacle_plane(jnp.asarray(hull), jnp.asarray(point), 0.1, 0.1)
        assert not bool(fit.valid)


class TestPairPlane:
    def test_symmetric_split(self):
        rng = np.random.default_rng(5)
        a = rng.standard_normal((6, 3)) * 0.1 + np.array([0, 0, 0.15])
        b = rng.standard_normal((6, 3)) * 0.1 - np.array([0, 0, 0.15])
        fit = geo.pair_plane(jnp.asarray(a), jnp.asarray(b), offset=0.1, margin=0.1, iters=40)
        if bool(fit.valid):
            c, d = np.asarray(fit.c), float(fit.d)
            assert (a @ c + d - 0.05 > -1e-7).all()
            assert (-(b @ c) - d - 0.05 > -1e-7).all()


class TestKdop:
    def test_axes_normalized(self):
        ax = geo.kdop_axes()
        assert ax.shape == (49, 3)
        np.testing.assert_allclose(np.linalg.norm(ax, axis=1), 1.0, atol=1e-12)

    @pytest.mark.slow
    def test_lb_is_lower_bound(self):
        rng = np.random.default_rng(9)
        axes = jnp.asarray(geo.kdop_axes())
        for _ in range(10):
            a = rng.standard_normal((6, 3))
            b = rng.standard_normal((6, 3)) + np.array([2.5, 0, 0])
            lb = float(geo.kdop_separation_lb(jnp.asarray(a), jnp.asarray(b), axes))
            true = float(geo.hull_hull_distance(jnp.asarray(a), jnp.asarray(b), iters=60).dist)
            assert lb <= true + 1e-7


class TestCCD:
    def test_clear_monotone_in_step(self):
        """If [0, s] is clear then any [0, s'] with s' < s must be clear."""
        rng = np.random.default_rng(13)
        hull = rng.standard_normal((6, 3)) * 0.5 + np.array([0, 0, 3.0])
        direction = np.tile(np.array([0, 0, -6.0]), (6, 1))  # sweeps past origin
        point = np.zeros(3)
        clear_full = bool(
            geo.ccd_point_clear(jnp.asarray(hull), jnp.asarray(direction), jnp.asarray(point), jnp.asarray(1.0), 0.1, 40)
        )
        assert not clear_full  # sweeps straight through the obstacle
        clear_half = bool(
            geo.ccd_point_clear(jnp.asarray(hull), jnp.asarray(direction), jnp.asarray(point), jnp.asarray(0.3), 0.1, 40)
        )
        assert clear_half

    @pytest.mark.slow
    def test_conservative_vs_sampling(self):
        """Accepted steps never pass closer than offset at sampled times."""
        rng = np.random.default_rng(17)
        for trial in range(10):
            hull = rng.standard_normal((6, 3)) * 0.5 + np.array([0, 2.0, 0])
            direction = rng.standard_normal((6, 3)) * 0.5
            point = rng.standard_normal(3) * 0.3
            step = rng.uniform(0.1, 1.0)
            ok = bool(
                geo.ccd_point_clear(
                    jnp.asarray(hull), jnp.asarray(direction), jnp.asarray(point), jnp.asarray(step), 0.1, 40
                )
            )
            if ok:
                for t in np.linspace(0, step, 13):
                    d = brute_point_hull(hull + t * direction, point)
                    assert d > 0.1 - 1e-6


def test_two_level_broadphase_matches_direct():
    """coarse_k two-level candidates == direct top_k (same points, same mask)
    when the coarse level has no overflow."""
    import numpy as np
    from trajopt_tpu.ops import broadphase as bp
    from trajopt_tpu import types as tt

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)) * 6.0
    scene = tt.make_scene(pts)
    hull = jnp.asarray(rng.normal(size=(3, 4, 6, 3)))
    radius, k = 0.4, 8
    direct = bp.topk_candidates(hull, scene, radius, k)
    two = bp.topk_candidates(hull, scene, radius, k, coarse_k=256)
    assert not bool(bp.coarse_overflow(hull, scene, radius, 256).any())
    # same masked candidate sets (ordering/ties may differ)
    for p in range(hull.shape[0]):
        for r in range(hull.shape[1]):
            a = set(np.asarray(direct.idx[p, r])[np.asarray(direct.mask[p, r])])
            b = set(np.asarray(two.idx[p, r])[np.asarray(two.mask[p, r])])
            assert a == b
