"""Unit tests for the spline operator constants.

Strategy per SURVEY.md §4: validate blossom subdivision against direct curve
evaluation, conversion matrices against C0/C1/C2 continuity, and the jerk Gram
matrix against numerical quadrature — none of which the reference tests at all.
"""

import numpy as np
import pytest

from trajopt_tpu.ops import splines as sp


def rand_cp(rng, n=6):
    return rng.standard_normal((n, 3))


class TestBlossom:
    def test_identity_on_full_interval(self):
        m = sp.blossom_matrix(0.0, 1.0)
        np.testing.assert_allclose(m, np.eye(6), atol=1e-12)

    def test_partition_matches_curve(self):
        """Control points of the restricted curve reproduce the curve values."""
        rng = np.random.default_rng(0)
        cp = rand_cp(rng)
        t0, t1 = 0.3, 0.7
        sub_cp = sp.blossom_matrix(t0, t1) @ cp
        ts = np.linspace(0, 1, 17)
        # curve of sub_cp at local s equals original at t0 + s*(t1-t0)
        lhs = sp.bezier_eval(sub_cp, ts)
        rhs = sp.bezier_eval(cp, t0 + ts * (t1 - t0))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_subdivision_endpoints_chain(self):
        """Adjacent subdivisions share endpoint control points."""
        rng = np.random.default_rng(1)
        cp = rand_cp(rng)
        res = 8
        for r in range(res - 1):
            a = sp.blossom_matrix(r / res, (r + 1) / res) @ cp
            b = sp.blossom_matrix((r + 1) / res, (r + 2) / res) @ cp
            np.testing.assert_allclose(a[-1], b[0], atol=1e-10)

    def test_convex_hull_rows_sum_to_one(self):
        m = sp.blossom_matrix(0.12, 0.57)
        np.testing.assert_allclose(m.sum(axis=1), np.ones(6), atol=1e-12)
        assert (m >= -1e-12).all()


class TestConversion:
    def test_continuity_across_joints(self):
        """Converted per-piece Bezier curves join with C0/C1/C2 continuity."""
        rng = np.random.default_rng(2)
        piece_num = 4
        ops = sp.build_spline_ops(piece_num, res=4)
        t = ops.trajectory_num
        spline = rng.standard_normal((t, 3))
        idx = sp.piece_row_index(piece_num)
        pieces = spline[idx]  # [P, 6, 3]
        bez = np.einsum("pij,pjd->pid", ops.convert, pieces)
        n = 5
        for p in range(piece_num - 1):
            a, b = bez[p], bez[p + 1]
            # C0
            np.testing.assert_allclose(a[-1], b[0], atol=1e-10)
            # C1: n*(a5-a4) == n*(b1-b0) for equal time weights
            np.testing.assert_allclose(a[-1] - a[-2], b[1] - b[0], atol=1e-10)
            # C2
            np.testing.assert_allclose(
                a[-1] - 2 * a[-2] + a[-3], b[2] - 2 * b[1] + b[0], atol=1e-10
            )

    def test_reference_half_blend_values(self):
        """For equal time weights the joint blends are the 1/4,1/2,1/4 rows
        of CCDUtils.h:157-165 with p=q=1/2."""
        ops = sp.build_spline_ops(2, res=2)
        c0, c1 = ops.convert[0], ops.convert[1]
        np.testing.assert_allclose(c0[4, 3:6], [0.5, 0.5, 0.0], atol=1e-15)
        np.testing.assert_allclose(c0[5, 3:6], [0.25, 0.5, 0.25], atol=1e-15)
        np.testing.assert_allclose(c1[0, 0:3], [0.25, 0.5, 0.25], atol=1e-15)
        np.testing.assert_allclose(c1[1, 0:3], [0.0, 0.5, 0.5], atol=1e-15)


class TestDynamicMatrix:
    @pytest.mark.parametrize("der", [1, 2, 3])
    def test_against_quadrature(self, der):
        """x^T M x must equal the integral of the squared der-th derivative.

        The der-th derivative of an order-n Bezier is an order-(n-der) Bezier
        with control points given by iterated forward differences scaled by
        n(n-1)...(n-der+1); integrate its square by quadrature.
        """
        rng = np.random.default_rng(3)
        x = rng.standard_normal(6)
        m = sp.dynamic_matrix(order=5, der=der)
        d_cp, n = x.copy(), 5
        for k in range(der):
            d_cp = (n - k) * np.diff(d_cp)
        quad_ts = np.linspace(0, 1, 4001)
        vals = sp.bezier_eval(d_cp[:, None], quad_ts, order=5 - der)[:, 0]
        integral = np.trapezoid(vals**2, quad_ts)
        assert abs(x @ m @ x - integral) / max(integral, 1.0) < 1e-5

    def test_positive_definite(self):
        m = sp.dynamic_matrix()
        w = np.linalg.eigvalsh(m)
        assert w.min() > 0


class TestWaypointInit:
    def test_layout_and_pinning(self):
        wp = np.array([[0, 0, 0], [1, 0, 0], [2, 1, 0]], dtype=float)
        s = sp.waypoints_to_spline(wp)
        assert s.shape == (9, 3)  # T = 6 + (P-1)*3 = 9 for P=2
        np.testing.assert_allclose(s[0], wp[0])
        np.testing.assert_allclose(s[1], wp[0])  # pinned
        np.testing.assert_allclose(s[-1], wp[2])
        np.testing.assert_allclose(s[-2], wp[2])  # pinned
        np.testing.assert_allclose(s[4], wp[1])  # interior waypoint row

    def test_interior_head_tail(self):
        wp = np.array([[0.0, 0, 0], [10.0, 0, 0]])
        s = sp.waypoints_to_spline(wp)
        np.testing.assert_allclose(s[2], [1.0, 0, 0])  # head = 0.9wp0+0.1wp1
        np.testing.assert_allclose(s[3], [9.0, 0, 0])  # tail
