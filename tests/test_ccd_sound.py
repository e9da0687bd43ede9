"""Soundness of the CCD certification layer (ops/ccd.py).

Regression for the fixed-K candidate-overflow bug: when more obstacle points
fall within reach of a swept hull than the GJK slot count, the old CCD
silently dropped the overflow from certification and accepted unsafe steps
(32-robot coupled cross runs lost feasibility and livelocked at ccd_step=0).
The new layer certifies EVERY pair via the exhaustive k-DOP gap, so an unsafe
step must always be flagged regardless of slot count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.ops import ccd as ccd_ops


@jax.jit
def _brute_min_dist(verts, pts):
    """Min over pts of the distance to conv(verts): one vmapped long-iteration
    Frank-Wolfe solve (float64 under the test conftest)."""
    from trajopt_tpu.ops import geometry as geo

    d = jax.vmap(lambda p: geo.point_hull_distance(verts, p, 200).dist)(pts)
    return jnp.min(d)


def brute_min_swept(hull, dhull, pts, step):
    verts = jnp.asarray(
        np.concatenate([hull, hull + step * dhull], axis=0), jnp.float64
    )
    return float(_brute_min_dist(verts, jnp.asarray(pts, jnp.float64)))


class TestObstacleSoundness:
    def _tabs(self, hull, dhull, pts, k):
        pmask = jnp.ones(len(pts), bool)
        return ccd_ops.build_obstacle_ccd(
            jnp.asarray(hull)[None, None, None],
            jnp.asarray(dhull)[None, None, None],
            jnp.asarray(pts), pmask, k, 0.1,
        )

    def test_overflow_wall_is_flagged(self):
        """A wall of many co-distant points ahead of a fast hull: even with
        k_gjk=2 slots the unsafe full step must be flagged."""
        rng = np.random.default_rng(0)
        hull = rng.normal(size=(6, 3)) * 0.1            # small hull at origin
        dhull = np.tile([5.0, 0.0, 0.0], (6, 1))        # sweep through x=2.5
        wall = np.stack([
            np.full(64, 2.5),
            rng.uniform(-0.3, 0.3, 64),
            rng.uniform(-0.3, 0.3, 64),
        ], axis=1)
        tabs = self._tabs(hull, dhull, wall, k=2)
        bad_full = ccd_ops.obstacle_bad(tabs, jnp.asarray(1.0), 0.1, 64, False)
        assert bool(bad_full.any()), "unsafe full step not flagged"
        bad_tiny = ccd_ops.obstacle_bad(tabs, jnp.asarray(1e-3), 0.1, 64, False)
        assert not bool(bad_tiny.any()), "safe tiny step wrongly flagged"

    @pytest.mark.slow
    def test_certified_steps_are_truly_safe(self):
        """Property: any step the layer certifies keeps true clearance >
        offset for EVERY point (brute force), over random scenes."""
        rng = np.random.default_rng(1)
        offset = 0.1
        checked = 0
        for trial in range(8):
            hull = rng.normal(size=(6, 3))
            dhull = rng.normal(size=(6, 3)) * 2.0
            pts = rng.normal(size=(128, 3)) * 2.0
            tabs = self._tabs(hull, dhull, pts, k=4)
            for step in (1.0, 0.5, 0.25, 0.1, 0.01):
                bad = bool(ccd_ops.obstacle_bad(
                    tabs, jnp.asarray(step), offset, 64, False
                ).any())
                if not bad:
                    dmin = brute_min_swept(hull, dhull, pts, step)
                    assert dmin > offset - 1e-9, (trial, step, dmin)
                    checked += 1
        assert checked > 0

    def test_masked_points_ignored(self):
        hull = np.zeros((6, 3))
        dhull = np.zeros((6, 3))
        pts = np.zeros((4, 3))                          # all colliding...
        pmask = jnp.zeros(4, bool)                      # ...but all masked
        tabs = ccd_ops.build_obstacle_ccd(
            jnp.asarray(hull)[None, None, None],
            jnp.asarray(dhull)[None, None, None],
            jnp.asarray(pts), pmask, 2, 0.1,
        )
        assert not bool(ccd_ops.obstacle_bad(tabs, jnp.asarray(1.0), 0.1, 32, False).any())


class TestPairSoundness:
    def test_crossing_robots_flagged(self):
        """Two robots whose segment hulls swap positions: full step unsafe,
        tiny step safe; with 3+ robots converging, slot overflow must not
        unflag the collision."""
        rng = np.random.default_rng(2)
        u, p, r, n = 4, 1, 1, 6
        base = rng.normal(size=(n, 3)) * 0.05
        # robots on a circle of radius 2, all moving through the center
        hulls = np.stack([
            base + np.array([2*np.cos(a), 2*np.sin(a), 0.0])
            for a in np.linspace(0, 2*np.pi, u, endpoint=False)
        ])[:, None, None]                                # [U,1,1,n,3]
        dhulls = -2.0 * hulls                            # sweep to -pos (through 0)
        gids = jnp.arange(u, dtype=jnp.int32)
        tabs = ccd_ops.build_pair_ccd(
            jnp.asarray(hulls), jnp.asarray(dhulls),
            jnp.asarray(hulls), jnp.asarray(dhulls), gids, k_gjk=1,
        )
        ones = jnp.ones(u)
        bad = ccd_ops.pair_bad(tabs, ones, ones, 0.1, 64, False)
        assert bool(bad.any())
        tiny = jnp.full((u,), 1e-3)
        bad0 = ccd_ops.pair_bad(tabs, tiny, tiny, 0.1, 64, False)
        assert not bool(bad0.any())

    def test_per_robot_steps(self):
        """Asymmetric steps: robot A stopped, robot B sweeping into A."""
        n = 6
        rng = np.random.default_rng(3)
        base = rng.normal(size=(n, 3)) * 0.05
        hulls = np.stack([base + [0, 0, 0], base + [3, 0, 0]])[:, None, None]
        dhulls = np.stack([np.zeros((n, 3)), np.tile([-3.0, 0, 0], (n, 1))])[:, None, None]
        gids = jnp.arange(2, dtype=jnp.int32)
        tabs = ccd_ops.build_pair_ccd(
            jnp.asarray(hulls), jnp.asarray(dhulls),
            jnp.asarray(hulls), jnp.asarray(dhulls), gids, k_gjk=1,
        )
        # B at full step crashes into A
        bad = ccd_ops.pair_bad(tabs, jnp.array([1.0, 1.0]), jnp.array([1.0, 1.0]), 0.1, 64, False)
        assert bool(bad.any())
        # B limited to 10%: clear (ends 2.7 away)
        bad = ccd_ops.pair_bad(tabs, jnp.array([1.0, 0.1]), jnp.array([1.0, 0.1]), 0.1, 64, False)
        assert not bool(bad.any())


class TestLadderFreeze:
    """When NO rung of the 0.8^k ladder certifies, the step must be exactly 0
    (strict soundness — r1 returned the uncertified floor rung 0.8^63)."""

    def test_ladder_bisect_all_fail_returns_zero(self):
        from trajopt_tpu.config import TrajOptConfig
        from trajopt_tpu.solver import admm

        cfg = TrajOptConfig()
        step = admm.ladder_bisect(
            cfg, lambda s: jnp.asarray(False), jnp.float64
        )
        assert float(step) == 0.0

    def test_ccd_step_freezes_on_infeasible_incumbent(self):
        """A hull already within offset of an obstacle cannot certify any
        rung (even step->0 keeps the violation) => ccd_step returns 0."""
        from trajopt_tpu import types as tt
        from trajopt_tpu.config import TrajOptConfig
        from trajopt_tpu.ops import splines as sp
        from trajopt_tpu.solver import admm

        cfg = TrajOptConfig(res=2, max_ccd_candidates=4)
        ops = sp.build_spline_ops(2, cfg.res)
        consts = tt.device_consts(ops)
        wp = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        state = tt.init_state(ops, wp, 20.0)
        # obstacle directly on the trajectory: incumbent is already violating
        scene = tt.make_scene(np.array([[1.0, 0.0, 0.0]]))
        direction = jnp.ones_like(state.spline)
        step = admm.ccd_step(consts, cfg, state.spline, direction, scene)
        assert float(step) == 0.0

    @pytest.mark.slow
    def test_decoupled_freeze_on_infeasible_pair(self):
        """Two robots whose hulls already overlap: per-robot decoupled CCD
        must freeze both at 0 after the shrink budget."""
        from trajopt_tpu import types as tt
        from trajopt_tpu.config import TrajOptConfig
        from trajopt_tpu.ops import splines as sp
        from trajopt_tpu.solver import multi as multi_mod

        cfg = TrajOptConfig(res=2, max_self_planes=2, max_ccd_candidates=4)
        ops = sp.build_spline_ops(2, cfg.res)
        consts = tt.device_consts(ops)
        wp = np.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        wps = [wp, wp + 1e-3]                     # overlapping trajectories
        state = multi_mod.init_multi_state(ops, wps, 20.0)
        scene = tt.make_scene(np.array([[100.0, 100.0, 100.0]]))  # far away
        directions = jnp.ones_like(state.spline)
        steps = multi_mod.decoupled_ccd_steps(
            consts, cfg, state.spline, directions, scene, None
        )
        assert (np.asarray(steps) == 0.0).all()


class TestAnalyticMaxStep:
    """Soundness of the analytic max-step CCD (ops/ccd.py::obstacle_max_step /
    pair_max_step + solver rung flooring): every returned step, swept over
    its whole interval, must keep true clearance > offset (brute force)."""

    @pytest.mark.slow
    def test_obstacle_max_step_sound(self):
        from trajopt_tpu.config import TrajOptConfig
        from trajopt_tpu.solver import admm

        cfg = TrajOptConfig()
        rng = np.random.default_rng(7)
        offset = 0.1
        nontrivial = 0
        for trial in range(12):
            hull = rng.normal(size=(6, 3))
            dhull = rng.normal(size=(6, 3)) * 2.0
            pts = rng.normal(size=(128, 3)) * 2.0
            pmask = jnp.ones(len(pts), bool)
            tabs = ccd_ops.build_obstacle_ccd(
                jnp.asarray(hull)[None, None, None],
                jnp.asarray(dhull)[None, None, None],
                jnp.asarray(pts), pmask, 4, offset,
            )
            s = float(ccd_ops.obstacle_max_step(tabs, offset, 64, False)[0])
            step = float(admm.rung_floor(cfg, jnp.asarray(s, jnp.float64)))
            assert 0.0 <= step <= s + 1e-12
            if step > 0.0:
                dmin = brute_min_swept(hull, dhull, pts, step)
                assert dmin > offset - 1e-9, (trial, s, step, dmin)
                if step < 1.0:
                    nontrivial += 1
        assert nontrivial > 0, "no shrunk-step case exercised"

    @pytest.mark.slow
    def test_obstacle_max_step_escapes_near_contact(self):
        """A static point just above offset clearance (a k-DOP false positive
        regime) must yield a strictly positive step — the absorbing-state
        regression of the 64-robot livelock."""
        rng = np.random.default_rng(8)
        offset = 0.1
        hull = rng.normal(size=(6, 3)) * 0.3
        # place a point at clearance ~offset + 0.012 off one face
        from trajopt_tpu.ops import geometry as geo
        probe = np.array([10.0, 0.3, -0.2])
        hd = geo.point_hull_distance(jnp.asarray(hull), jnp.asarray(probe), 200)
        cvec = np.asarray(hd.v) / float(hd.dist)
        witness = probe - np.asarray(hd.v)      # closest point on hull
        pt = witness + cvec * (offset + 0.012)
        dhull = rng.normal(size=(6, 3))         # generic direction
        pmask = jnp.ones(1, bool)
        tabs = ccd_ops.build_obstacle_ccd(
            jnp.asarray(hull)[None, None, None],
            jnp.asarray(dhull)[None, None, None],
            jnp.asarray(pt)[None], pmask, 4, offset,
        )
        s = float(ccd_ops.obstacle_max_step(tabs, offset, 64, False)[0])
        assert s > 0.0, "near-contact state absorbed (no positive step)"
        dmin = brute_min_swept(hull, dhull, pt[None], s * 0.999)
        assert dmin > offset - 1e-9

    @pytest.mark.slow
    def test_pair_max_step_sound(self):
        rng = np.random.default_rng(9)
        offset = 0.1
        u, n = 4, 6
        nontrivial = 0
        for trial in range(6):
            hulls = rng.normal(size=(u, 1, 1, n, 3)) * 1.5
            dhulls = rng.normal(size=(u, 1, 1, n, 3)) * 2.0
            gids = jnp.arange(u, dtype=jnp.int32)
            tabs = ccd_ops.build_pair_ccd(
                jnp.asarray(hulls), jnp.asarray(dhulls),
                jnp.asarray(hulls), jnp.asarray(dhulls), gids, 2,
            )
            s = float(jnp.min(ccd_ops.pair_max_step(tabs, offset, 64, False)))
            if s <= 0.0:
                continue
            # brute force: pairwise swept Minkowski distance at the common step
            for i in range(u):
                for j in range(i + 1, u):
                    a = np.concatenate(
                        [hulls[i, 0, 0], hulls[i, 0, 0] + s * 0.999 * dhulls[i, 0, 0]]
                    )
                    b = np.concatenate(
                        [hulls[j, 0, 0], hulls[j, 0, 0] + s * 0.999 * dhulls[j, 0, 0]]
                    )
                    from trajopt_tpu.ops import geometry as geo
                    diff = (a[:, None, :] - b[None, :, :]).reshape(-1, 3)
                    d = float(geo.origin_simplex_dist(
                        jnp.asarray(diff, jnp.float64), 64
                    ).dist)
                    assert d > offset - 1e-9, (trial, s, i, j, d)

        # deterministic partial-approach case: robots 4 apart, each sweeping
        # 2.5 toward the other (total closing 5 > 4) => certified step
        # strictly inside (0, 1)
        base = rng.normal(size=(n, 3)) * 0.05
        hulls = np.stack([base, base + [4.0, 0, 0]])[:, None, None]
        dhulls = np.stack([
            np.tile([2.5, 0.0, 0.0], (n, 1)), np.tile([-2.5, 0.0, 0.0], (n, 1))
        ])[:, None, None]
        gids2 = jnp.arange(2, dtype=jnp.int32)
        tabs = ccd_ops.build_pair_ccd(
            jnp.asarray(hulls), jnp.asarray(dhulls),
            jnp.asarray(hulls), jnp.asarray(dhulls), gids2, 2,
        )
        s = float(jnp.min(ccd_ops.pair_max_step(tabs, offset, 64, False)))
        assert 0.0 < s < 1.0, s
        a = np.concatenate([hulls[0, 0, 0], hulls[0, 0, 0] + s * 0.999 * dhulls[0, 0, 0]])
        b = np.concatenate([hulls[1, 0, 0], hulls[1, 0, 0] + s * 0.999 * dhulls[1, 0, 0]])
        from trajopt_tpu.ops import geometry as geo
        diff = (a[:, None, :] - b[None, :, :]).reshape(-1, 3)
        d = float(geo.origin_simplex_dist(jnp.asarray(diff, jnp.float64), 64).dist)
        assert d > offset - 1e-9, (s, d)

    def test_rung_floor_lattice(self):
        from trajopt_tpu.config import TrajOptConfig
        from trajopt_tpu.solver import admm

        cfg = TrajOptConfig()
        # strict semantics: the limit is the supremum with clearance ==
        # offset, so a rung landing exactly ON the limit shrinks once more
        # (the max-step functions clip at 1 + 1e-6, not 1.0, so an
        # unconstrained sweep still admits the full step)
        for s, want in [(1.5, 1.0), (1.0 + 1e-6, 1.0), (1.0, 0.8),
                        (0.9, 0.8), (0.8, 0.8 ** 2),
                        (0.79, 0.8 ** 2), (0.0, 0.0), (-1.0, 0.0)]:
            got = float(admm.rung_floor(cfg, jnp.asarray(s, jnp.float64)))
            assert abs(got - want) < 1e-12, (s, got, want)
        # below the smallest rung -> 0
        tiny = float(admm.rung_floor(cfg, jnp.asarray(1e-9, jnp.float64)))
        assert tiny == 0.0


class TestAnalyticMaxStepDirect:
    """Soundness of the table-free three-level max-step CCD
    (ops/ccd.py::obstacle_max_step_direct / pair_max_step_direct): every
    returned step, swept over its whole interval, keeps true clearance >
    offset — including with TINY candidate budgets, which exercises the
    robot-level (M+1)-th / partner (K+1)-th caps."""

    @pytest.mark.slow
    @pytest.mark.parametrize("s1_slots", [128, 4])
    def test_obstacle_direct_sound(self, s1_slots):
        rng = np.random.default_rng(7)
        offset = 0.1
        nontrivial = 0
        for trial in range(12):
            hull = rng.normal(size=(6, 3))
            dhull = rng.normal(size=(6, 3)) * 2.0
            pts = rng.normal(size=(128, 3)) * 2.0
            pmask = jnp.ones(len(pts), bool)
            s = float(ccd_ops.obstacle_max_step_direct(
                jnp.asarray(hull)[None, None, None],
                jnp.asarray(dhull)[None, None, None],
                jnp.asarray(pts), pmask, offset, 64, False,
                s1_slots=s1_slots, n_slots=8,
            )[0])
            if s > 0.0:
                dmin = brute_min_swept(hull, dhull, pts, min(s, 1.0) * 0.999)
                assert dmin > offset - 1e-9, (trial, s1_slots, s, dmin)
                if s < 1.0:
                    nontrivial += 1
        # tiny slot counts legitimately cap many cases to 0 — only the
        # realistic budget must exercise the shrunk-step regime
        if s1_slots >= 128:
            assert nontrivial > 0, "no shrunk-step case exercised"

    def test_obstacle_direct_escapes_near_contact(self):
        """Near-contact k-DOP false positive must still yield s > 0 (the
        absorbing-state regression)."""
        rng = np.random.default_rng(8)
        offset = 0.1
        hull = rng.normal(size=(6, 3)) * 0.3
        from trajopt_tpu.ops import geometry as geo
        probe = np.array([10.0, 0.3, -0.2])
        hd = geo.point_hull_distance(jnp.asarray(hull), jnp.asarray(probe), 200)
        cvec = np.asarray(hd.v) / float(hd.dist)
        witness = probe - np.asarray(hd.v)
        pt = witness + cvec * (offset + 0.012)
        dhull = rng.normal(size=(6, 3))
        s = float(ccd_ops.obstacle_max_step_direct(
            jnp.asarray(hull)[None, None, None],
            jnp.asarray(dhull)[None, None, None],
            jnp.asarray(pt)[None], jnp.ones(1, bool), offset, 64, False,
        )[0])
        assert s > 0.0, "near-contact state absorbed (no positive step)"
        dmin = brute_min_swept(hull, dhull, pt[None], min(s, 1.0) * 0.999)
        assert dmin > offset - 1e-9

    @pytest.mark.slow
    @pytest.mark.parametrize("k_partners", [8, 1])
    def test_pair_direct_sound(self, k_partners):
        from trajopt_tpu.ops import geometry as geo

        rng = np.random.default_rng(9)
        offset = 0.1
        u, n = 4, 6
        for trial in range(6):
            hulls = rng.normal(size=(u, 1, 1, n, 3)) * 1.5
            dhulls = rng.normal(size=(u, 1, 1, n, 3)) * 2.0
            gids = jnp.arange(u, dtype=jnp.int32)
            s = float(jnp.min(ccd_ops.pair_max_step_direct(
                jnp.asarray(hulls), jnp.asarray(dhulls),
                jnp.asarray(hulls), jnp.asarray(dhulls), gids,
                offset, 64, False, k_partners=k_partners, n_slots=2,
            )))
            if s <= 0.0:
                continue
            sl = min(s, 1.0) * 0.999
            for i in range(u):
                for j in range(i + 1, u):
                    a = np.concatenate(
                        [hulls[i, 0, 0], hulls[i, 0, 0] + sl * dhulls[i, 0, 0]]
                    )
                    b = np.concatenate(
                        [hulls[j, 0, 0], hulls[j, 0, 0] + sl * dhulls[j, 0, 0]]
                    )
                    diff = (a[:, None, :] - b[None, :, :]).reshape(-1, 3)
                    d = float(geo.origin_simplex_dist(
                        jnp.asarray(diff, jnp.float64), 64
                    ).dist)
                    assert d > offset - 1e-9, (trial, k_partners, s, i, j, d)
        # the strictly-inside (0,1) regime is exercised deterministically by
        # test_pair_direct_partial_approach

    def test_pair_direct_partial_approach(self):
        """Robots 4 apart closing 5 total: certified step strictly inside
        (0, 1), and safe at that step."""
        from trajopt_tpu.ops import geometry as geo

        rng = np.random.default_rng(10)
        n = 6
        offset = 0.1
        base = rng.normal(size=(n, 3)) * 0.05
        hulls = np.stack([base, base + [4.0, 0, 0]])[:, None, None]
        dhulls = np.stack([
            np.tile([2.5, 0.0, 0.0], (n, 1)), np.tile([-2.5, 0.0, 0.0], (n, 1))
        ])[:, None, None]
        gids2 = jnp.arange(2, dtype=jnp.int32)
        s = float(jnp.min(ccd_ops.pair_max_step_direct(
            jnp.asarray(hulls), jnp.asarray(dhulls),
            jnp.asarray(hulls), jnp.asarray(dhulls), gids2,
            offset, 64, False, k_partners=2, n_slots=2,
        )))
        assert 0.0 < s < 1.0, s
        a = np.concatenate([hulls[0, 0, 0], hulls[0, 0, 0] + s * 0.999 * dhulls[0, 0, 0]])
        b = np.concatenate([hulls[1, 0, 0], hulls[1, 0, 0] + s * 0.999 * dhulls[1, 0, 0]])
        diff = (a[:, None, :] - b[None, :, :]).reshape(-1, 3)
        d = float(geo.origin_simplex_dist(jnp.asarray(diff, jnp.float64), 64).dist)
        assert d > offset - 1e-9, (s, d)
