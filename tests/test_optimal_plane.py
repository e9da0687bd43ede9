"""Plane refinement (optimal_plane=1 path) vs the plain GJK plane."""

import jax.numpy as jnp
import pytest
import numpy as np

from trajopt_tpu.config import TrajOptConfig
from trajopt_tpu.ops import geometry as geo
from trajopt_tpu import types as tt
from trajopt_tpu.ops import splines as sp
from trajopt_tpu.scenes import generators as gen
from trajopt_tpu.solver import admm, driver


def barrier_energy(hull, point, c, d, margin):
    dist = hull @ c + d
    e = 0.0
    for x in np.asarray(dist):
        if x <= 0:
            return np.inf
        if x < margin:
            e += -((x - margin) ** 2) * np.log(x / margin)
    return e


@pytest.mark.slow
def test_refined_plane_not_worse():
    rng = np.random.default_rng(4)
    worse = 0
    for trial in range(12):
        hull = rng.standard_normal((6, 3)) * 0.2 + np.array([0, 0, 0.4])
        point = rng.standard_normal(3) * 0.05
        fit = geo.obstacle_plane(jnp.asarray(hull), jnp.asarray(point), 0.1, 0.3, 40)
        if not bool(fit.valid):
            continue
        e0 = barrier_energy(hull, point, np.asarray(fit.c), float(fit.d), 0.3)
        c2, d2 = geo.refine_plane(
            jnp.asarray(hull), jnp.asarray(point), fit.c, 0.1, 0.3
        )
        e1 = barrier_energy(hull, point, np.asarray(c2), float(d2), 0.3)
        # refinement minimizes the barrier; allow tiny numerical slack
        if not (e1 <= e0 + 1e-8):
            worse += 1
        # refined plane still unit-norm and valid geometry
        np.testing.assert_allclose(np.linalg.norm(np.asarray(c2)), 1.0, atol=1e-6)
    assert worse == 0


@pytest.mark.slow
def test_refined_pair_plane_not_worse():
    """self_optimal_cd equivalent: refined pair plane lowers (or keeps) the
    symmetric two-sided barrier energy vs the fresh mid-plane."""

    def pair_energy(a, b, c, d, offset, margin):
        e = 0.0
        for dist in list(a @ c + d - 0.5 * offset) + list(-(b @ c) - d - 0.5 * offset):
            if dist <= 0:
                return np.inf
            if dist < margin:
                e += -((dist - margin) ** 2) * np.log(dist / margin)
        return e

    rng = np.random.default_rng(11)
    checked = 0
    for trial in range(12):
        a = rng.standard_normal((6, 3)) * 0.1 + np.array([0, 0, 0.18])
        b = rng.standard_normal((6, 3)) * 0.1 - np.array([0, 0, 0.18])
        fit = geo.pair_plane(jnp.asarray(a), jnp.asarray(b), 0.1, 0.1, 40)
        if not bool(fit.valid):
            continue
        e0 = pair_energy(a, b, np.asarray(fit.c), float(fit.d), 0.1, 0.1)
        if not np.isfinite(e0):
            continue
        c2, d2 = geo.refine_pair_plane(
            jnp.asarray(a), jnp.asarray(b), fit.c, fit.d, 0.1, 0.1
        )
        e1 = pair_energy(a, b, np.asarray(c2), float(d2), 0.1, 0.1)
        assert e1 <= e0 + 1e-8, (trial, e0, e1)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(c2)), 1.0, atol=1e-6)
        checked += 1
    assert checked >= 4


@pytest.mark.slow
def test_solver_runs_with_optimal_plane():
    cfg = TrajOptConfig(res=2, max_planes=8, max_ccd_candidates=8, optimal_plane=True)
    cloud = gen.sphere_scene(200, radius=1.0, seed=1)
    wp = np.array(
        [[-3.0, 0, 0], [-1.2, 1.3, 0], [1.2, 1.3, 0], [3.0, 0, 0]]
    )
    ops = sp.build_spline_ops(len(wp) - 1, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state = tt.init_state(ops, wp, cfg.init_piece_time)
    state, hist = driver.solve(consts, cfg, state, scene, max_iters=80)
    assert hist[-1]["gnorm"] < cfg.stop


@pytest.mark.slow
def test_plane_cache_warm_start_not_worse():
    """Persistent-cache refinement (CCDUtils.h:64-70 semantics): on a fixed
    state, iterated cached refinement reaches a barrier energy <= the fresh
    single-shot refinement (refinement accumulates across iterations)."""
    import jax.numpy as jnp2

    cfg = TrajOptConfig(res=2, max_planes=8, max_ccd_candidates=8, optimal_plane=True)
    cloud = gen.sphere_scene(300, radius=1.1, seed=3)
    wp = np.array([[-3.0, 0, 0], [-1.2, 1.25, 0], [1.2, 1.25, 0], [3.0, 0, 0]])
    ops = sp.build_spline_ops(len(wp) - 1, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state = tt.init_state(ops, wp, cfg.init_piece_time)

    from trajopt_tpu.ops import energies as en
    from trajopt_tpu.types import empty_plane_cache

    def barrier(planes):
        return float(
            en.plane_barrier_energy(consts, cfg, state.spline, planes).value
        )

    fresh, _ = admm.separate_planes(consts, cfg, state.spline, scene)
    cache = empty_plane_cache(consts.piece_num, consts.res, cfg.max_planes)
    for _ in range(3):
        cached_planes, _, cache = admm.separate_planes(
            consts, cfg, state.spline, scene, cache
        )
    if int(np.asarray(fresh.mask).sum()) == 0:
        return  # scene variant without active planes: nothing to compare
    assert (np.asarray(cached_planes.mask) == np.asarray(fresh.mask)).all()
    assert barrier(cached_planes) <= barrier(fresh) + 1e-9


def _pair_barrier(consts, cfg, state, planes) -> float:
    """Summed live-plane barrier over the robot axis (own-side energies)."""
    from trajopt_tpu.ops import energies as en

    vals = []
    for i in range(state.spline.shape[0]):
        pl = tt.Planes(
            c=planes.c[i], d=planes.d[i], mask=planes.mask[i]
        )
        vals.append(
            float(en.plane_barrier_energy(consts, cfg, state.spline[i], pl).value)
        )
    return float(np.sum(vals))


@pytest.mark.slow
def test_multi_pair_plane_cache_not_worse():
    """Multi-robot persistent pair-plane cache (Optimization3D_multi.h:278-327
    semantics): on a fixed fleet state, iterated cached refinement reaches a
    pair-barrier energy <= the fresh single-shot refinement."""
    from trajopt_tpu.solver import multi as multi_mod

    cfg = TrajOptConfig(
        res=2, max_planes=4, max_self_planes=2, max_ccd_candidates=4,
        ks=1e-3, optimal_plane=True,
    )
    # two antiparallel robots 0.26 apart: inside the pair-plane band
    wps = []
    for i in range(2):
        sgn = 1 if i % 2 == 0 else -1
        s = np.array([sgn * 3.0, 0.0, 0.26 * i])
        e = np.array([-sgn * 3.0, 0.0, 0.26 * i])
        t = np.linspace(0, 1, 4)[:, None]
        wps.append(s * (1 - t) + e * t)
    ops = sp.build_spline_ops(3, cfg.res)
    consts = tt.device_consts(ops)
    state = multi_mod.init_multi_state(ops, wps, cfg.init_piece_time)

    fresh, _ = multi_mod.self_planes(consts, cfg, state.spline, None)
    if int(np.asarray(fresh.mask).sum()) == 0:
        return
    _, pair_cache = multi_mod.init_multi_caches(cfg, consts, 2)
    for _ in range(3):
        cached, _, pair_cache = multi_mod.self_planes(
            consts, cfg, state.spline, None, cache=pair_cache
        )
    assert (np.asarray(cached.mask) == np.asarray(fresh.mask)).all()
    # cache keys persisted for every live slot
    assert (
        (np.asarray(pair_cache.partner) >= 0) == np.asarray(cached.mask)
    ).all()
    e_cached = _pair_barrier(consts, cfg, state, cached)
    e_fresh = _pair_barrier(consts, cfg, state, fresh)
    assert e_cached <= e_fresh + 1e-6, (e_cached, e_fresh)


@pytest.mark.slow
def test_multi_solver_runs_with_optimal_plane():
    """solve_multi threads the persistent caches (optimal_plane=1) end-to-end."""
    from trajopt_tpu.solver import multi as multi_mod

    cfg = TrajOptConfig(
        res=2, max_planes=4, max_self_planes=2, max_ccd_candidates=4,
        ks=1e-3, optimal_plane=True,
    )
    wps = []
    for i in range(2):
        sgn = 1 if i % 2 == 0 else -1
        s = np.array([sgn * 3.0, 0.0, 0.26 * i])
        e = np.array([-sgn * 3.0, 0.0, 0.26 * i])
        t = np.linspace(0, 1, 4)[:, None]
        wps.append(s * (1 - t) + e * t)
    ops = sp.build_spline_ops(3, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(np.full((8, 3), 100.0))
    state = multi_mod.init_multi_state(ops, wps, cfg.init_piece_time)
    state, hist = driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=60
    )
    assert hist[-1]["gnorm"] < cfg.stop


@pytest.mark.slow
def test_fused_multi_cached_matches_host_loop():
    """The fused device loop with carried caches (driver.
    solve_fused_multi_cached) must match the host loop step-for-step —
    closing the round-4 gap where the fused path silently ran cache-less
    under optimal_plane=1."""
    import jax
    import jax.numpy as jnp

    from trajopt_tpu.solver import multi as multi_mod

    cfg = TrajOptConfig(
        res=2, max_planes=4, max_self_planes=2, max_ccd_candidates=4,
        ks=1e-3, optimal_plane=True,
    )
    wps = []
    for i in range(2):
        sgn = 1 if i % 2 == 0 else -1
        s = np.array([sgn * 3.0, 0.0, 0.26 * i])
        e = np.array([-sgn * 3.0, 0.0, 0.26 * i])
        t = np.linspace(0, 1, 4)[:, None]
        wps.append(s * (1 - t) + e * t)
    ops = sp.build_spline_ops(3, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(np.full((8, 3), 100.0))
    state0 = multi_mod.init_multi_state(ops, wps, cfg.init_piece_time)

    ref, hist = driver.solve_multi(
        consts, cfg, state0, scene, coupled=True, max_iters=6
    )
    caches = multi_mod.init_multi_caches(cfg, consts, 2, state0.spline.dtype)
    fused, it, gnorm, caches = driver.solve_fused_multi_cached(
        consts, cfg, state0, scene, True, caches, max_iters=6
    )
    assert int(it) == len(hist)
    np.testing.assert_allclose(
        np.asarray(fused.spline), np.asarray(ref.spline), rtol=1e-9, atol=1e-10
    )
    # cache keys live where the final plane table is live
    obs_cache, pair_cache = caches
    assert int(np.asarray(pair_cache.partner >= 0).sum()) > 0
