"""Multi-robot consensus ADMM: decoupled and coupled-time modes.

TPU-native re-architecture of `Optimization3D_multi`
(Optimization3D_multi.h:29-174).  The robot axis is a batch axis (vmap on one
chip) that becomes a sharded mesh axis under `shard_map`
(see `trajopt_tpu.parallel`).  Cross-robot coupling is isolated to four
communication points, each parameterized by an optional ``axis_name``:

1. inter-robot separating planes need all robots' hulls   -> all_gather
2. the shared-time Schur scalars (coupled mode)           -> psum
3. the joint CCD step / joint Armijo energy (coupled)     -> psum / pmin
4. gnorm aggregation                                       -> psum

With ``axis_name=None`` everything runs on the local robot axis — identical
math, one chip.

State convention: a `SolverState` whose leaves carry a leading robot axis U;
``piece_time`` has shape [U] in both modes (coupled keeps all entries equal —
one scalar per the reference's shared `piece_time`,
Optimization3D_multi.h:120).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TrajOptConfig
from ..types import Planes, Scene, SolverState, SplineConsts, StepDiag, concat_planes
from ..ops import broadphase as bp
from ..ops import ccd as ccd_ops
from ..ops import energies as en
from ..ops import geometry as geo
from ..ops import gradients as gr
from ..ops import kkt
from . import admm

_SHRINK = admm._SHRINK
_ARMIJO_C = admm._ARMIJO_C


def _gsum(x, axis_name):
    s = jnp.sum(x)
    return jax.lax.psum(s, axis_name) if axis_name else s


def _gany(x, axis_name):
    a = jnp.any(x)
    return jax.lax.psum(a.astype(jnp.int32), axis_name) > 0 if axis_name else a


def _gmin(x, axis_name):
    m = jnp.min(x)
    return jax.lax.pmin(m, axis_name) if axis_name else m


def _gather_robots(x, axis_name):
    """[U_local, ...] -> [U_total, ...] (identity without an axis name)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True) if axis_name else x


def _robot_offset(u_local: int, axis_name) -> jnp.ndarray:
    if axis_name is None:
        return jnp.asarray(0, jnp.int32)
    return (jax.lax.axis_index(axis_name) * u_local).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Inter-robot separating planes (Optimization3D_multi.h:237-342)
# ---------------------------------------------------------------------------


def self_planes(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    splines: jnp.ndarray,          # [U,T,3] local robots
    axis_name: str | None = None,
    cache=None,
    groups: int = 1,
) -> tuple[Planes, jnp.ndarray] | tuple[Planes, jnp.ndarray, "PairPlaneCache"]:
    """Per-robot plane tables against every other robot's segment hull.

    Each robot computes its own side of each pair plane (the symmetric
    formula of Separate::selfgjk + Optimal_plane::optimal_d makes the two
    sides consistent), so the only communication is one hull all_gather.
    Returns (planes, overflow) — overflow means live in-radius pairs beyond
    ``cfg.self_plane_gjk_budget`` got no plane this iteration.

    ``cache`` (a `types.PairPlaneCache`, used when ``cfg.optimal_plane``):
    candidates whose partner robot was planed last iteration warm-start the
    symmetric refinement from the CACHED plane — the reference's persistent
    ``is_self_seperate/self_seperate_c/self_seperate_d`` semantics
    (Optimization3D_multi.h:278-327).  Returns (planes, overflow, new_cache).
    """
    u_local = splines.shape[0]
    my_hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)   # [U,P,R,n,3]
    all_hulls = _gather_robots(my_hulls, axis_name)                 # [Ut,P,R,n,3]
    u_total = all_hulls.shape[0]
    ks = min(cfg.max_self_planes, max(u_total - 1, 1))
    radius = cfg.offset + 2 * cfg.margin

    lo_a, hi_a = bp.hull_aabbs(my_hulls)                            # [U,P,R,3]
    lo_b, hi_b = bp.hull_aabbs(all_hulls)                           # [Ut,P,R,3]
    gap = jnp.maximum(
        lo_a[:, None] - hi_b[None], jnp.maximum(lo_b[None] - hi_a[:, None], 0.0)
    )                                                               # [U,Ut,P,R,3]
    d2 = jnp.sum(gap * gap, axis=-1)                                # [U,Ut,P,R]
    gids = _robot_offset(u_local, axis_name) + jnp.arange(u_local, dtype=jnp.int32)
    other = jnp.arange(u_total, dtype=jnp.int32)[None, :]
    excluded = gids[:, None] == other
    if groups > 1:
        # scenario-grouped fleet: robots only interact within their group
        upg = u_total // groups
        excluded = excluded | ((gids[:, None] // upg) != (other // upg))
    d2 = jnp.where(excluded[:, :, None, None], jnp.inf, d2)
    d2 = jnp.moveaxis(d2, 1, -1)                                    # [U,P,R,Ut]
    nf = u_local * consts.piece_num * consts.res * ks
    budget = min(nf, cfg.self_plane_gjk_budget)
    dtype = splines.dtype
    shape = (u_local, consts.piece_num, consts.res, ks)

    from ..ops import pallas_topk as ptk

    nd2, idx = ptk.smallest_k(d2, ks)                               # [U,P,R,ks]
    cand_mask = nd2 <= radius * radius
    flat_mask = cand_mask.reshape(-1)
    overflow = jnp.sum(flat_mask) > budget

    def live_path(_):
        # idx selects the partner robot; other_hulls: [U,P,R,ks,n,3]
        other_hulls = jnp.take_along_axis(
            jnp.broadcast_to(
                jnp.moveaxis(all_hulls, 0, 2)[None],                # [1,P,R,Ut,n,3]
                (u_local,) + jnp.moveaxis(all_hulls, 0, 2).shape,
            ),
            idx[..., None, None],
            axis=3,
        )

        # flat-batched mid-plane fit (Separate::selfgjk +
        # Optimal_plane::optimal_d), COMPACTED to the nearest ``budget``
        # in-radius pairs fleet-wide, then scattered back.
        d2f = jnp.where(flat_mask, nd2.reshape(-1), jnp.inf)
        _, sel = jax.lax.top_k(-d2f, budget)
        sel_live = flat_mask[sel]
        flat_mine = jnp.broadcast_to(
            my_hulls[:, :, :, None], other_hulls.shape
        ).reshape(-1, consts.n_cp, 3)[sel]
        flat_other = other_hulls.reshape(-1, consts.n_cp, 3)[sel]
        diff = (
            flat_mine[:, :, None, :] - flat_other[:, None, :, :]
        ).reshape(budget, -1, 3)
        hd = geo.batched_origin_dist(
            diff, cfg.gjk_iters, geo.use_pallas_gjk(cfg, dtype)
        )
        vn = jnp.maximum(hd.dist, 1e-12)
        c = (hd.v / vn[:, None]).astype(dtype)
        d0 = jnp.min(-jnp.einsum("nmd,nd->nm", flat_other, c), axis=1)
        d1 = jnp.max(-jnp.einsum("nmd,nd->nm", flat_mine, c), axis=1)
        d = 0.5 * (d0 + d1)
        d = jax.vmap(
            lambda ha, hb, cc, dd: geo._optimal_d(
                ha, hb, cc, dd, cfg.offset, cfg.margin, 8
            )
        )(flat_mine, flat_other, c, d)
        if cache is not None:
            # persistent pair-plane warm start (Optimization3D_multi.h:
            # 278-327): candidates whose partner id has a cached plane refine
            # from the CACHED (c, d) — refinement accumulates across
            # iterations.  Only warm planes that are feasible for BOTH
            # current hulls (the hulls moved since caching) are used.
            match = idx[..., :, None] == cache.partner[..., None, :]
            hit_t = jnp.any(match, axis=-1)
            slot = jnp.argmax(match, axis=-1)                     # [U,P,R,ks]
            warm_c_t = jnp.take_along_axis(cache.c, slot[..., None], axis=3)
            warm_d_t = jnp.take_along_axis(cache.d, slot, axis=3)
            hit = hit_t.reshape(-1)[sel]
            warm_c = warm_c_t.reshape(-1, 3)[sel]
            warm_d = warm_d_t.reshape(-1)[sel]
            wa = jnp.einsum("nmd,nd->nm", flat_mine, warm_c) + warm_d[:, None]
            wb = -(jnp.einsum("nmd,nd->nm", flat_other, warm_c) + warm_d[:, None])
            warm_ok = hit & jnp.all(wa > 0.5 * cfg.offset, axis=1) & jnp.all(
                wb > 0.5 * cfg.offset, axis=1
            )
            c = jnp.where(warm_ok[:, None], warm_c, c)
            d = jnp.where(warm_ok, warm_d, d)
        if cfg.optimal_plane:
            # barrier-optimal rotation refinement of the pair plane
            # (Optimal_plane::self_optimal_cd, Optimal_plane.h:620-773); the
            # fresh mid-plane (or the cached plane) is the warm start
            c_r, d_r = jax.vmap(
                lambda ha, hb, cc, dd: geo.refine_pair_plane(
                    ha, hb, cc, dd, cfg.offset, cfg.margin
                )
            )(flat_mine, flat_other, c, d)
            good = jnp.all(jnp.isfinite(c_r), axis=-1) & jnp.isfinite(d_r)
            c = jnp.where(good[:, None], c_r, c)
            d = jnp.where(good, d_r, d)
        # Near-contact feasibility clamp on this robot's OWN side (see
        # solver/admm.py::separate_planes): keeps the plane live (pushing the
        # pair apart like the reference's exact-GJK planes, Separate.h:
        # 265-286) instead of dropped/infeasible when f32 leaves the midplane
        # a hair on the wrong side of the hull.
        my_smin = jnp.min(jnp.einsum("nmd,nd->nm", flat_mine, c), axis=1)
        d_store = d - 0.5 * cfg.offset
        d_store = jnp.maximum(d_store, 1e-3 * cfg.margin - my_smin)
        valid = hd.dist <= cfg.offset + 2 * cfg.margin
        # scatter the compacted results back into the full candidate table
        c_full = jnp.zeros((nf, 3), dtype).at[sel].set(c)
        d_full = jnp.zeros((nf,), dtype).at[sel].set(d_store.astype(dtype))
        ok_full = jnp.zeros((nf,), bool).at[sel].set(sel_live & valid)
        d_mid_full = jnp.zeros((nf,), dtype).at[sel].set(d.astype(dtype))
        return c_full, d_full, ok_full, d_mid_full

    def dead_path(_):
        return (
            jnp.zeros((nf, 3), dtype),
            jnp.zeros((nf,), dtype),
            jnp.zeros((nf,), bool),
            jnp.zeros((nf,), dtype),
        )

    # no robot pair in radius (early/far regime): skip hull gathers, GJK
    # and refinement
    c_full, d_full, ok_full, d_mid_full = jax.lax.cond(
        jnp.any(flat_mask), live_path, dead_path, operand=None
    )
    planes = Planes(
        c=c_full.reshape(*shape, 3),
        d=d_full.reshape(shape),
        mask=ok_full.reshape(shape),
    )
    if cache is None:
        return planes, overflow
    from ..types import PairPlaneCache

    # new cache: the refined MIDPLANE (c, d) per live slot, keyed by partner id
    new_cache = PairPlaneCache(
        partner=jnp.where(planes.mask, idx, -1).astype(jnp.int32),
        c=planes.c,
        d=d_mid_full.reshape(shape),
    )
    return planes, overflow, new_cache


# ---------------------------------------------------------------------------
# CCD steps
# ---------------------------------------------------------------------------


def _build_ccd(consts, cfg, splines, directions, scene, axis_name, groups=1):
    """Robot-pair CCD tables for the decoupled per-robot-step fixpoint
    (ops/ccd.py::pair_bad — sound for every pair).  The obstacle and coupled
    paths use the table-free `*_max_step_direct` functions instead."""
    u_local = splines.shape[0]
    my_hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)
    my_dhulls = jax.vmap(lambda s: en.seg_cps(consts, s))(directions)
    all_hulls = _gather_robots(my_hulls, axis_name)
    all_dhulls = _gather_robots(my_dhulls, axis_name)
    gids = _robot_offset(u_local, axis_name) + jnp.arange(u_local, dtype=jnp.int32)
    ks = min(cfg.max_self_planes, max(all_hulls.shape[0] - 1, 1))
    pair = ccd_ops.build_pair_ccd(
        my_hulls, my_dhulls, all_hulls, all_dhulls, gids, ks, groups=groups
    )
    return None, pair


def _self_collision(cfg, pair_tabs, my_steps, all_steps):
    """[U] bool: any uncertified pair involving each local robot, with
    per-robot step intervals ([0,s_i] vs [0,s_j], Step::self_step semantics)."""
    return ccd_ops.pair_bad(
        pair_tabs, my_steps, all_steps, cfg.offset, cfg.gjk_iters,
        geo.use_pallas_gjk(cfg, pair_tabs.my_hull.dtype),
    )


def coupled_ccd_step(consts, cfg, splines, directions, scene, axis_name,
                     groups: int = 1):
    """One fleet-wide scalar step (Step::couple_self_step + per-robot
    position_step min-reduce, Optimization3D_multi.h:586-594): the
    three-level analytic per-pair max-step (ops/ccd.py::*_direct)
    min-reduced over the fleet in a single certification pass, floored to
    the 0.8^k rung lattice.

    ``groups > 1``: the fleet is ``groups`` independent coupled problems —
    per-GROUP min and rung floor, returning [groups]."""
    u_local = splines.shape[0]
    my_hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)
    my_dhulls = jax.vmap(lambda s: en.seg_cps(consts, s))(directions)
    all_hulls = _gather_robots(my_hulls, axis_name)
    all_dhulls = _gather_robots(my_dhulls, axis_name)
    gids = _robot_offset(u_local, axis_name) + jnp.arange(u_local, dtype=jnp.int32)
    pallas = geo.use_pallas_gjk(cfg, splines.dtype)
    s_obs = ccd_ops.obstacle_max_step_direct(
        my_hulls, my_dhulls, scene.points, scene.mask, cfg.offset,
        cfg.gjk_iters, pallas, s1_slots=max(8, cfg.max_ccd_candidates),
        n_slots=cfg.ccd_gjk_slots, seg_budget=cfg.ccd_seg_budget,
    )
    s_pair = ccd_ops.pair_max_step_direct(
        my_hulls, my_dhulls, all_hulls, all_dhulls, gids, cfg.offset,
        cfg.gjk_iters, pallas,
        k_partners=max(1, 2 * cfg.max_self_planes),
        n_slots=cfg.ccd_pair_gjk_slots, groups=groups,
    )
    s_r = jnp.minimum(s_obs, s_pair)                      # [U] per robot
    if groups > 1:
        s_g = jnp.min(s_r.reshape(groups, -1), axis=1)    # [G]
        return jax.vmap(lambda s: admm.rung_floor(cfg, s))(s_g)
    s = _gmin(s_r, axis_name)
    return admm.rung_floor(cfg, s)


def decoupled_ccd_steps(consts, cfg, splines, directions, scene, axis_name,
                        interact=True, groups=1):
    """Per-robot steps: pairwise self-shrink then obstacle min
    (Optimization3D_multi.h:74-83).  The obstacle part tests the ladder in
    parallel per robot; the pairwise part stays a fixpoint loop because the
    collision predicate couples both robots' current steps.

    ``interact=False`` (independent-scenario batch): skip the pairwise
    fixpoint entirely."""
    u = splines.shape[0]
    if not interact:
        steps = jnp.ones((u,), splines.dtype)
        bad = jnp.zeros((u,), bool)
    else:
        _, pair_tabs = _build_ccd(
            consts, cfg, splines, directions, scene, axis_name, groups=groups
        )

        def cond(carry):
            steps, bad, i = carry
            return (i < cfg.max_line_search) & _gany(bad, axis_name)

        def body(carry):
            steps, bad, i = carry
            steps = jnp.where(bad, steps * _SHRINK, steps)
            all_steps = _gather_robots(steps, axis_name)
            bad = _self_collision(cfg, pair_tabs, steps, all_steps)
            return steps, bad, i + 1

        steps0 = jnp.ones((u,), splines.dtype)
        bad0 = _self_collision(
            cfg, pair_tabs, steps0, _gather_robots(steps0, axis_name)
        )
        steps, bad, _ = jax.lax.while_loop(
            cond, body, (steps0, bad0, jnp.asarray(0))
        )
        # soundness: robots still uncertified after the shrink budget freeze
        # at 0 (shrinking a robot's interval only shrinks swept hulls, so
        # zeroing never invalidates another robot's certificate).
        steps = jnp.where(bad, jnp.zeros_like(steps), steps)

    # per-robot obstacle limit: analytic max-step, rung-floored per robot
    pallas = geo.use_pallas_gjk(cfg, splines.dtype)
    my_hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)
    my_dhulls = jax.vmap(lambda s: en.seg_cps(consts, s))(directions)
    s_obs = ccd_ops.obstacle_max_step_direct(
        my_hulls, my_dhulls, scene.points, scene.mask, cfg.offset,
        cfg.gjk_iters, pallas, s1_slots=max(8, cfg.max_ccd_candidates),
        n_slots=cfg.ccd_gjk_slots, seg_budget=cfg.ccd_seg_budget,
    )
    obs_steps = jax.vmap(lambda s: admm.rung_floor(cfg, s))(s_obs)
    return jnp.minimum(steps, obs_steps)


# ---------------------------------------------------------------------------
# Full iterations
# ---------------------------------------------------------------------------


def _all_planes(consts, cfg, state, scene, axis_name, caches=None,
                interact=True, groups=1):
    """Fleet plane tables: (planes [U,...], overflow bool[, new caches]).

    ``caches``: optional (obstacle PlaneCache [U,...], PairPlaneCache) pair —
    the multi-robot persistent optimal_plane=1 state (threaded by
    `multi_admm_step_cached` / `driver.solve_multi`).

    ``interact=False``: the leading axis is an independent-SCENARIO batch,
    not a fleet — skip the robot-pair planes entirely."""
    multi = interact and (state.spline.shape[0] > 1 or axis_name is not None)
    if caches is not None:
        obs_cache, pair_cache = caches
        obstacle, ovf, obs_cache = jax.vmap(
            lambda s, ca: admm.separate_planes(consts, cfg, s, scene, ca)
        )(state.spline, obs_cache)
        overflow = jnp.any(ovf)
        if multi:
            slf, self_ovf, pair_cache = self_planes(
                consts, cfg, state.spline, axis_name, cache=pair_cache,
                groups=groups,
            )
            planes = jax.vmap(concat_planes)(obstacle, slf)
            return planes, overflow | self_ovf, (obs_cache, pair_cache)
        return obstacle, overflow, (obs_cache, pair_cache)
    if cfg.optimal_plane:
        # refined path keeps the full per-robot tables (cache-slot aligned)
        obstacle, ovf = jax.vmap(
            lambda s: admm.separate_planes(consts, cfg, s, scene)
        )(state.spline)
        overflow = jnp.any(ovf)
    else:
        obstacle, overflow = admm.separate_planes_batch(
            consts, cfg, state.spline, scene
        )
    if multi:
        slf, self_ovf = self_planes(
            consts, cfg, state.spline, axis_name, groups=groups
        )
        return jax.vmap(concat_planes)(obstacle, slf), overflow | self_ovf
    return obstacle, overflow


def _directions(consts, cfg, state, planes):
    """Per-robot reduced KKT solves.

    Autodiff + assembly vmap over robots; the PSD repair and the factor/solve
    run ONCE on the stacked [U,...] blocks (batch-polymorphic `kkt.local_solve`)
    so the fused Pallas Cholesky sees the whole robot axis in one call."""
    def gh(st, pl):
        return gr.piece_grads_and_hessians(
            consts, cfg, st.spline, st.piece_time, pl,
            st.p_slack, st.t_slack, st.p_lambda, st.t_lambda, repair=False,
        )

    g, h = jax.vmap(gh)(state, planes)                  # [U,P,19], [U,P,19,19]
    h = gr.apply_psd_repair(cfg, h)
    red = jax.vmap(lambda gg, hh: kkt.assemble_reduced(consts, gg, hh))(g, h)
    return kkt.local_solve(red), red


def _coupled_grouped_update(consts, cfg, state, planes, ls, red, scene, groups):
    """Coupled spline update for a GROUPED fleet: ``groups`` independent
    coupled problems of u/groups robots each, advanced in lockstep in one
    call (the scenario-batched serving path for coupled fleets).  All the
    fleet-wide reductions of the groups=1 branch — shared-time Schur sums,
    joint CCD min, joint Armijo energies — become per-group segment sums;
    the ladder predicates stay batch-GLOBAL scalars so the `lax.cond`
    staging remains a real branch (see `driver.solve_fused_batch`).
    Math per group is identical to Optimization3D_multi.h:508-639.
    """
    u = state.spline.shape[0]
    upg = u // groups
    g = groups

    def gsum(x):                                         # [U] -> [G]
        return jnp.sum(x.reshape(g, upg), axis=1)

    def rep(x):                                          # [G] -> [U]
        return jnp.repeat(x, upg, total_repeat_length=u)

    s_tot = gsum(ls.schur_s)
    r_tot = gsum(ls.schur_r)
    ds, dt = kkt.finish_direction(ls, rep(s_tot), rep(r_tot))
    rs, rt_local, ainv_rs = kkt.correct_direction(red, ls, ds, dt)
    rt_tot = gsum(rt_local)
    br = gsum(jnp.einsum("ui,ui->u", red.b, ainv_rs))
    s_safe = jnp.maximum(s_tot, 1e-5 * jnp.maximum(jnp.abs(s_tot), 1.0))
    cdt = -(rt_tot - br) / s_safe                        # [G]
    ds = ds + (-ainv_rs - rep(cdt)[:, None] * ls.ainv_b)
    dt = dt + rep(cdt)
    gt_g = gsum(red.gt)                                  # [G]
    dt_g = dt.reshape(g, upg)[:, 0]
    wolfe = -(gsum(jnp.einsum("ui,ui->u", ds, red.gs)) + dt_g * gt_g)  # [G]
    finite = (
        jnp.isfinite(wolfe)
        & jnp.all(jnp.isfinite(ds.reshape(g, -1)), axis=1)
        & jnp.isfinite(dt_g)
    )
    bad = ~finite | ~(wolfe > 0)                         # [G]
    ds = jnp.where(rep(bad)[:, None], -red.gs, ds)
    dt = jnp.where(rep(bad), -rep(gt_g), dt)
    wolfe = jnp.where(bad, gsum(jnp.sum(red.gs**2, axis=1)) + gt_g**2, wolfe)
    dt_g = dt.reshape(g, upg)[:, 0]
    directions = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
    # mean per-group gnorm (decoupled-mean semantics across the batch)
    gn_g = jnp.sqrt(gsum(jnp.sum(red.gs**2, axis=1)) + gt_g**2) / upg
    gnorm = jnp.mean(gn_g)

    step0 = coupled_ccd_step(
        consts, cfg, state.spline, directions, scene, None, groups=g
    )                                                    # [G]
    t0_g = state.piece_time.reshape(g, upg)[:, 0]
    step0 = jnp.where(t0_g + step0 * dt_g <= 0, -0.95 * t0_g / dt_g, step0)

    ttab = en.build_trial_tables(consts, cfg, state, planes, directions, dt)

    def group_energy(step_g):                            # [G] -> [G]
        return gsum(en.trial_energy(consts, cfg, ttab, rep(step_g)))

    e0 = group_energy(jnp.zeros((g,), state.spline.dtype))
    e_step0 = group_energy(step0)
    accept0 = e0 - _ARMIJO_C * wolfe * step0 >= e_step0  # [G]
    ladder = admm.step_candidates(cfg, state.spline.dtype)[:, None] * step0[None, :]

    def take0(_):
        return step0, jnp.sum(e_step0)

    def armijo_ladder(_):
        ok, es = admm.staged_ladder_vals(
            lambda sub: (
                lambda es_: (e0 - _ARMIJO_C * wolfe * sub >= es_, es_)
            )(jax.vmap(group_energy)(sub)),
            ladder,
        )                                                # [S,G]
        ok = jnp.concatenate([ok[:-1], jnp.ones((1, g), bool)], axis=0)
        i = admm._first_true(ok, axis=0)                 # [G]
        sg = jnp.take_along_axis(ladder, i[None, :], axis=0)[0]
        ea = jnp.sum(jnp.take_along_axis(es, i[None, :], axis=0)[0])
        return sg, ea

    step_g, e_acc = jax.lax.cond(
        jnp.all(accept0), take0, armijo_ladder, operand=None
    )
    steps = rep(step_g)
    spline = state.spline + steps[:, None, None] * directions
    piece_time = state.piece_time + steps * dt
    return spline, piece_time, steps, rep(step0), gnorm, e_acc


def multi_admm_step(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,          # leaves have leading robot axis U
    scene: Scene,
    coupled: bool,
    axis_name: str | None = None,
    interact: bool = True,
    groups: int = 1,
) -> tuple[SolverState, StepDiag]:
    """One multi-robot ADMM iteration (coupled: Optimization3D_multi.h:120-174;
    decoupled: :29-118).

    ``interact=False``: the leading axis is an independent-SCENARIO batch of
    single-robot problems sharing one scene (no pair planes, no pair CCD) —
    the TPU scenario-batching path.  Unlike a vmapped `admm_step`, the
    batch-global predicates here keep every `lax.cond` a real branch (vmap
    lowers batched conds to `select`, which executes BOTH sides — the
    round-4 batch-throughput plateau), and the plane/CCD compaction pools
    candidates across the whole batch."""
    with jax.default_matmul_precision("highest"):
        return _multi_admm_step_impl(
            consts, cfg, state, scene, coupled, axis_name, interact=interact,
            groups=groups,
        )


def multi_admm_step_cached(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    scene: Scene,
    coupled: bool,
    caches,                      # (obstacle PlaneCache [U,...], PairPlaneCache)
    axis_name: str | None = None,
):
    """`multi_admm_step` threading the persistent multi-robot plane caches
    (optimal_plane=1 semantics, Optimization3D_multi.h:278-327).  Returns
    (state, diag, new_caches)."""
    with jax.default_matmul_precision("highest"):
        return _multi_admm_step_impl(
            consts, cfg, state, scene, coupled, axis_name, caches
        )


def _multi_admm_step_impl(
    consts, cfg, state, scene, coupled, axis_name, caches=None, interact=True,
    groups=1,
):
    # full-f32 matmul passes: bf16-pass Cholesky NaNs on ~1e6-condition KKTs
    u = state.spline.shape[0]
    u_total = u * (jax.lax.psum(1, axis_name) if axis_name else 1)
    if caches is not None:
        planes, plane_overflow, caches = _all_planes(
            consts, cfg, state, scene, axis_name, caches, interact=interact,
            groups=groups,
        )
    else:
        planes, plane_overflow = _all_planes(
            consts, cfg, state, scene, axis_name, interact=interact,
            groups=groups,
        )
    ls, red = _directions(consts, cfg, state, planes)

    if coupled and groups > 1:
        assert axis_name is None, "grouped coupled batching is single-shard"
        spline, piece_time, steps, ccd_steps, gnorm, e_acc = (
            _coupled_grouped_update(
                consts, cfg, state, planes, ls, red, scene, groups
            )
        )
    elif coupled:
        s_tot = _gsum(ls.schur_s, axis_name)
        r_tot = _gsum(ls.schur_r, axis_name)
        ds, dt = kkt.finish_direction(ls, s_tot, r_tot)   # batched; dt [U]
        # one iterative-refinement round (f32 Schur cancellation guard)
        rs, rt_local, ainv_rs = kkt.correct_direction(red, ls, ds, dt)
        rt_tot = _gsum(rt_local, axis_name)
        br = _gsum(jnp.einsum("ui,ui->u", red.b, ainv_rs), axis_name)
        s_safe = jnp.maximum(s_tot, 1e-5 * jnp.maximum(jnp.abs(s_tot), 1.0))
        cdt = -(rt_tot - br) / s_safe
        ds = ds + (-ainv_rs - cdt * ls.ainv_b)
        dt = dt + cdt
        gt_tot = _gsum(red.gt, axis_name)
        wolfe = -( _gsum(jnp.einsum("ui,ui->u", ds, red.gs), axis_name)
                   + dt[0] * gt_tot)
        # steepest-descent fallback if the Newton direction is not a descent
        # direction (numerically broken solve => Armijo would accept garbage).
        # NaN-proof: `wolfe <= 0` is False for NaN, so test the complement.
        finite = (
            jnp.isfinite(wolfe)
            & jnp.all(jnp.isfinite(ds))
            & jnp.all(jnp.isfinite(dt))
        )
        bad = ~finite | ~(wolfe > 0)
        ds = jnp.where(bad, -red.gs, ds)
        dt = jnp.where(bad, -gt_tot, dt)
        wolfe = jnp.where(
            bad, _gsum(jnp.sum(red.gs**2, axis=1), axis_name) + gt_tot**2, wolfe
        )
        directions = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
        gnorm = jnp.sqrt(
            _gsum(jnp.sum(red.gs**2, axis=1), axis_name)
            + gt_tot ** 2
        ) / u_total

        step0 = coupled_ccd_step(consts, cfg, state.spline, directions, scene, axis_name)
        # shared-time positivity clamp (single scalar time)
        t0 = state.piece_time[0]
        step0 = jnp.where(t0 + step0 * dt[0] <= 0, -0.95 * t0 / dt[0], step0)

        # O(elementwise) per-rung energies from once-per-iteration affine
        # tables (en.build_trial_tables — the per-rung hull/plane einsums
        # were the ladder stages' cost in the round-5 fused profile)
        ttab = en.build_trial_tables(
            consts, cfg, state, planes, directions, dt
        )

        def local_energy(step):
            return jnp.sum(en.trial_energy(consts, cfg, ttab, step))

        def gsum_scalar(x):
            return jax.lax.psum(x, axis_name) if axis_name else x

        e0 = gsum_scalar(local_energy(jnp.asarray(0.0, t0.dtype)))
        ladder = admm.step_candidates(cfg, t0.dtype) * step0      # [S]

        e_step0 = gsum_scalar(local_energy(step0))

        def armijo_ladder(_):
            def eval_ok(ld):
                es = gsum_scalar(jax.vmap(local_energy)(ld))      # [M]
                return e0 - _ARMIJO_C * wolfe * ld >= es, es

            # geometric staged ladder (8, 16, 32, ...) with the chosen rung's
            # energy threaded out so the diagnostic energy needs no extra
            # evaluation
            ok, es = admm.staged_ladder_vals(eval_ok, ladder)
            ok = jnp.concatenate([ok[:-1], jnp.ones(1, bool)])
            i = admm._first_true(ok)
            return ladder[i], es[i]

        accept0 = e0 - _ARMIJO_C * wolfe * step0 >= e_step0
        step, e_acc = jax.lax.cond(
            accept0, lambda _: (step0, e_step0), armijo_ladder, operand=None
        )
        spline = state.spline + step * directions
        piece_time = state.piece_time + step * dt[0]
        steps = jnp.full((u,), step, dtype=step.dtype)
        ccd_steps = jnp.full((u,), step0, dtype=step.dtype)
    else:
        ds, dt = kkt.finish_direction(ls, ls.schur_s, ls.schur_r)
        rs, rt, ainv_rs = kkt.correct_direction(red, ls, ds, dt)
        br = jnp.einsum("ui,ui->u", red.b, ainv_rs)
        s_safe = jnp.maximum(
            ls.schur_s, 1e-5 * jnp.maximum(jnp.abs(ls.schur_s), 1.0)
        )
        cdt = -(rt - br) / s_safe
        ds = ds + (-ainv_rs - cdt[:, None] * ls.ainv_b)
        dt = dt + cdt
        wolfe = -(jnp.einsum("ui,ui->u", ds, red.gs) + dt * red.gt)   # [U]
        finite = (
            jnp.isfinite(wolfe)
            & jnp.all(jnp.isfinite(ds), axis=1)
            & jnp.isfinite(dt)
        )
        bad = ~finite | ~(wolfe > 0)
        ds = jnp.where(bad[:, None], -red.gs, ds)
        dt = jnp.where(bad, -red.gt, dt)
        wolfe = jnp.where(bad, jnp.sum(red.gs**2, axis=1) + red.gt**2, wolfe)
        directions = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
        gnorm = _gsum(ls.gnorm, axis_name) / u_total

        ccd_steps = decoupled_ccd_steps(
            consts, cfg, state.spline, directions, scene, axis_name,
            interact=interact, groups=groups,
        )
        step0 = jnp.where(
            state.piece_time + ccd_steps * dt <= 0,
            -0.95 * state.piece_time / dt,
            ccd_steps,
        )

        ttab = en.build_trial_tables(
            consts, cfg, state, planes, directions, dt
        )

        def per_robot_energy(step_vec):
            return en.trial_energy(consts, cfg, ttab, step_vec)

        e0 = per_robot_energy(jnp.zeros((u,), state.spline.dtype))
        # parallel Armijo ladder per robot: [S, U], two-stage
        ladder = admm.step_candidates(cfg, state.spline.dtype)[:, None] * step0[None, :]
        ok = admm.staged_ladder_ok(
            jax.vmap(
                lambda sv: e0 - _ARMIJO_C * wolfe * sv >= per_robot_energy(sv)
            ),
            ladder,
        )
        ok = jnp.concatenate([ok[:-1], jnp.ones((1, u), bool)], axis=0)
        steps = jnp.take_along_axis(
            ladder, admm._first_true(ok, axis=0)[None, :], axis=0
        )[0]
        spline = state.spline + steps[:, None, None] * directions
        piece_time = state.piece_time + steps * dt
        # diagnostic energy at the accepted steps (pre-slack — the point the
        # reference logs from inside its line search, Optimization3D_admm.h:555)
        e_acc = _gsum(per_robot_energy(steps), axis_name)

    state = state._replace(spline=spline, piece_time=piece_time)
    state, residual = jax.vmap(lambda st: admm.slack_update(consts, cfg, st))(state)
    diag = StepDiag(
        gnorm=gnorm,
        consensus_residual=jnp.sqrt(_gsum(residual**2, axis_name)),
        step=jnp.min(steps),
        ccd_step=jnp.min(ccd_steps),
        n_planes=_gsum(planes.mask.sum(), axis_name),
        energy=e_acc,
        infeasible=~jnp.isfinite(e_acc),
        plane_overflow=_gany(plane_overflow, axis_name),
    )
    if caches is not None:
        return state, diag, caches
    return state, diag


@functools.partial(
    jax.jit, static_argnames=("cfg", "coupled", "interact", "groups")
)
def multi_admm_step_jit(consts, cfg, state, scene, coupled, interact=True,
                        groups=1):
    return multi_admm_step(
        consts, cfg, state, scene, coupled, axis_name=None, interact=interact,
        groups=groups,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "coupled"))
def multi_admm_step_cached_jit(consts, cfg, state, scene, coupled, caches):
    return multi_admm_step_cached(
        consts, cfg, state, scene, coupled, caches, axis_name=None
    )


def init_multi_caches(cfg, consts, u: int, dtype=jnp.float32):
    """Empty persistent plane caches for a U-robot fleet (optimal_plane=1)."""
    from ..types import empty_pair_plane_cache, empty_plane_cache

    obs = jax.vmap(
        lambda _: empty_plane_cache(
            consts.piece_num, consts.res, cfg.max_planes, dtype
        )
    )(jnp.arange(u))
    ks = min(cfg.max_self_planes, max(u - 1, 1))
    pair = empty_pair_plane_cache(u, consts.piece_num, consts.res, ks, dtype)
    return obs, pair


def init_multi_state(ops, way_points_list, init_piece_time: float = 20.0, dtype=None):
    """Stack per-robot initial states (multi init_variable,
    Main/multiPathPlanning3D.cpp:342-467, uniform waypoint interpolation)."""
    from ..types import init_state

    states = [
        init_state(ops, wp, init_piece_time, dtype, layout="multi")
        for wp in way_points_list
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
