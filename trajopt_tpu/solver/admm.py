"""Single-robot consensus-ADMM iteration as one jitted function.

TPU-native re-architecture of `Optimization3D_admm` (Optimization3D_admm.h:29-67):
the reference's three sequential phases — separating-plane generation, global
spline Newton step with CCD-clamped Armijo line search, per-piece slack Newton
+ dual ascent — become pure array transformations composed into
``admm_step(state, scene) -> (state, diag)``, with every data-dependent loop a
``lax.while_loop`` on scalars and every per-(piece|segment|obstacle) loop a
vmap.  Multi-robot modes wrap this module's pieces (see `solver/multi.py`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TrajOptConfig
from ..types import Planes, Scene, SolverState, SplineConsts, StepDiag
from ..ops import broadphase as bp
from ..ops import ccd as ccd_ops
from ..ops import energies as en
from ..ops import geometry as geo
from ..ops import gradients as gr
from ..ops import kkt
from ..ops import smallchol as sc

_ARMIJO_C = 1e-4   # Optimization3D_admm.h:537
_SHRINK = 0.8      # Optimization3D_admm.h:542 / Step.h:97


# ---------------------------------------------------------------------------
# Phase 1: separating planes (Optimization3D_admm.h:69-197)
# ---------------------------------------------------------------------------


def _fit_obstacle_planes(cfg: TrajOptConfig, hull_f, pts_f, dtype):
    """Batched point-vs-hull GJK -> offset separating planes.

    ``hull_f`` [B,n,3], ``pts_f`` [B,3] -> (c [B,3], d [B], valid [B]),
    the plane-extraction math of Separate::opengjk (Separate.h:107-151)."""
    radius = cfg.offset + cfg.margin
    diff = hull_f - pts_f[:, None, :]                       # [B,n,3]
    hd = geo.batched_origin_dist(
        diff, cfg.gjk_iters, geo.use_pallas_gjk(cfg, dtype)
    )
    vn = jnp.maximum(hd.dist, 1e-12)
    c = (hd.v / vn[:, None]).astype(dtype)
    d = -jnp.einsum("nd,nd->n", c, pts_f.astype(dtype)) - cfg.offset
    # Near-contact feasibility clamp: the reference's exact GJK guarantees a
    # generated plane is strictly feasible at the incumbent (hull distance
    # along c == true distance > offset, Separate.h:107-151); under f32 the
    # witness direction can lose the last digits of that guarantee exactly
    # when hulls are a hair above offset.  Raising d (which only WEAKENS the
    # obstacle-side offset, never the hull-side constraint) keeps the plane
    # active so the barrier pushes the hull away — the reference's escape
    # semantics — instead of marking the incumbent infeasible and freezing
    # the line search.
    s_min = jnp.min(
        jnp.einsum("nmd,nd->nm", hull_f.astype(dtype), c), axis=1
    )
    d = jnp.maximum(d, 1e-3 * cfg.margin - s_min)
    valid = hd.dist <= radius
    return c, d, valid


def separate_planes_batch(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    splines: jnp.ndarray,      # [U,T,3]
    scene: Scene,
) -> tuple[Planes, jnp.ndarray]:
    """Fleet-batched obstacle-plane tables: one GJK dispatch for ALL robots.

    The per-robot path pays a full ``plane_gjk_budget`` GJK batch per robot
    under vmap; here the in-radius (segment, obstacle) candidates of the
    WHOLE fleet compact into one budget (in steady state a handful of pairs
    are in radius fleet-wide), cutting the separate phase's GJK work by ~U x.
    Returns (planes [U,P,R,K,...], overflow bool) — overflow means live
    candidates beyond the budget got no plane this iteration (telemetry per
    SURVEY §7.3; raise ``cfg.plane_gjk_budget``)."""
    hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)  # [U,P,R,n,3]
    radius = cfg.offset + cfg.margin
    u, p, r = hulls.shape[:3]
    n = hulls.shape[-2]
    k = cfg.max_planes
    nf = u * p * r * k
    budget = min(cfg.plane_gjk_budget, nf)
    dtype = splines.dtype

    if cfg.broadphase_coarse_k > 0 and cfg.broadphase_piece_budget > 0:
        cand, bp_overflow = bp.fleet_candidates(
            hulls, scene, radius, cfg.max_planes,
            coarse_k=cfg.broadphase_coarse_k,
            piece_budget=cfg.broadphase_piece_budget,
        )
    else:
        cand = jax.vmap(
            lambda h: bp.topk_candidates(
                h, scene, radius, cfg.max_planes,
                coarse_k=cfg.broadphase_coarse_k,
            )
        )(hulls)
        bp_overflow = jnp.zeros((), bool)
    flat_mask = cand.mask.reshape(-1)
    overflow = (jnp.sum(flat_mask) > budget) | bp_overflow

    def live_path(_):
        if budget < nf:
            d2f = jnp.where(flat_mask, cand.d2.reshape(-1), jnp.inf)
            _, sel = jax.lax.top_k(-d2f, budget)
            sel_live = flat_mask[sel]
            hull_f = hulls.reshape(u * p * r, n, 3)[sel // k]
            pts_f = scene.points[cand.idx.reshape(-1)[sel]]
        else:
            sel = None
            sel_live = flat_mask
            hull_f = jnp.broadcast_to(
                hulls[:, :, :, None], (u, p, r, k, n, 3)
            ).reshape(-1, n, 3)
            pts_f = scene.points[cand.idx.reshape(-1)]
        c, d, valid = _fit_obstacle_planes(cfg, hull_f, pts_f, dtype)
        if sel is not None:
            c_full = jnp.zeros((nf, 3), dtype).at[sel].set(c)
            d_full = jnp.zeros((nf,), dtype).at[sel].set(d.astype(dtype))
            ok_full = jnp.zeros((nf,), bool).at[sel].set(sel_live & valid)
        else:
            c_full, d_full, ok_full = c, d.astype(dtype), sel_live & valid
        return c_full, d_full, ok_full

    def dead_path(_):
        return (
            jnp.zeros((nf, 3), dtype),
            jnp.zeros((nf,), dtype),
            jnp.zeros((nf,), bool),
        )

    # no in-radius candidate fleet-wide (the early/far regime): skip the
    # whole GJK + plane-fit + scatter pipeline
    c_full, d_full, ok_full = jax.lax.cond(
        jnp.any(flat_mask), live_path, dead_path, operand=None
    )
    planes = Planes(
        c=c_full.reshape(u, p, r, k, 3),
        d=d_full.reshape(u, p, r, k),
        mask=ok_full.reshape(u, p, r, k),
    )
    return planes, overflow


def separate_planes(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    scene: Scene,
    cache=None,
):
    """Fixed-K separating-plane table for every subdivided segment.

    One flat-batched GJK solve over every (segment, candidate) pair —
    dispatched to the fused Pallas kernel on TPU.

    ``cache`` (a `types.PlaneCache`, used when ``cfg.optimal_plane``):
    candidates whose obstacle id was planed last iteration warm-start the
    barrier-optimal refinement from the CACHED normal — the reference's
    persistent-plane semantics (CCDUtils.h:64-70 consumed at
    Optimization3D_admm.h:126-193).  Returns (planes, overflow) without a
    cache, else (planes, overflow, new_cache)."""
    hull = en.seg_cps(consts, spline)                       # [P,R,n,3]
    radius = cfg.offset + cfg.margin
    cand = bp.topk_candidates(hull, scene, radius, cfg.max_planes,
                              coarse_k=cfg.broadphase_coarse_k)
    pts = scene.points[cand.idx]                            # [P,R,K,3]

    p, r, k, _ = pts.shape
    n = hull.shape[-2]
    nf = p * r * k
    # Compact to the in-radius candidates (default path): the GJK + plane
    # math runs only on the ``plane_gjk_budget`` nearest in-radius pairs
    # (typically a handful vs P*R*K slots), then scatters back.  Beyond-
    # budget pairs are dropped like beyond-K candidates — flagged via the
    # returned overflow bool.  The cached/refined optimal_plane path keeps
    # the full table (cache slots align with cand.idx).
    compact = cache is None and not cfg.optimal_plane and nf > cfg.plane_gjk_budget
    # overflow is measured against the budget actually applied: the
    # non-compact (cache/optimal_plane) path keeps every candidate slot, so
    # nothing can be dropped and the flag stays False there
    overflow = (
        jnp.sum(cand.mask) > cfg.plane_gjk_budget
        if compact
        else jnp.zeros((), bool)
    )
    if compact:
        budget = cfg.plane_gjk_budget
        d2f = jnp.where(cand.mask.reshape(-1), cand.d2.reshape(-1), jnp.inf)
        _, sel = jax.lax.top_k(-d2f, budget)
        sel_live = cand.mask.reshape(-1)[sel]
        hull_f = hull.reshape(p * r, n, 3)[sel // k]
        pts_f = pts.reshape(-1, 3)[sel]
    else:
        budget = nf
        sel = None
        sel_live = cand.mask.reshape(-1)
        hull_f = jnp.broadcast_to(hull[:, :, None], (p, r, k, n, 3)).reshape(-1, n, 3)
        pts_f = pts.reshape(-1, 3)
    c, d, valid = _fit_obstacle_planes(cfg, hull_f, pts_f, spline.dtype)

    if cfg.optimal_plane:
        if cache is not None:
            # persistent-plane warm start: candidates whose obstacle id has a
            # cached plane refine from the CACHED normal (refinement
            # accumulates across iterations, like the reference's
            # seperate_c/seperate_d tables)
            match = cand.idx[..., :, None] == cache.obs_id[..., None, :]  # [P,R,K,K]
            hit = jnp.any(match, axis=-1)
            slot = jnp.argmax(match, axis=-1)                             # [P,R,K]
            warm = jnp.take_along_axis(cache.c, slot[..., None], axis=2)  # [P,R,K,3]
            c = jnp.where(hit.reshape(-1)[:, None], warm.reshape(-1, 3), c)
        # barrier-optimal refinement (Optimal_plane::optimal_cd)
        c2, d2 = jax.vmap(
            lambda h, q, cc: geo.refine_plane(h, q, cc, cfg.offset, cfg.margin)
        )(hull_f, pts_f, c)
        good = jnp.all(jnp.isfinite(c2), axis=-1) & jnp.isfinite(d2)
        c = jnp.where(good[:, None], c2, c)
        d = jnp.where(good, d2, d)

    if compact:
        # scatter the compacted results back into the full candidate table
        c_full = jnp.zeros((nf, 3), spline.dtype).at[sel].set(c)
        d_full = jnp.zeros((nf,), spline.dtype).at[sel].set(
            d.astype(spline.dtype)
        )
        ok_full = jnp.zeros((nf,), bool).at[sel].set(sel_live & valid)
        planes = Planes(
            c=c_full.reshape(p, r, k, 3),
            d=d_full.reshape(p, r, k),
            mask=ok_full.reshape(p, r, k),
        )
    else:
        mask = cand.mask & valid.reshape(p, r, k)
        planes = Planes(
            c=c.reshape(p, r, k, 3),
            d=d.reshape(p, r, k).astype(spline.dtype),
            mask=mask,
        )
    if cache is None:
        return planes, overflow
    from ..types import PlaneCache

    new_cache = PlaneCache(
        obs_id=jnp.where(mask, cand.idx, -1).astype(jnp.int32),
        c=planes.c,
    )
    return planes, overflow, new_cache


# ---------------------------------------------------------------------------
# Phase 2: spline Newton + CCD clamp + Armijo (Optimization3D_admm.h:199-557)
# ---------------------------------------------------------------------------


class SplineDirection(NamedTuple):
    direction: jnp.ndarray   # [T,3]
    t_direction: jnp.ndarray # []
    wolfe: jnp.ndarray       # []
    gnorm: jnp.ndarray       # []


def spline_direction(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    planes: Planes,
) -> SplineDirection:
    """Reduced Newton direction (Optimization3D_admm.h:400-503)."""
    g, h = gr.piece_grads_and_hessians(
        consts, cfg, state.spline, state.piece_time, planes,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
    )
    red = kkt.assemble_reduced(consts, g, h)
    ls = kkt.local_solve(red)
    ds, dt = kkt.finish_direction(ls, ls.schur_s, ls.schur_r)
    # one iterative-refinement round + descent guard (see kkt.correct_direction)
    rs, rt, ainv_rs = kkt.correct_direction(red, ls, ds, dt)
    s_safe = jnp.maximum(ls.schur_s, 1e-5 * jnp.maximum(jnp.abs(ls.schur_s), 1.0))
    cdt = -(rt - red.b @ ainv_rs) / s_safe
    ds = ds + (-ainv_rs - cdt * ls.ainv_b)
    dt = dt + cdt
    wolfe = -(ds @ red.gs + dt * red.gt)
    finite = jnp.isfinite(wolfe) & jnp.all(jnp.isfinite(ds)) & jnp.isfinite(dt)
    bad = ~finite | ~(wolfe > 0)
    ds = jnp.where(bad, -red.gs, ds)
    dt = jnp.where(bad, -red.gt, dt)
    wolfe = jnp.where(bad, jnp.sum(red.gs**2) + red.gt**2, wolfe)
    return SplineDirection(
        direction=kkt.spread_direction(consts, ds),
        t_direction=dt,
        wolfe=wolfe,
        gnorm=ls.gnorm,
    )


def step_candidates(cfg: TrajOptConfig, dtype, start=1.0) -> jnp.ndarray:
    """The geometric step ladder 0.8^k, k = 0..max_line_search-1.

    All backtracking searches test every rung in ONE batched evaluation and
    pick the best admissible rung — semantically identical to the reference's
    sequential ``step *= 0.8`` loops (admissibility is monotone down the
    ladder) but without a serial while_loop on TPU."""
    k = jnp.arange(cfg.max_line_search, dtype=dtype)
    return start * _SHRINK**k


def _first_true(ok: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Index of the first True along axis (== len if none)."""
    return jnp.argmax(ok, axis=axis) + jnp.where(jnp.any(ok, axis=axis), 0, ok.shape[axis])


def staged_ladder_ok(eval_ok, ladder: jnp.ndarray, stage: int = 8) -> jnp.ndarray:
    """Geometric staged ladder evaluation: test the first ``stage`` rungs,
    and only if some column still lacks an accept recurse on the tail with a
    doubled stage (nested `lax.cond`s — stages 8, 16, 32, ...).

    ``eval_ok(sub_ladder [M, ...]) -> bool [M, cols...]``.  Backtracking
    searches accept within the first few rungs almost always, so this cuts
    ~85% of the ladder energy evaluations from the steady-state step; the
    geometric stages bound the worst case at ~2x the accepted rung's depth
    (round 4 paid a single 56-rung tail batch — a 165 MB barrier-energy
    evaluation — whenever stage 1 missed).  The predicate is derived from
    (globally reduced) energies, so under shard_map every shard takes the
    same branch."""
    s = ladder.shape[0]
    n1 = min(stage, s)
    ok1 = eval_ok(ladder[:n1])
    if n1 == s:
        return ok1

    def rest(_):
        return staged_ladder_ok(eval_ok, ladder[n1:], stage=2 * stage)

    def skip(_):
        return jnp.zeros((s - n1,) + ok1.shape[1:], bool)

    done = jnp.all(jnp.any(ok1, axis=0))
    ok2 = jax.lax.cond(done, skip, rest, operand=None)
    return jnp.concatenate([ok1, ok2], axis=0)


def staged_ladder_vals(eval_fn, ladder: jnp.ndarray, stage: int = 8):
    """`staged_ladder_ok` threading a value alongside the predicate:
    ``eval_fn(sub [M]) -> (ok [M, ...], vals [M, ...])``; skipped stages
    return (False, +inf) so the chosen rung's value is always live."""
    s = ladder.shape[0]
    n1 = min(stage, s)
    ok1, v1 = eval_fn(ladder[:n1])
    if n1 == s:
        return ok1, v1

    def rest(_):
        return staged_ladder_vals(eval_fn, ladder[n1:], stage=2 * stage)

    def skip(_):
        shp = (s - n1,) + ok1.shape[1:]
        return jnp.zeros(shp, bool), jnp.full(shp, jnp.inf, v1.dtype)

    done = jnp.all(jnp.any(ok1, axis=0))
    ok2, v2 = jax.lax.cond(done, skip, rest, operand=None)
    return (
        jnp.concatenate([ok1, ok2], axis=0),
        jnp.concatenate([v1, v2], axis=0),
    )


def rung_floor(cfg: TrajOptConfig, s: jnp.ndarray) -> jnp.ndarray:
    """Largest ladder rung 0.8^k (k < max_line_search) strictly within the
    certified limit ``s`` (0 if none) — maps the analytic CCD limit back onto
    the reference's step-size lattice (Step.h:97)."""
    dtype = s.dtype
    k = jnp.ceil(jnp.log(jnp.maximum(s, 1e-30)) / jnp.log(jnp.asarray(_SHRINK, dtype)))
    k = jnp.maximum(k, 0.0)
    step = jnp.asarray(_SHRINK, dtype) ** k
    # strict inequality: the analytic limit is the supremum with clearance
    # == offset, so a rung landing exactly ON it must also shrink (plus the
    # float-roundoff guard this comparison already provided)
    step = jnp.where(step >= s, step * _SHRINK, step)
    return jnp.where(
        (s <= 0) | (k >= cfg.max_line_search), jnp.zeros((), dtype), step
    )


def ladder_bisect(cfg: TrajOptConfig, admissible, dtype) -> jnp.ndarray:
    """Smallest-k search on the 0.8^k step ladder by bisection.

    ``admissible(step) -> bool`` must be monotone down the ladder (true for a
    step implies true for every smaller one) — exactly the CCD property.
    ceil(log2(S)) sequential evaluations instead of the reference's up-to-S
    shrink loop, each evaluation one batched collision pass.
    """
    s_count = cfg.max_line_search

    def body(_, carry):
        lo, hi = carry  # lo: largest k known bad (-1 ok), hi: smallest k known good
        mid = (lo + hi) // 2
        ok = admissible(_SHRINK ** mid.astype(dtype))
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    n_iter = max(1, (s_count).bit_length())
    lo0 = jnp.asarray(-1)
    hi0 = jnp.asarray(s_count)  # sentinel: nothing admissible
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo0, hi0))
    k = jnp.minimum(hi, s_count - 1)
    # soundness: if NO rung certified (hi == s_count), freeze (step 0) rather
    # than return the uncertified floor rung — step 0 is always safe because
    # the incumbent iterate is feasible by induction.
    return jnp.where(hi >= s_count, 0.0, _SHRINK ** k.astype(dtype)).astype(dtype)


def ccd_step(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    direction: jnp.ndarray,
    scene: Scene,
) -> jnp.ndarray:
    """Largest step of the form 0.8^k whose swept control hulls provably keep
    clearance > offset from all obstacle points (Step::position_step,
    Step.h:21-110).  Sound for EVERY obstacle: the three-level analytic
    k-DOP max-step + one-shot GJK refinement
    (ops/ccd.py::obstacle_max_step_direct), floored to the 0.8^k rung
    lattice — one certification pass instead of the reference's shrink loop."""
    hull = en.seg_cps(consts, spline)[None]                 # [1,P,R,n,3]
    dhull = en.seg_cps(consts, direction)[None]
    pallas = geo.use_pallas_gjk(cfg, spline.dtype)
    s = ccd_ops.obstacle_max_step_direct(
        hull, dhull, scene.points, scene.mask, cfg.offset, cfg.gjk_iters,
        pallas, s1_slots=max(8, cfg.max_ccd_candidates),
        n_slots=cfg.ccd_gjk_slots, seg_budget=cfg.ccd_seg_budget,
    )[0]
    return rung_floor(cfg, s)


def armijo_spline(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    planes: Planes,
    sd: SplineDirection,
    step0: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backtracking line search on the spline AL energy
    (Optimization3D_admm.h:505-557).  Returns (spline', piece_time', step)."""
    # time-positivity clamp (Optimization3D_admm.h:521-524)
    t0, dt = state.piece_time, sd.t_direction
    step0 = jnp.where(t0 + step0 * dt <= 0, -0.95 * t0 / dt, step0)

    # affine line-search tables (see en.build_trial_tables): per-rung
    # energies become masked elementwise passes — fleet-of-one layout
    state_u = jax.tree.map(lambda x: x[None], state)
    planes_u = jax.tree.map(lambda x: x[None], planes)
    ttab = en.build_trial_tables(
        consts, cfg, state_u, planes_u, sd.direction[None], dt[None]
    )

    def trial_energy(step):
        return en.trial_energy(
            consts, cfg, ttab, jnp.asarray(step, t0.dtype)[None]
        )[0]

    e0 = trial_energy(jnp.zeros((), t0.dtype))

    def accepted(step):
        return e0 - _ARMIJO_C * sd.wolfe * step >= trial_energy(step)

    steps = step_candidates(cfg, state.spline.dtype, start=1.0) * step0  # [S]

    def ladder(_):
        ok = staged_ladder_ok(jax.vmap(accepted), steps)
        ok = jnp.concatenate([ok[:-1], jnp.ones(1, bool)])  # floor fallback
        return steps[_first_true(ok)]

    step = jax.lax.cond(accepted(step0), lambda _: step0, ladder, operand=None)
    return state.spline + step * sd.direction, t0 + step * dt, step


# ---------------------------------------------------------------------------
# Phase 3: slack + dual update (Optimization3D_admm.h:231-398)
# ---------------------------------------------------------------------------


def _slack_freeze_mask(piece_num: int, dtype) -> jnp.ndarray:
    """[P,19] 1.0 for free local coords; first piece freezes CP rows 0-1,
    last freezes rows n-1,n (Optimization3D_admm.h:263-307)."""
    m = jnp.ones((piece_num, gr.N_LOC))
    m = m.at[0, 0:6].set(0.0)
    m = m.at[piece_num - 1, 12:18].set(0.0)
    return m.astype(dtype)


def slack_update(
    consts: SplineConsts, cfg: TrajOptConfig, state: SolverState
) -> tuple[SolverState, jnp.ndarray]:
    """Per-piece slack Newton + Armijo + dual ascent, batched over pieces.

    Returns (new_state, consensus_residual) where the residual is
    sqrt(sum ||C x - z||^2 + (T - t)^2)  (Optimization3D_admm.h:393-397).
    """
    p_num = consts.piece_num
    c_spline = jnp.einsum(
        "pij,pjd->pid", consts.convert, en.piece_cps(consts, state.spline)
    )
    xs = jnp.concatenate(
        [state.p_slack.reshape(p_num, -1), state.t_slack[:, None]], axis=1
    )

    def local(x, cs, pl, tl):
        return gr.local_slack_energy(
            x, cs, state.piece_time, pl, tl, consts.m_dyn, cfg
        )

    def one(x, cs, pl, tl):
        return gr.grad_and_hess(local, x, cs, pl, tl)

    g, h = jax.vmap(one)(xs, c_spline, state.p_lambda, state.t_lambda)

    # Freeze pinned end coords by masking the system: zero their gradient and
    # replace their Hessian rows/cols with identity, so the reduced solve of
    # the reference (Optimization3D_admm.h:263-307) becomes shape-uniform.
    m = _slack_freeze_mask(p_num, xs.dtype)
    g = g * m
    h = jnp.where(
        (m[:, :, None] * m[:, None, :]) > 0,
        h,
        jnp.eye(gr.N_LOC, dtype=h.dtype)[None],
    )
    if cfg.psd_method == "gmw":
        # fused repair + factor + solve (ops/pallas_chol.py / smallchol.py)
        from ..ops import pallas_chol as pc

        if pc.use_pallas_linalg(h.dtype):
            chol_l, _ = pc.mod_chol(h)
            d = -pc.chol_solve(chol_l, g)
        else:
            chol_l, _ = sc.mod_cholesky(h)
            d = -sc.cho_solve(chol_l, g)
    else:
        h = gr.psd_repair(h) if cfg.psd_method == "eigh" else gr.psd_repair_ladder(h)
        # unrolled batched solve (ops/smallchol.py): XLA's cho_factor costs
        # ~1 ms at [P,19,19] on TPU
        d = -sc.solve_pd(h, g)
    d = d * m
    wolfe = -jnp.sum(d * g, axis=1)                        # [P]
    # NaN-proof steepest-descent fallback per piece (see spline_direction)
    bad = ~(jnp.all(jnp.isfinite(d), axis=1) & (wolfe > 0))
    d = jnp.where(bad[:, None], -g, d)
    wolfe = jnp.where(bad, jnp.sum(g * g, axis=1), wolfe)

    d_cp = d[:, : 3 * gr.N_CP].reshape(p_num, gr.N_CP, 3)
    d_t = d[:, 3 * gr.N_CP]

    step = jnp.ones((p_num,), dtype=xs.dtype)
    step = jnp.where(
        state.t_slack + step * d_t <= 0, -0.95 * state.t_slack / d_t, step
    )

    e0 = en.slack_energy(
        consts, cfg, c_spline, state.piece_time,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
    )

    def trial(step_vec):
        ev = en.slack_energy(
            consts, cfg, c_spline, state.piece_time,
            state.p_slack + step_vec[:, None, None] * d_cp,
            state.t_slack + step_vec * d_t,
            state.p_lambda, state.t_lambda,
        )
        return jnp.where(jnp.isnan(ev), jnp.inf, ev)

    # parallel Armijo ladder over all pieces at once: [S, P], two-stage
    ladder = step_candidates(cfg, xs.dtype)[:, None] * step[None, :]
    ok = staged_ladder_ok(
        jax.vmap(lambda sv: e0 - _ARMIJO_C * wolfe * sv >= trial(sv)), ladder
    )
    ok = jnp.concatenate([ok[:-1], jnp.ones((1, p_num), bool)], axis=0)
    step = jnp.take_along_axis(ladder, _first_true(ok, axis=0)[None, :], axis=0)[0]

    p_slack = state.p_slack + step[:, None, None] * d_cp
    t_slack = state.t_slack + step * d_t
    p_lambda = state.p_lambda + cfg.mu * (c_spline - p_slack)
    t_lambda = state.t_lambda + cfg.mu * (state.piece_time - t_slack)
    residual = jnp.sqrt(
        jnp.sum((c_spline - p_slack) ** 2)
        + jnp.sum((state.piece_time - t_slack) ** 2)
    )
    new_state = state._replace(
        p_slack=p_slack, t_slack=t_slack, p_lambda=p_lambda, t_lambda=t_lambda
    )
    return new_state, residual


# ---------------------------------------------------------------------------
# Full iteration
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def admm_step(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    scene: Scene,
) -> tuple[SolverState, StepDiag]:
    """One full ADMM iteration (Optimization3D_admm::optimization)."""
    with jax.default_matmul_precision("highest"):
        return _admm_step_impl(consts, cfg, state, scene)


@functools.partial(jax.jit, static_argnames=("cfg",))
def admm_step_cached(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    scene: Scene,
    cache,
) -> tuple[SolverState, StepDiag, "PlaneCache"]:
    """`admm_step` threading the persistent plane cache (optimal_plane=1
    semantics, CCDUtils.h:64-70)."""
    with jax.default_matmul_precision("highest"):
        state, diag, cache = _admm_step_impl(consts, cfg, state, scene, cache)
    return state, diag, cache


def _admm_step_impl(consts, cfg, state, scene, cache=None):
    # Full-f32 matmul passes are REQUIRED on TPU: the KKT blocks reach
    # condition ~1e6 and bf16-pass Cholesky produces NaN pivots.
    if cache is not None:
        planes, overflow, cache = separate_planes(
            consts, cfg, state.spline, scene, cache
        )
    else:
        planes, overflow = separate_planes(consts, cfg, state.spline, scene)
    sd = spline_direction(consts, cfg, state, planes)
    step_ccd = ccd_step(consts, cfg, state.spline, sd.direction, scene)
    spline, piece_time, step = armijo_spline(consts, cfg, state, planes, sd, step_ccd)
    state = state._replace(spline=spline, piece_time=piece_time)
    state, residual = slack_update(consts, cfg, state)
    ev = en.spline_energy(consts, cfg, state, planes)
    diag = StepDiag(
        gnorm=sd.gnorm,
        consensus_residual=residual,
        step=step,
        ccd_step=step_ccd,
        n_planes=planes.mask.sum(),
        energy=ev.value,
        infeasible=ev.infeasible,
        plane_overflow=overflow,
    )
    if cache is not None:
        return state, diag, cache
    return state, diag
