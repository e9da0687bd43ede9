"""Sound conservative CCD: exhaustive k-DOP certification + selective GJK.

Replaces the earlier fixed-K-candidate CCD, which was *unsound*: when more
than K obstacle points fell within reach of a segment's swept hull, the
overflow points were silently dropped from certification and an unsafe step
could be accepted (observed as a feasibility loss -> permanent ``ccd_step=0``
livelock on 32+ robot scenes).

Architecture (mirrors the reference's KDOP-then-GJK narrow phase,
CCD.h:354-473 then :17-225, but with *every* pair certified):

* Every (segment, obstacle) / (segment, robot-pair) gets a certified k-DOP
  separation lower bound at each trial step — two tiny matmuls (hull
  projections precomputed once per call) plus a fused broadcast-reduce.  A
  pair whose k-DOP gap exceeds ``offset`` is provably clear; nothing is ever
  excluded from this test, so certification is complete.
* Pairs the k-DOP cannot clear get the exact (certified-lower-bound) GJK
  test.  The GJK slots are selected PER TRIAL STEP: the uncleared pairs are
  exactly the smallest-k-DOP-gap pairs at that step, so a top-S selection
  over the gaps covers every uncleared pair whenever their count is <= S.
  Only if MORE than S pairs per segment fail k-DOP at a trial is the step
  declared inadmissible without a GJK chance — strictly conservative, never
  unsafe, and (unlike the earlier build-time slot tables) never an absorbing
  state: a near-contact pair always gets its GJK test at small steps.
  [Historical root cause of the 64-robot livelock: slots chosen once at
  build time from a full-sweep danger ranking missed a static near-contact
  point whose k-DOP gap (0.078) was below offset while its exact distance
  (0.112) was above — with no slot, no step could ever certify.]
* Admissibility is monotone in the step (the swept hull only grows), so the
  0.8^k ladder can be bisected (solver/admm.py::ladder_bisect); the rung the
  bisection returns was itself explicitly certified, so soundness does not
  depend on the monotonicity.

Fast paths (performance, not soundness):

* A ROBOT-level k-DOP interval (union of the robot's swept segment intervals
  at the full sweep) certifies most of the cloud per robot in one [B,N] pass
  at build time; only a fixed per-robot candidate table (`_PREFILTER_M`
  smallest robot-level gaps) enters the per-trial segment tests.  If more
  points than the table holds are in robot-level danger, a `lax.cond` falls
  back to a full-cloud pass per trial — still sound, just slower (typical
  only during early large sweeps).
* The GJK batches are `lax.cond`-gated on actual k-DOP danger; steady-state
  CCD calls skip GJK entirely.

All shapes are static; everything vmaps over robots and runs inside jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import geometry as geo
from . import pallas_topk as ptk


def _axes(dtype) -> jnp.ndarray:
    return jnp.asarray(geo.kdop_axes(), dtype=dtype)   # [D,3] unit rows


def _interval(proj: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, hi) over the vertex axis of a projection [..., n, D]."""
    return proj.min(axis=-2), proj.max(axis=-2)


def _swept_interval(hp: jnp.ndarray, dp: jnp.ndarray, step) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k-DOP interval of the swept hull {P} u {P + step*D}, exact in step.

    [..., n, D] projections -> [..., D] bounds; monotone: the interval only
    widens as ``step`` grows."""
    lo0, hi0 = _interval(hp)
    lo1, hi1 = _interval(hp + step * dp)
    return jnp.minimum(lo0, lo1), jnp.maximum(hi0, hi1)


def _gap_point(lo, hi, pts_proj):
    """k-DOP separation of points [...,N,D] vs intervals [...,D] -> [...,N].

    max over axes of the one-sided gaps; > offset certifies clearance (each
    axis is unit length).  Fused broadcast-reduce — the [...,N,D] intermediate
    never materializes."""
    g = jnp.maximum(
        pts_proj - hi[..., None, :], lo[..., None, :] - pts_proj
    )                                                   # [...,N,D]
    return jnp.max(g, axis=-1)


def _gap_interval(lo_a, hi_a, lo_b, hi_b):
    """k-DOP separation of two interval sets (broadcasted), reduced over D."""
    return jnp.max(jnp.maximum(lo_a - hi_b, lo_b - hi_a), axis=-1)


# ---------------------------------------------------------------------------
# Obstacle CCD (segments vs point cloud)
# ---------------------------------------------------------------------------


_PREFILTER_M = 128  # per-robot candidate budget of the robot-level prefilter


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObstacleCCD:
    hull: jnp.ndarray      # [B,P,R,n,3]
    dhull: jnp.ndarray     # [B,P,R,n,3]
    hp: jnp.ndarray        # [B,P,R,n,D] hull projections
    dp: jnp.ndarray        # [B,P,R,n,D] direction projections
    pts: jnp.ndarray       # [N,3]  full cloud (overflow fallback only)
    pts_proj: jnp.ndarray  # [N,D]
    pmask: jnp.ndarray     # [N] bool
    cand_pts: jnp.ndarray  # [B,Mc,3] candidate points
    cand_proj: jnp.ndarray # [B,Mc,D] candidate projections (per-trial k-DOP)
    cand_pm: jnp.ndarray   # [B,Mc] live-point mask of the candidates
    overflow: jnp.ndarray  # [] bool: prefilter missed a dangerous point
    n_slots: int = dataclasses.field(metadata=dict(static=True))
    offset: float = dataclasses.field(metadata=dict(static=True))


def build_obstacle_ccd(hull, dhull, points, pmask, k_gjk: int, offset: float) -> ObstacleCCD:
    """Precompute projections and the candidate table.

    ``hull``/``dhull``: [B,P,R,n,3] (B = robot batch, 1 for single).

    Two-level candidate structure (soundness preserved at both levels):

    1. ROBOT level: one k-DOP interval per robot (union of its swept segment
       intervals at full sweep) gives a gap lower bound per (robot, point) —
       [B,N] work instead of [B,P,R,N].  Points with robot-level gap > offset
       are provably clear of every segment at every step; the rest rank into
       a fixed per-robot candidate table of ``_PREFILTER_M`` slots.  If more
       than Mc points are in danger the overflow flag forces the trial-time
       full pass (exact, slower) — never an unsound accept.
    2. SEGMENT level (per trial, in `obstacle_bad`): every candidate is
       k-DOP-certified at the trial step; the uncleared ones get GJK via a
       per-trial top-S selection.
    """
    ax = _axes(hull.dtype)
    hp = hull @ ax.T                                     # [B,P,R,n,D]
    dp = dhull @ ax.T
    pts_proj = points @ ax.T                             # [N,D]
    n_pts = points.shape[0]
    b = hull.shape[0]

    lo1, hi1 = _swept_interval(hp, dp, jnp.asarray(1.0, hull.dtype))
    big = jnp.asarray(jnp.inf, hull.dtype)

    mc = min(_PREFILTER_M, n_pts)
    if mc < n_pts:
        # --- robot-level prefilter ---------------------------------------
        rlo = jnp.min(lo1, axis=(1, 2))                  # [B,D]
        rhi = jnp.max(hi1, axis=(1, 2))
        rgap = _gap_point(rlo, rhi, pts_proj)            # [B,N]
        rgap = jnp.where(pmask, rgap, big)
        # Soundness via the coverage check below: the overflow flag fires
        # unless every robot-level danger point is in the selected table
        # (exact count over the cloud vs count among the selected), so any
        # selection shortfall can only cost speed (full pass), never an
        # unsound accept.
        _, cand = jax.lax.top_k(-rgap, mc)               # [B,Mc]
        cand_pts = points[cand]                          # [B,Mc,3]
        cand_proj = pts_proj[cand]                       # [B,Mc,D]
        cand_pm = pmask[cand]
        n_danger = jnp.sum((rgap <= offset) & pmask, axis=-1)        # [B]
        sel_gap = jnp.take_along_axis(rgap, cand, axis=-1)
        n_sel = jnp.sum((sel_gap <= offset) & cand_pm, axis=-1)
        pre_overflow = jnp.any(n_danger != n_sel)
    else:
        cand_pts = jnp.broadcast_to(points, (b,) + points.shape)
        cand_proj = jnp.broadcast_to(pts_proj, (b,) + pts_proj.shape)
        cand_pm = jnp.broadcast_to(pmask, (b, n_pts))
        pre_overflow = jnp.zeros((), bool)

    return ObstacleCCD(
        hull=hull, dhull=dhull, hp=hp, dp=dp,
        pts=points, pts_proj=pts_proj, pmask=pmask,
        cand_pts=cand_pts, cand_proj=cand_proj, cand_pm=cand_pm,
        overflow=pre_overflow, n_slots=max(1, 2 * k_gjk), offset=offset,
    )


def _certify_points(tabs, s5, g, pm, pts_lookup, offset, gjk_iters, pallas):
    """Generic one-trial certification of a point set against swept hulls.

    ``g``: [B,P,R,M] k-DOP gaps at this trial; ``pm``: live mask broadcastable
    to g; ``pts_lookup(idx)``: [B,P,R,S] indices (into the M axis) ->
    [B,P,R,S,3] points.  Returns [B] bad.

    A pair is certified by k-DOP gap > offset, else by GJK on one of the S
    per-segment slots (chosen as the S smallest gaps among the uncleared —
    which IS the set of uncleared pairs whenever their count <= S).  More
    than S uncleared pairs in one segment -> conservative inadmissible.
    """
    b = g.shape[0]
    n = tabs.hull.shape[-2]
    s_slots = min(tabs.n_slots, g.shape[-1])
    unc = pm & ~(g > offset)                             # [B,P,R,M]
    over = jnp.any(jnp.sum(unc, axis=-1) > s_slots, axis=(-1, -2))   # [B]
    gm = jnp.where(unc, g, jnp.inf)
    _, idx = ptk.smallest_k(gm, s_slots)                 # [B,P,R,S]
    sel_unc = jnp.take_along_axis(unc, idx, axis=-1)

    def run_gjk(_):
        sel_pts = pts_lookup(idx)                        # [B,P,R,S,3]
        swept = jnp.concatenate(
            [tabs.hull, tabs.hull + s5 * tabs.dhull], axis=-2
        )                                                # [B,P,R,2n,3]
        diff = (
            swept[:, :, :, None] - sel_pts[..., None, :]
        ).reshape(-1, 2 * n, 3)
        lb = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
        ok = (lb > offset).reshape(idx.shape)
        return jnp.any(sel_unc & ~ok, axis=(-1, -2, -3))

    gjk_bad = jax.lax.cond(
        jnp.any(sel_unc), run_gjk, lambda _: jnp.zeros((b,), bool), operand=None
    )
    return over | gjk_bad


def obstacle_bad(tabs: ObstacleCCD, steps, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[B] bool: is any (segment, obstacle) pair of robot b uncertified at
    that robot's step?  ``steps``: scalar or [B]."""
    b = tabs.hull.shape[0]
    s = jnp.broadcast_to(jnp.asarray(steps, tabs.hull.dtype), (b,))
    s5 = s[:, None, None, None, None]                    # [B,1,1,1,1]
    lo, hi = _swept_interval(tabs.hp, tabs.dp, s5)       # [B,P,R,D]

    def subset_pass(_):
        g = _gap_point(lo, hi, tabs.cand_proj[:, None, None])   # [B,P,R,Mc]
        return _certify_points(
            tabs, s5, g, tabs.cand_pm[:, None, None],
            lambda idx: jax.vmap(lambda a, i: a[i])(tabs.cand_pts, idx),
            offset, gjk_iters, pallas,
        )

    def full_pass(_):
        g = _gap_point(lo, hi, tabs.pts_proj)            # [B,P,R,N]
        return _certify_points(
            tabs, s5, g, tabs.pmask[None, None, None],
            lambda idx: tabs.pts[idx],
            offset, gjk_iters, pallas,
        )

    return jax.lax.cond(tabs.overflow, full_pass, subset_pass, operand=None)


# ---------------------------------------------------------------------------
# Robot-pair CCD (equal-time segment hulls vs each other)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairCCD:
    my_hull: jnp.ndarray    # [U,P,R,n,3]
    my_dhull: jnp.ndarray
    my_hp: jnp.ndarray      # [U,P,R,n,D]
    my_dp: jnp.ndarray
    all_hulls: jnp.ndarray  # [Ut,P,R,n,3]
    all_dhulls: jnp.ndarray
    all_hp: jnp.ndarray     # [Ut,P,R,n,D]
    all_dp: jnp.ndarray
    not_self: jnp.ndarray   # [U,Ut] bool
    n_slots: int = dataclasses.field(metadata=dict(static=True))


def build_pair_ccd(
    my_hulls, my_dhulls, all_hulls, all_dhulls, gids, k_gjk: int,
    groups: int = 1,
) -> PairCCD:
    """``my_*``: [U,P,R,n,3] local robots; ``all_*``: [Ut,...] gathered fleet;
    ``gids``: [U] global ids of the local robots (for self-pair exclusion)."""
    ax = _axes(my_hulls.dtype)
    my_hp, my_dp = my_hulls @ ax.T, my_dhulls @ ax.T
    all_hp, all_dp = all_hulls @ ax.T, all_dhulls @ ax.T
    ut = all_hulls.shape[0]
    other = jnp.arange(ut, dtype=gids.dtype)[None, :]
    not_self = gids[:, None] != other
    if groups > 1:
        upg = ut // groups
        not_self = not_self & ((gids[:, None] // upg) == (other // upg))
    return PairCCD(
        my_hull=my_hulls, my_dhull=my_dhulls,
        my_hp=my_hp, my_dp=my_dp,
        all_hulls=all_hulls, all_dhulls=all_dhulls,
        all_hp=all_hp, all_dp=all_dp,
        not_self=not_self,
        n_slots=max(1, min(2 * k_gjk, ut)),
    )


def pair_bad(tabs: PairCCD, my_steps, all_steps, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[U] bool: any uncertified pair involving each local robot, with
    per-robot step intervals [0, s_i] x [0, s_j] (Step::self_step /
    couple_self_step semantics).

    Per-trial GJK slot selection, same scheme as `obstacle_bad`: the S
    smallest-gap partners per segment get GJK; > S uncleared partners in one
    segment -> conservative inadmissible (never an absorbing state)."""
    u, p, r, n, _ = tabs.my_hull.shape
    sm = my_steps[:, None, None, None, None]
    sa = all_steps[:, None, None, None, None]

    lo_a, hi_a = _swept_interval(tabs.my_hp, tabs.my_dp, sm)
    lo_b, hi_b = _swept_interval(tabs.all_hp, tabs.all_dp, sa)
    gap = _gap_interval(
        lo_a[:, None], hi_a[:, None], lo_b[None], hi_b[None]
    )                                                       # [U,Ut,P,R]
    m = jnp.moveaxis(gap, 1, -1)                            # [U,P,R,Ut]
    unc = tabs.not_self[:, None, None, :] & ~(m > offset)
    s_slots = tabs.n_slots
    over = jnp.any(jnp.sum(unc, axis=-1) > s_slots, axis=(-1, -2))   # [U]
    gm = jnp.where(unc, m, jnp.inf)
    _, idx = ptk.smallest_k(gm, s_slots)                    # [U,P,R,S]
    sel_unc = jnp.take_along_axis(unc, idx, axis=-1)

    def run_gjk(_):
        # one XLA gather via advanced indexing — broadcasting to
        # [U,P,R,Ut,n,3] for take_along_axis materializes ~100 MB at U=64
        p_idx = jnp.arange(p)[None, :, None, None]
        r_idx = jnp.arange(r)[None, None, :, None]
        sel_hulls = tabs.all_hulls[idx, p_idx, r_idx]       # [U,P,R,S,n,3]
        sel_dhulls = tabs.all_dhulls[idx, p_idx, r_idx]
        sel_steps = all_steps[idx]                          # [U,P,R,S]
        swept_a = jnp.concatenate(
            [tabs.my_hull, tabs.my_hull + sm * tabs.my_dhull], axis=-2
        )                                                   # [U,P,R,2n,3]
        so = sel_steps[..., None, None]
        swept_b = jnp.concatenate(
            [sel_hulls, sel_hulls + so * sel_dhulls], axis=-2
        )                                                   # [U,P,R,S,2n,3]
        diff = (
            swept_a[:, :, :, None, :, None, :] - swept_b[:, :, :, :, None, :, :]
        ).reshape(-1, 4 * n * n, 3)
        lb = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
        ok = (lb > offset).reshape(idx.shape)
        return jnp.any(sel_unc & ~ok, axis=(1, 2, 3))       # [U]

    gjk_bad = jax.lax.cond(
        jnp.any(sel_unc), run_gjk, lambda _: jnp.zeros((u,), bool), operand=None
    )
    return over | gjk_bad


# ---------------------------------------------------------------------------
# Analytic max-step CCD (closed-form k-DOP limit + one-shot GJK refinement)
# ---------------------------------------------------------------------------
#
# Replaces the trial-ladder bisection (7+ sequential certification passes,
# each a full k-DOP sweep plus conditional GJK on SWEPT Minkowski batches)
# with a single closed-form pass:
#
#   For s >= 0 the swept upper bound along axis a is exact:
#       hi_a(s) = max_n (hp_n + s * relu(dp_n)).
#   The implementation bounds it by the sum of maxes,
#       hi_a(s) <= max_n(hp_n) + s * max_n(relu(dp_n)),
#   a CONSERVATIVE (one-sided interval-speed) bound — strictly looser than
#   the per-vertex minimum ratio when the max projection and max speed come
#   from different vertices, but evaluated for every (segment, candidate,
#   axis) with no per-vertex blowup.  A pair is certified at s if ANY axis
#   certifies; the robot/fleet limit is the min over pairs.
#
#   Pairs the k-DOP cannot certify even at s=0 (near contact / k-DOP false
#   positives) get ONE exact static GJK distance plus the Lipschitz bound
#       dist(s) >= dist(0) - s * (max vertex displacement),
#   which certifies a small positive step whenever the true clearance exceeds
#   offset — the escape path the trial ladder provided, at 1/7th the passes
#   (and with 36-vertex static Minkowski batches instead of 144-vertex swept).
#
# The caller rounds the limit down to the reference's 0.8^k ladder rung
# (solver/admm.py::rung_floor), preserving Step.h step-size semantics.


def _side_limit(gap0, spd):
    """Largest s with  gap0 - s*spd > 0:  +inf if spd==0, -inf if gap0<=0."""
    safe = jnp.where(spd > 0, spd, 1.0)
    lim = jnp.where(spd > 0, gap0 / safe, jnp.inf)
    return jnp.where(gap0 > 0, lim, -jnp.inf)


def _hull_speed(dp):
    """Per-axis one-sided sweep speeds: (max_n relu(dp), max_n relu(-dp)).

    [..., n, D] -> ([..., D], [..., D]);  hi(s) <= hi0 + s*spd_hi and
    lo(s) >= lo0 - s*spd_lo, with equality for the exact swept bound."""
    return jnp.maximum(dp, 0.0).max(axis=-2), jnp.maximum(-dp, 0.0).max(axis=-2)


def _disp_norm(dhull):
    """[..., n, 3] -> [...]: max vertex displacement (Lipschitz rate)."""
    return jnp.sqrt(jnp.sum(dhull * dhull, axis=-1)).max(axis=-1)


def obstacle_max_step(tabs: ObstacleCCD, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[B] largest provably safe step per robot against the obstacle cloud.

    Exact in the k-DOP model per axis (not linearized); near-contact /
    k-DOP-false-positive candidates are refined by one static GJK batch with
    the Lipschitz displacement bound.  Strict-inequality margins are the
    caller's job (rung rounding)."""
    b, p, r, n, _ = tabs.hull.shape
    lo0, hi0 = _interval(tabs.hp)                        # [B,P,R,D]
    spd_hi, spd_lo = _hull_speed(tabs.dp)                # [B,P,R,D]

    def limits(cand_proj, cand_pm, pts_of):
        """cand_proj [B?,M,D], cand_pm broadcastable [B?,M] -> per-robot [B]."""
        cp = cand_proj if cand_proj.ndim == 3 else cand_proj[None]
        cp = cp[:, None, None]                           # [B?,1,1,M,D]
        g_hi = cp - hi0[..., None, :] - offset           # [B,P,R,M,D]
        g_lo = lo0[..., None, :] - cp - offset
        s_ax = jnp.maximum(
            _side_limit(g_hi, spd_hi[..., None, :]),
            _side_limit(g_lo, spd_lo[..., None, :]),
        )
        s_cand = jnp.max(s_ax, axis=-1)                  # [B,P,R,M]
        s_cand = jnp.where(cand_pm, jnp.maximum(s_cand, 0.0), jnp.inf)

        # one-shot GJK refinement of the S smallest limits per segment.
        # Soundness: select S+1 smallest; GJK-refines slots 0..S-1, while the
        # (S+1)-th UN-refined analytic value caps the segment result — every
        # unselected candidate's only certificate is its analytic limit,
        # which is >= that cap, so refinement can never lift the segment
        # limit past a candidate that got no GJK test.
        m_cand = s_cand.shape[-1]
        s_slots = min(tabs.n_slots, m_cand)
        k_sel = min(s_slots + 1, m_cand)
        s_all, idx_all = ptk.smallest_k(s_cand, k_sel)   # [B,P,R,S(+1)]
        s_sel, idx = s_all[..., :s_slots], idx_all[..., :s_slots]
        cap = (
            s_all[..., -1]
            if k_sel > s_slots
            else jnp.full(s_all.shape[:-1], jnp.inf, s_all.dtype)
        )

        def refine(_):
            sel_pts = pts_of(idx)                        # [B,P,R,S,3]
            diff = (
                tabs.hull[:, :, :, None] - sel_pts[..., None, :]
            ).reshape(-1, n, 3)
            dist0 = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
            dist0 = dist0.reshape(idx.shape)
            disp = _disp_norm(tabs.dhull)                # [B,P,R]
            s_ref = (dist0 - offset) / jnp.maximum(disp[..., None], 1e-12)
            return jnp.maximum(s_sel, jnp.maximum(s_ref, 0.0))

        need = jnp.any(s_sel < 1.0)
        s_ref = jax.lax.cond(
            need, refine, lambda _: s_sel, operand=None
        )
        s_seg = jnp.minimum(jnp.min(s_ref, axis=-1), cap)  # [B,P,R]
        return jnp.min(s_seg, axis=(-1, -2))             # [B]

    def subset(_):
        return limits(
            tabs.cand_proj, tabs.cand_pm[:, None, None],
            lambda idx: jax.vmap(lambda a, i: a[i])(tabs.cand_pts, idx),
        )

    def full(_):
        return limits(
            tabs.pts_proj, tabs.pmask[None, None, None],
            lambda idx: tabs.pts[idx],
        )

    # upper clip at 1 + eps, NOT 1.0: rung_floor admits a rung only when
    # strictly below the limit, so an unconstrained step (limit >= 1) must
    # stay distinguishable from a limit of exactly 1.0 (borderline -> shrink).
    return jnp.clip(
        jax.lax.cond(tabs.overflow, full, subset, operand=None), 0.0, 1.0 + 1e-6
    )


def obstacle_max_step_direct(
    hull, dhull, points, pmask, offset, gjk_iters, pallas,
    s1_slots: int = 32, n_slots: int = 32, seg_budget: int = 64,
) -> jnp.ndarray:
    """[B] largest provably safe step per robot vs the cloud — bounded-cost
    variant of `obstacle_max_step` with NO full-cloud fallback branch.

    Three PER-SEGMENT certification levels, each sound via the
    select-(K+1)-cap scheme: every candidate not refined at a finer level
    keeps its coarser certificate, and the (K+1)-th un-refined value of the
    coarser level caps the result.

    1. AABB level: 3-axis analytic sweep limits for EVERY (segment, point),
       as three fused per-axis [S, N] expressions; the S1 smallest per
       segment go to level 2, the (S1+1)-th caps.
    2. k-DOP level: full 49-axis analytic sweep limits on the S1
       candidates ([B,P,R,S1,D] — small); the S2 smallest go to level 3,
       the (S2+1)-th caps.
    3. GJK: exact static distance + a Lipschitz displacement rate on the
       S2 slots.

    The level-1 metric is a tight per-segment bound, so its ranking and cap
    stay non-degenerate in congested scenes — a robot- or piece-UNION
    interval covers whole trajectory spans (which in crossing scenes overlap
    half the cloud), and a centroid-ball bound zeroes every point within
    r_seg+offset of the centroid; either caps the step at 0 permanently,
    the absorbing-state failure this layout avoids.  As the Newton
    direction shrinks near convergence the limits grow like gap/|d|, so
    the full step re-certifies.

    Every level is per segment, so the caps stay non-degenerate in congested
    scenes (a ROBOT-level union interval covers the robot's whole
    trajectory, which in crossing scenes overlaps half the cloud and caps
    the step at 0 — the absorbing-state failure this layout avoids).
    Replaces the `lax.cond` overflow fallback of the table-based path, whose
    full-cloud branch materialized [B,P,R,N,D] (~GBs at the bench shapes)
    exactly during the large early sweeps that triggered it.
    """
    b, p, r, n, _ = hull.shape
    n_pts = points.shape[0]
    dtype = hull.dtype
    n_seg = b * p * r

    # --- level 1: 3-axis (AABB) analytic limits over the whole cloud -----
    # Written as three per-axis [S,N] expressions (not one [S,N,3] tensor)
    # so XLA fuses the whole chain into the top_k input with no [S,N,3]
    # materialization.  A per-SEGMENT box is tight, so very few points per
    # segment have limit ~0 and the (S1+1)-th cap stays non-degenerate —
    # unlike a centroid-ball bound, whose r_seg slack zeroes the limit for
    # every point within r_seg+offset of the centroid and capped dense
    # scenes to a permanent step=0.
    lo3 = hull.min(axis=-2).reshape(n_seg, 3)
    hi3 = hull.max(axis=-2).reshape(n_seg, 3)
    sp_hi = jnp.maximum(dhull, 0.0).max(axis=-2).reshape(n_seg, 3)
    sp_lo = jnp.maximum(-dhull, 0.0).max(axis=-2).reshape(n_seg, 3)
    s0 = None
    for a in range(3):
        pa = points[:, a][None, :]                       # [1,N]
        g_hi = pa - hi3[:, a][:, None] - offset          # [S,N]
        g_lo = lo3[:, a][:, None] - pa - offset
        s_a = jnp.maximum(
            _side_limit(g_hi, sp_hi[:, a][:, None]),
            _side_limit(g_lo, sp_lo[:, a][:, None]),
        )
        s0 = s_a if s0 is None else jnp.maximum(s0, s_a)
    s0 = jnp.where(pmask[None, :], jnp.maximum(s0, 0.0), jnp.inf)

    # Fast path: one fused min-reduce of the level-1 expression (XLA fuses
    # the whole elementwise chain into the reduce — no [S,N] materialization,
    # no sort).  When every (segment, point) limit certifies the full step —
    # the plateau regime, where the shrinking Newton direction pushes limits
    # like gap/|d| above 1 — selection, k-DOP and GJK are all skipped.
    s_seg_min = jnp.min(s0, axis=-1)                     # [S]
    all_clear = jnp.min(s_seg_min) >= 1.0

    def fast(_):
        return jnp.min(s_seg_min.reshape(b, p, r), axis=(-1, -2))

    def full(_):
        return _obstacle_levels_23(
            hull, dhull, points, pmask, s_seg_min, offset, gjk_iters, pallas,
            s1_slots, n_slots, seg_budget,
        )

    s_b = jax.lax.cond(all_clear, fast, full, operand=None)
    return jnp.clip(s_b, 0.0, 1.0 + 1e-6)  # 1+eps: see rung_floor strictness


def _obstacle_levels_23(
    hull, dhull, points, pmask, s_seg_min, offset, gjk_iters, pallas,
    s1_slots, n_slots, seg_budget,
):
    """Levels 2-3 of `obstacle_max_step_direct` (selection + k-DOP + GJK),
    taken only when some level-1 limit is below the full step.

    DANGEROUS-SEGMENT COMPACTION: refinement runs only on the W
    (``seg_budget``) segments with the smallest level-1 limits; every other
    segment keeps its OWN exact level-1 limit ``s_seg_min`` — a sound
    certificate, not a cap, so no (W+1)-th-value cap is needed at this level.
    Measured on the 64-robot coupled bench: at most 14 of 2048 segments ever
    have a level-1 limit below the full step, while the previous full-grid
    layout ran `lax.top_k` (a full TPU sort) over [2048, 4000] every call —
    41% of round 4's fused-step device time.  Refinement only ever RAISES a
    selected segment's limit, so compaction cannot unsound-accept; an
    overfull danger set (> W segments) merely keeps extra segments at their
    conservative level-1 values (smaller steps, never unsafe)."""
    b, p, r, n, _ = hull.shape
    n_seg = b * p * r
    n_pts = points.shape[0]
    dtype = hull.dtype
    w = min(seg_budget, n_seg)

    _, sel2 = ptk.smallest_k(s_seg_min[None], w)         # [1,W]
    sel = sel2[0]                                        # [W] segment ids
    hull_f = hull.reshape(n_seg, n, 3)[sel]              # [W,n,3]
    dhull_f = dhull.reshape(n_seg, n, 3)[sel]

    # --- level-1 rows recomputed for the selected segments ---------------
    # (cheap [W,N] elementwise; gathering rows of the fused full-grid s0
    # expression would force materializing the [n_seg,N] tensor instead)
    lo3 = hull_f.min(axis=-2)                            # [W,3]
    hi3 = hull_f.max(axis=-2)
    sp_hi3 = jnp.maximum(dhull_f, 0.0).max(axis=-2)
    sp_lo3 = jnp.maximum(-dhull_f, 0.0).max(axis=-2)
    s0 = None
    for a in range(3):
        pa = points[:, a][None, :]                       # [1,N]
        g_hi = pa - hi3[:, a][:, None] - offset          # [W,N]
        g_lo = lo3[:, a][:, None] - pa - offset
        s_a = jnp.maximum(
            _side_limit(g_hi, sp_hi3[:, a][:, None]),
            _side_limit(g_lo, sp_lo3[:, a][:, None]),
        )
        s0 = s_a if s0 is None else jnp.maximum(s0, s_a)
    s0 = jnp.where(pmask[None, :], jnp.maximum(s0, 0.0), jnp.inf)

    s1 = min(s1_slots, n_pts)
    k1 = min(s1 + 1, n_pts)
    s_all1, idx1_all = ptk.smallest_k(s0, k1)            # [W,S1(+1)]
    s3_sel = s_all1[:, :s1]
    idx1 = idx1_all[:, :s1]                              # [W,S1] cloud ids
    cap1 = (
        s_all1[:, -1] if k1 > s1 else jnp.full((w,), jnp.inf, dtype)
    )

    # --- level 2: EXACT per-vertex k-DOP limits on the S1 candidates -----
    # The swept bound hi_a(s) = max_n(hp_n + s*dp_n) is exact per vertex; the
    # axis certifies "point above hull" for s below min_n of the per-vertex
    # limits (and symmetrically below) — strictly tighter than the
    # interval-speed (sum-of-maxes) bound whenever the extreme position and
    # extreme velocity come from different vertices, which is exactly the
    # congested mid-solve regime where CCD was measured step-binding.
    # [W,S1,n,D] intermediates are small on the compacted danger set.
    ax = _axes(dtype)
    hp = hull_f @ ax.T                                   # [W,n,D]
    dp = dhull_f @ ax.T
    # gather 3-wide point rows and project inline (explicit 3-term sum, NOT
    # a K=3 matmul and NOT a [N,D]-row gather — both measured far slower
    # than this fused elementwise broadcast on TPU)
    sel_pts1 = points[idx1]                              # [W,S1,3]
    sel_proj = (
        sel_pts1[..., 0:1] * ax[:, 0]
        + sel_pts1[..., 1:2] * ax[:, 1]
        + sel_pts1[..., 2:3] * ax[:, 2]
    )                                                    # [W,S1,D]
    g1 = sel_proj[:, :, None, :] - hp[:, None] - offset  # [W,S1,n,D]
    side1 = jnp.min(_side_limit(g1, dp[:, None]), axis=-2)
    g2 = hp[:, None] - sel_proj[:, :, None, :] - offset
    side2 = jnp.min(_side_limit(g2, -dp[:, None]), axis=-2)
    s_kd = jnp.max(jnp.maximum(side1, side2), axis=-1)   # [W,S1]
    # both certificates are sound; keep the tighter (k-DOP >= AABB up to
    # the shared conservative speed bound, but max is safe regardless)
    s_kd = jnp.maximum(jnp.maximum(s_kd, 0.0), s3_sel)
    s_kd = jnp.where(jnp.isfinite(s3_sel), s_kd, jnp.inf)

    s2 = min(n_slots, s1)
    k2 = min(s2 + 1, s1)
    s_all, loc_all = ptk.smallest_k(s_kd, k2)            # [W,S2(+1)]
    s_sel, loc = s_all[:, :s2], loc_all[:, :s2]
    cap2 = (
        s_all[:, -1] if k2 > s2 else jnp.full((w,), jnp.inf, dtype)
    )
    idx2 = jnp.take_along_axis(idx1, loc, axis=-1)       # [W,S2] cloud ids

    # --- level 3: GJK + DIRECTIONAL Lipschitz refinement of the S2 slots -
    def refine(_):
        sel_pts = points[idx2]                           # [W,S2,3]
        diff = (hull_f[:, None] - sel_pts[..., None, :]).reshape(-1, n, 3)
        hd = geo.batched_origin_dist(diff, gjk_iters, pallas)
        dist0 = hd.lb.reshape(idx2.shape)
        disp = _disp_norm(dhull_f)                       # [W]
        s_ref = (dist0 - offset) / jnp.maximum(disp[:, None], 1e-12)
        # directional bound: for any unit c, dist(s) >= min_n(u_n . c)
        #                                            + s * min_n(dd_n . c)
        # (support-function certificate; u_n the diffset vertices, dd_n
        # their velocities).  With c = the GJK witness direction the first
        # term ~= dist0 and the RATE is the velocity component along the
        # separation normal — near zero for tangential (crossing) motion,
        # where the isotropic |dd|-rate bound forced the tiny mid-solve
        # steps (Step.h's per-trial exact GJKCCD has the same tightness).
        # Sound for ANY unit c, so a degenerate witness only loses
        # tightness (L ~ 0 < offset disables the bound), never safety.
        vn = jnp.sqrt(jnp.sum(hd.v**2, axis=-1))
        c = hd.v / jnp.maximum(vn, 1e-12)[:, None]       # [W*S2,3]
        lcert = jnp.min(jnp.einsum("bnd,bd->bn", diff, c), axis=-1)
        dd = jnp.broadcast_to(
            dhull_f[:, None], idx2.shape + (n, 3)
        ).reshape(-1, n, 3)
        rate = -jnp.min(jnp.einsum("bnd,bd->bn", dd, c), axis=-1)
        s_dir = jnp.where(
            rate > 0,
            (lcert - offset) / jnp.maximum(rate, 1e-12),
            jnp.inf,
        )
        s_dir = jnp.where(lcert > offset, s_dir, -jnp.inf)
        s_ref = jnp.maximum(s_ref, s_dir.reshape(idx2.shape))
        return jnp.maximum(s_sel, jnp.maximum(s_ref, 0.0))

    # GJK runs only when it can matter (some selected limit below the full
    # step); near convergence the shrinking direction pushes every limit
    # above 1 and the batch is skipped.  Skipping is strictly conservative.
    s_ref = jax.lax.cond(
        jnp.min(s_sel) < 1.0, refine, lambda _: s_sel, operand=None
    )
    seg_ref = jnp.minimum(jnp.min(s_ref, axis=-1), jnp.minimum(cap1, cap2))

    # --- scatter refined limits back to robots ---------------------------
    rob = sel // (p * r)                                 # [W] owning robot
    s_b = jnp.full((b,), jnp.inf, dtype).at[rob].min(seg_ref)
    unsel = (
        s_seg_min.at[sel].set(jnp.inf).reshape(b, p, r).min(axis=(-1, -2))
    )
    return jnp.minimum(s_b, unsel)                       # [B]


def pair_max_step_direct(
    my_hulls, my_dhulls, all_hulls, all_dhulls, gids,
    offset, gjk_iters, pallas,
    k_partners: int = 8, n_slots: int = 8, groups: int = 1,
) -> jnp.ndarray:
    """[U] largest provably safe COMMON step per robot vs every other robot
    (`Step::couple_self_step` semantics) — bounded-cost variant of
    `pair_max_step` with the same PER-SEGMENT three-level scheme as
    `obstacle_max_step_direct`:

    1. AABB level: 3-axis analytic pair limits for every (segment, partner)
       in one fused [U,Ut,P,R,3] pass; K1 smallest partners per segment to
       level 2, (K1+1)-th caps.
    2. k-DOP level: 49-axis limits on the selected partners
       ([U,P,R,K1,D]); S2 smallest to level 3, (S2+1)-th caps.
    3. GJK + Lipschitz on the S2 slots.
    """
    u, p, r, n, _ = my_hulls.shape
    ut = all_hulls.shape[0]
    dtype = my_hulls.dtype
    other = jnp.arange(ut, dtype=gids.dtype)[None, :]
    not_self = gids[:, None] != other
    if groups > 1:
        # scenario-grouped fleet: only same-group robots constrain each other
        upg = ut // groups
        not_self = not_self & ((gids[:, None] // upg) == (other // upg))

    # --- level 1: 3-axis pair limits for every (segment, partner) --------
    lo3_a = my_hulls.min(axis=-2); hi3_a = my_hulls.max(axis=-2)   # [U,P,R,3]
    lo3_b = all_hulls.min(axis=-2); hi3_b = all_hulls.max(axis=-2) # [Ut,P,R,3]
    sp3_hi_a = jnp.maximum(my_dhulls, 0.0).max(axis=-2)
    sp3_lo_a = jnp.maximum(-my_dhulls, 0.0).max(axis=-2)
    sp3_hi_b = jnp.maximum(all_dhulls, 0.0).max(axis=-2)
    sp3_lo_b = jnp.maximum(-all_dhulls, 0.0).max(axis=-2)
    g1 = lo3_a[:, None] - hi3_b[None] - offset           # [U,Ut,P,R,3]
    s1_ = _side_limit(g1, sp3_lo_a[:, None] + sp3_hi_b[None])
    g2 = lo3_b[None] - hi3_a[:, None] - offset
    s2_ = _side_limit(g2, sp3_hi_a[:, None] + sp3_lo_b[None])
    s3 = jnp.max(jnp.maximum(s1_, s2_), axis=-1)         # [U,Ut,P,R]
    s3 = jnp.moveaxis(s3, 1, -1)                         # [U,P,R,Ut]
    s3 = jnp.where(
        not_self[:, None, None, :], jnp.maximum(s3, 0.0), jnp.inf
    )

    # fast path: fused min-reduce; skip selection/k-DOP/GJK when every pair
    # limit certifies the full step (see obstacle_max_step_direct)
    s_seg_min = jnp.min(s3, axis=-1)                     # [U,P,R]
    all_clear = jnp.min(s_seg_min) >= 1.0

    def fast(_):
        return jnp.min(s_seg_min, axis=(-1, -2))

    def full(_):
        return _pair_levels_23(
            my_hulls, my_dhulls, all_hulls, all_dhulls, s3,
            offset, gjk_iters, pallas, k_partners, n_slots,
        )

    s_u = jax.lax.cond(all_clear, fast, full, operand=None)
    return jnp.clip(s_u, 0.0, 1.0 + 1e-6)  # 1+eps: see rung_floor strictness


def _pair_levels_23(
    my_hulls, my_dhulls, all_hulls, all_dhulls, s3,
    offset, gjk_iters, pallas, k_partners, n_slots,
):
    """Levels 2-3 of `pair_max_step_direct` (partner selection + k-DOP +
    GJK), taken only when some level-1 pair limit is below the full step."""
    u, p, r, n, _ = my_hulls.shape
    ut = all_hulls.shape[0]
    dtype = my_hulls.dtype

    kp = min(k_partners, max(ut - 1, 1))
    k1 = min(kp + 1, ut)
    s3_all, part_all = ptk.smallest_k(s3, k1)            # [U,P,R,K1(+1)]
    s3_sel = s3_all[..., :kp]
    part = part_all[..., :kp]                            # [U,P,R,K1] fleet ids
    cap1 = (
        s3_all[..., -1] if k1 > kp
        else jnp.full(s3_all.shape[:-1], jnp.inf, dtype)
    )

    # --- level 2: full k-DOP limits on the selected partners -------------
    # ONE hull gather per side (the same gathered hulls feed the GJK level),
    # with k-DOP projections computed inline as explicit 3-term broadcasts
    # — four separate [Ut,P,R,D]-table gathers measured far slower.
    ax = _axes(dtype)

    def proj(x):   # [..., n, 3] -> [..., n, D]
        return (
            x[..., 0:1] * ax[:, 0]
            + x[..., 1:2] * ax[:, 1]
            + x[..., 2:3] * ax[:, 2]
        )

    my_hp, my_dp = proj(my_hulls), proj(my_dhulls)       # [U,P,R,n,D]
    lo_a0, hi_a0 = _interval(my_hp)                      # [U,P,R,D]
    spd_hi_a, spd_lo_a = _hull_speed(my_dp)
    p_idx = jnp.arange(p)[None, :, None, None]
    r_idx = jnp.arange(r)[None, None, :, None]
    sel_hulls1 = all_hulls[part, p_idx, r_idx]           # [U,P,R,K1,n,3]
    sel_dhulls1 = all_dhulls[part, p_idx, r_idx]
    sel_hp = proj(sel_hulls1)                            # [U,P,R,K1,n,D]
    sel_dp = proj(sel_dhulls1)
    sel_lo_b, sel_hi_b = _interval(sel_hp)               # [U,P,R,K1,D]
    sel_s_hi_b, sel_s_lo_b = _hull_speed(sel_dp)
    g1 = lo_a0[..., None, :] - sel_hi_b - offset         # [U,P,R,K1,D]
    s1k = _side_limit(g1, spd_lo_a[..., None, :] + sel_s_hi_b)
    g2 = sel_lo_b - hi_a0[..., None, :] - offset
    s2k = _side_limit(g2, spd_hi_a[..., None, :] + sel_s_lo_b)
    s_kd = jnp.max(jnp.maximum(s1k, s2k), axis=-1)       # [U,P,R,K1]
    s_kd = jnp.maximum(jnp.maximum(s_kd, 0.0), s3_sel)
    s_kd = jnp.where(jnp.isfinite(s3_sel), s_kd, jnp.inf)

    s2n = min(n_slots, kp)
    k2 = min(s2n + 1, kp)
    s_all, loc_all = ptk.smallest_k(s_kd, k2)            # [U,P,R,S2(+1)]
    s_sel, loc = s_all[..., :s2n], loc_all[..., :s2n]
    cap2 = (
        s_all[..., -1] if k2 > s2n
        else jnp.full(s_all.shape[:-1], jnp.inf, dtype)
    )

    # --- level 3: GJK + DIRECTIONAL Lipschitz on the S2 slots ------------
    def refine(_):
        # slice the already-gathered K1 hulls down to the S2 slots
        sel_hulls = jnp.take_along_axis(
            sel_hulls1, loc[..., None, None], axis=3
        )                                                # [U,P,R,S2,n,3]
        sel_dhulls = jnp.take_along_axis(
            sel_dhulls1, loc[..., None, None], axis=3
        )
        diff = (
            my_hulls[:, :, :, None, :, None, :]
            - sel_hulls[:, :, :, :, None, :, :]
        ).reshape(-1, n * n, 3)
        hd = geo.batched_origin_dist(diff, gjk_iters, pallas)
        dist0 = hd.lb.reshape(loc.shape)
        disp = _disp_norm(my_dhulls)[..., None] + _disp_norm(sel_dhulls)
        s_ref = (dist0 - offset) / jnp.maximum(disp, 1e-12)
        # directional bound along the GJK witness (see the obstacle-level
        # comment): diffset vertices move at (da_i - db_j), so the decrease
        # rate along c is max_j(db_j . c) - min_i(da_i . c) — near zero for
        # the tangential crossing motion that dominates pair congestion.
        vn = jnp.sqrt(jnp.sum(hd.v**2, axis=-1))
        c = (hd.v / jnp.maximum(vn, 1e-12)[:, None]).reshape(
            loc.shape + (3,)
        )                                                # [U,P,R,S2,3]
        lcert = jnp.min(
            jnp.einsum("uprsmd,uprsd->uprsm", diff.reshape(loc.shape + (n * n, 3)), c),
            axis=-1,
        )
        da_c = jnp.einsum("uprnd,uprsd->uprsn", my_dhulls, c)
        db_c = jnp.einsum("uprsnd,uprsd->uprsn", sel_dhulls, c)
        rate = jnp.max(db_c, axis=-1) - jnp.min(da_c, axis=-1)
        s_dir = jnp.where(
            rate > 0,
            (lcert - offset) / jnp.maximum(rate, 1e-12),
            jnp.inf,
        )
        s_dir = jnp.where(lcert > offset, s_dir, -jnp.inf)
        s_ref = jnp.maximum(s_ref, s_dir)
        return jnp.maximum(s_sel, jnp.maximum(s_ref, 0.0))

    s_ref = jax.lax.cond(
        jnp.min(s_sel) < 1.0, refine, lambda _: s_sel, operand=None
    )
    s_seg = jnp.minimum(jnp.min(s_ref, axis=-1), jnp.minimum(cap1, cap2))
    return jnp.min(s_seg, axis=(-1, -2))                 # [U]


def pair_max_step(tabs: PairCCD, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[U] largest provably safe COMMON step per robot against every other
    robot (both hulls sweep with the same scalar — Step::couple_self_step
    semantics; the caller min-reduces over the fleet)."""
    u, p, r, n, _ = tabs.my_hull.shape
    ut = tabs.all_hp.shape[0]
    lo_a0, hi_a0 = _interval(tabs.my_hp)                 # [U,P,R,D]
    lo_b0, hi_b0 = _interval(tabs.all_hp)                # [Ut,P,R,D]
    spd_hi_a, spd_lo_a = _hull_speed(tabs.my_dp)
    spd_hi_b, spd_lo_b = _hull_speed(tabs.all_dp)

    # side 1: A entirely above B along the axis
    g1 = lo_a0[:, None] - hi_b0[None] - offset           # [U,Ut,P,R,D]
    s1 = _side_limit(g1, spd_lo_a[:, None] + spd_hi_b[None])
    # side 2: B entirely above A
    g2 = lo_b0[None] - hi_a0[:, None] - offset
    s2 = _side_limit(g2, spd_hi_a[:, None] + spd_lo_b[None])
    s_pair = jnp.max(jnp.maximum(s1, s2), axis=-1)       # [U,Ut,P,R]
    s_pair = jnp.moveaxis(s_pair, 1, -1)                 # [U,P,R,Ut]
    s_pair = jnp.where(
        tabs.not_self[:, None, None, :], jnp.maximum(s_pair, 0.0), jnp.inf
    )

    # S+1 selection, same soundness scheme as `obstacle_max_step`: the
    # (S+1)-th un-refined analytic limit caps the result so GJK refinement
    # never lifts the limit past an untested partner.
    s_slots = min(tabs.n_slots, ut)
    k_sel = min(s_slots + 1, ut)
    s_all, idx_all = ptk.smallest_k(s_pair, k_sel)       # [U,P,R,S(+1)]
    s_sel, idx = s_all[..., :s_slots], idx_all[..., :s_slots]
    cap = (
        s_all[..., -1]
        if k_sel > s_slots
        else jnp.full(s_all.shape[:-1], jnp.inf, s_all.dtype)
    )

    def refine(_):
        p_idx = jnp.arange(p)[None, :, None, None]
        r_idx = jnp.arange(r)[None, None, :, None]
        sel_hulls = tabs.all_hulls[idx, p_idx, r_idx]    # [U,P,R,S,n,3]
        sel_dhulls = tabs.all_dhulls[idx, p_idx, r_idx]
        diff = (
            tabs.my_hull[:, :, :, None, :, None, :]
            - sel_hulls[:, :, :, :, None, :, :]
        ).reshape(-1, n * n, 3)
        dist0 = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
        dist0 = dist0.reshape(idx.shape)
        disp = (
            _disp_norm(tabs.my_dhull)[..., None]
            + _disp_norm(sel_dhulls)
        )                                                # [U,P,R,S]
        s_ref = (dist0 - offset) / jnp.maximum(disp, 1e-12)
        return jnp.maximum(s_sel, jnp.maximum(s_ref, 0.0))

    s_ref = jax.lax.cond(
        jnp.any(s_sel < 1.0), refine, lambda _: s_sel, operand=None
    )
    s_seg = jnp.minimum(jnp.min(s_ref, axis=-1), cap)    # [U,P,R]
    return jnp.clip(jnp.min(s_seg, axis=(-1, -2)), 0.0, 1.0 + 1e-6)
