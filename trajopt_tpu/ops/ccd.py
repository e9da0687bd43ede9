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
  test — but only a fixed number of slots per segment, selected ONCE per CCD
  call by two complementary danger rankings: smallest k-DOP gap at the FULL
  sweep (fast movers) and smallest gap at ZERO sweep (static near-contacts).
  An uncleared, unselected pair simply makes the step inadmissible — strictly
  conservative, never unsafe.
* Admissibility is monotone in the step (the swept hull only grows), so the
  0.8^k ladder can be bisected (solver/admm.py::ladder_bisect).

Fast paths (performance, not soundness):

* A ROBOT-level k-DOP interval (union of the robot's swept segment intervals
  at the full sweep) certifies most of the cloud per robot in one [B,N] pass;
  only a fixed per-robot candidate table (`_PREFILTER_M` smallest robot-level
  gaps) enters the per-segment tests.  If more points than the table holds
  are in robot-level danger, a `lax.cond` falls back to the full-cloud pass —
  still sound, just slower (typical only during early large sweeps).
* The GJK batches are `lax.cond`-gated on actual k-DOP danger among the
  selected slots; steady-state CCD calls skip GJK entirely.

All shapes are static; everything vmaps over robots and runs inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo


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


def _first_occurrence(idx: jnp.ndarray) -> jnp.ndarray:
    """[..., S] bool: True where idx[..., j] is the first occurrence of its
    value along the last axis.  Used for exact count-based slot coverage
    (TPU-friendly — no scatters)."""
    s = idx.shape[-1]
    eq = idx[..., :, None] == idx[..., None, :]            # [..., S, S]
    earlier = jnp.tril(jnp.ones((s, s), bool), k=-1)
    return ~jnp.any(eq & earlier, axis=-1)


# ---------------------------------------------------------------------------
# Obstacle CCD (segments vs point cloud)
# ---------------------------------------------------------------------------


_PREFILTER_M = 128  # per-robot candidate budget of the robot-level prefilter


class ObstacleCCD(NamedTuple):
    hull: jnp.ndarray      # [B,P,R,n,3]
    dhull: jnp.ndarray     # [B,P,R,n,3]
    hp: jnp.ndarray        # [B,P,R,n,D] hull projections
    dp: jnp.ndarray        # [B,P,R,n,D] direction projections
    pts_proj: jnp.ndarray  # [N,D]  (full cloud — overflow fallback only)
    pmask: jnp.ndarray     # [N] bool
    cand_proj: jnp.ndarray # [B,Mc,D] candidate projections (per-trial k-DOP)
    cand_pm: jnp.ndarray   # [B,Mc] live-point mask of the candidates
    sel_idx: jnp.ndarray   # [B,P,R,S] GJK slot candidate ids (S = 2K)
    sel_pts: jnp.ndarray   # [B,P,R,S,3]
    sel_pm: jnp.ndarray    # [B,P,R,S] live-point mask of the slots
    sel_uniq: jnp.ndarray  # [B,P,R,S] first-occurrence mask (exact counting)
    cand_need: jnp.ndarray # [B,P,R,Mc] candidates that must pass k-DOP
    overflow: jnp.ndarray  # [] bool: prefilter missed a dangerous point
    offset: float


def build_obstacle_ccd(hull, dhull, points, pmask, k_gjk: int, offset: float) -> ObstacleCCD:
    """Precompute projections, the candidate table, and the GJK slots.

    ``hull``/``dhull``: [B,P,R,n,3] (B = robot batch, 1 for single).
    GJK slots: per segment, the ``k_gjk`` smallest k-DOP gaps at the full
    sweep plus the ``k_gjk`` smallest at zero sweep.

    Two-level candidate structure (soundness preserved at both levels):

    1. ROBOT level: one k-DOP interval per robot (union of its swept segment
       intervals at full sweep) gives a gap lower bound per (robot, point) —
       [B,N] work instead of [B,P,R,N].  Points with robot-level gap > offset
       are provably clear of every segment at every step; the rest rank into
       a fixed per-robot candidate table of ``_PREFILTER_M`` slots.  If more
       than Mc points are in danger the overflow flag forces the trial-time
       full pass (exact, slower) — never an unsound accept.
    2. SEGMENT level: the candidate table itself is the per-trial k-DOP set
       (every candidate is certified at every trial — no further ranked
       subset, so no [B,P,R,·] top_k or big gathers); per-segment
       full-sweep/zero-sweep rankings over the Mc candidates pick only the
       GJK slots.
    """
    ax = _axes(hull.dtype)
    hp = hull @ ax.T                                     # [B,P,R,n,D]
    dp = dhull @ ax.T
    pts_proj = points @ ax.T                             # [N,D]
    n_pts = points.shape[0]
    b = hull.shape[0]

    lo1, hi1 = _swept_interval(hp, dp, jnp.asarray(1.0, hull.dtype))
    lo0, hi0 = _interval(hp)
    big = jnp.asarray(jnp.inf, hull.dtype)

    mc = min(_PREFILTER_M, n_pts)
    if mc < n_pts:
        # --- robot-level prefilter ---------------------------------------
        rlo = jnp.min(lo1, axis=(1, 2))                  # [B,D]
        rhi = jnp.max(hi1, axis=(1, 2))
        rgap = _gap_point(rlo, rhi, pts_proj)            # [B,N]
        rgap = jnp.where(pmask, rgap, big)
        _, cand = jax.lax.top_k(-rgap, mc)               # [B,Mc]
        cand_pts = points[cand]                          # [B,Mc,3]
        cand_proj = pts_proj[cand]                       # [B,Mc,D]
        cand_pm = pmask[cand]
        pre_overflow = jnp.any(
            jnp.sum((rgap <= offset) & pmask, axis=-1) > mc
        )
    else:
        cand = jnp.broadcast_to(
            jnp.arange(n_pts, dtype=jnp.int32), (b, n_pts)
        )
        cand_pts = jnp.broadcast_to(points, (b,) + points.shape)
        cand_proj = jnp.broadcast_to(pts_proj, (b,) + pts_proj.shape)
        cand_pm = jnp.broadcast_to(pmask, (b, n_pts))
        pre_overflow = jnp.zeros((), bool)

    cp = cand_proj[:, None, None]                        # [B,1,1,Mc,D]
    gap1 = _gap_point(lo1, hi1, cp)                      # [B,P,R,Mc]
    gap0 = _gap_point(lo0, hi0, cp)
    gap1 = jnp.where(cand_pm[:, None, None], gap1, big)
    gap0 = jnp.where(cand_pm[:, None, None], gap0, big)

    k = min(k_gjk, mc)
    _, idx1 = jax.lax.top_k(-gap1, k)                    # most full-sweep danger
    _, idx0 = jax.lax.top_k(-gap0, k)                    # nearest at zero sweep
    sel = jnp.concatenate([idx1, idx0], axis=-1).astype(jnp.int32)

    # candidates already covered by a GJK slot need not pass k-DOP
    cand_ids = jnp.arange(mc, dtype=jnp.int32)
    dup = jnp.any(
        cand_ids[:, None] == sel[..., None, :], axis=-1
    )                                                    # [B,P,R,Mc]
    cand_need = cand_pm[:, None, None] & ~dup

    def gather_cand(arr, idx):
        """arr [B,Mc,...] gathered by idx [B,P,R,S] -> [B,P,R,S,...]."""
        return jax.vmap(lambda a, i: a[i])(arr, idx)

    return ObstacleCCD(
        hull=hull, dhull=dhull, hp=hp, dp=dp,
        pts_proj=pts_proj, pmask=pmask,
        cand_proj=cand_proj, cand_pm=cand_pm,
        sel_idx=sel,
        sel_pts=gather_cand(cand_pts, sel),
        sel_pm=gather_cand(cand_pm, sel),
        sel_uniq=_first_occurrence(sel),
        cand_need=cand_need,
        overflow=pre_overflow, offset=offset,
    )


def obstacle_bad(tabs: ObstacleCCD, steps, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[B] bool: is any (segment, obstacle) pair of robot b uncertified at
    that robot's step?  ``steps``: scalar or [B]."""
    b, p, r, n, _ = tabs.hull.shape
    s = jnp.broadcast_to(jnp.asarray(steps, tabs.hull.dtype), (b,))
    s5 = s[:, None, None, None, None]                    # [B,1,1,1,1]
    lo, hi = _swept_interval(tabs.hp, tabs.dp, s5)       # [B,P,R,D]

    # one k-DOP pass over the candidate table; slot gaps gathered from it
    g_cand = _gap_point(lo, hi, tabs.cand_proj[:, None, None])  # [B,P,R,Mc]
    g_sel = jnp.take_along_axis(g_cand, tabs.sel_idx, axis=-1)  # [B,P,R,S]

    # --- k-DOP certification of everything outside the GJK slots ---
    def subset_pass(_):
        # non-candidates are certified by the robot-level prefilter (build)
        return jnp.any(tabs.cand_need & ~(g_cand > offset), axis=(-1, -2, -3))

    def full_pass(_):
        # count-based slot coverage (exact, no scatters): uncertified points
        # minus those covered by a unique GJK slot
        g = _gap_point(lo, hi, tabs.pts_proj)            # [B,P,R,N]
        n_bad = jnp.sum(tabs.pmask & ~(g > offset), axis=-1)
        n_cov = jnp.sum(
            tabs.sel_pm & tabs.sel_uniq & ~(g_sel > offset), axis=-1
        )
        return jnp.any(n_bad > n_cov, axis=(-1, -2))

    kdop_bad = jax.lax.cond(tabs.overflow, full_pass, subset_pass, operand=None)

    # --- GJK on the slots, gated on actual k-DOP danger among them ---
    danger = tabs.sel_pm & ~(g_sel > offset)

    def run_gjk(_):
        swept = jnp.concatenate([tabs.hull, tabs.hull + s5 * tabs.dhull], axis=-2)
        diff = (
            swept[:, :, :, None] - tabs.sel_pts[..., None, :]
        ).reshape(-1, 2 * n, 3)                          # [B*P*R*S, 2n, 3]
        lb = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
        ok = (lb > offset).reshape(tabs.sel_idx.shape)
        return jnp.any(danger & ~ok, axis=(-1, -2, -3))  # [B]

    gjk_bad = jax.lax.cond(
        jnp.any(danger), run_gjk, lambda _: jnp.zeros((b,), bool), operand=None
    )
    return kdop_bad | gjk_bad


# ---------------------------------------------------------------------------
# Robot-pair CCD (equal-time segment hulls vs each other)
# ---------------------------------------------------------------------------


class PairCCD(NamedTuple):
    my_hull: jnp.ndarray    # [U,P,R,n,3]
    my_dhull: jnp.ndarray
    my_hp: jnp.ndarray      # [U,P,R,n,D]
    my_dp: jnp.ndarray
    all_hp: jnp.ndarray     # [Ut,P,R,n,D]
    all_dp: jnp.ndarray
    sel_ids: jnp.ndarray    # [U,P,R,S] partner global robot id
    sel_uniq: jnp.ndarray   # [U,P,R,S] first-occurrence mask
    sel_hulls: jnp.ndarray  # [U,P,R,S,n,3]
    sel_dhulls: jnp.ndarray
    not_self: jnp.ndarray   # [U,Ut] bool


def build_pair_ccd(
    my_hulls, my_dhulls, all_hulls, all_dhulls, gids, k_gjk: int
) -> PairCCD:
    """``my_*``: [U,P,R,n,3] local robots; ``all_*``: [Ut,...] gathered fleet;
    ``gids``: [U] global ids of the local robots (for self-pair exclusion)."""
    ax = _axes(my_hulls.dtype)
    my_hp, my_dp = my_hulls @ ax.T, my_dhulls @ ax.T
    all_hp, all_dp = all_hulls @ ax.T, all_dhulls @ ax.T
    u, ut = my_hulls.shape[0], all_hulls.shape[0]
    not_self = gids[:, None] != jnp.arange(ut, dtype=gids.dtype)[None, :]

    one = jnp.asarray(1.0, my_hulls.dtype)
    lo_a1, hi_a1 = _swept_interval(my_hp, my_dp, one)      # [U,P,R,D]
    lo_b1, hi_b1 = _swept_interval(all_hp, all_dp, one)    # [Ut,P,R,D]
    gap1 = _gap_interval(
        lo_a1[:, None], hi_a1[:, None], lo_b1[None], hi_b1[None]
    )                                                      # [U,Ut,P,R]
    lo_a0, hi_a0 = _interval(my_hp)
    lo_b0, hi_b0 = _interval(all_hp)
    gap0 = _gap_interval(lo_a0[:, None], hi_a0[:, None], lo_b0[None], hi_b0[None])
    big = jnp.asarray(jnp.inf, my_hulls.dtype)
    bad_pair = ~not_self[:, :, None, None]
    gap1 = jnp.where(bad_pair, big, gap1)
    gap0 = jnp.where(bad_pair, big, gap0)

    k = min(k_gjk, max(ut - 1, 1))
    m1 = jnp.moveaxis(gap1, 1, -1)                         # [U,P,R,Ut]
    m0 = jnp.moveaxis(gap0, 1, -1)
    _, idx1 = jax.lax.top_k(-m1, k)
    _, idx0 = jax.lax.top_k(-m0, k)
    sel = jnp.concatenate([idx1, idx0], axis=-1).astype(jnp.int32)  # [U,P,R,S]

    def gather_other(arr):                                  # [Ut,P,R,n,3]
        # one XLA gather via advanced indexing — broadcasting moved[None] to
        # [U,P,R,Ut,n,3] for take_along_axis materializes ~100 MB at U=64
        p_idx = jnp.arange(arr.shape[1])[None, :, None, None]
        r_idx = jnp.arange(arr.shape[2])[None, None, :, None]
        return arr[sel, p_idx, r_idx]                       # [U,P,R,S,n,3]

    return PairCCD(
        my_hull=my_hulls, my_dhull=my_dhulls,
        my_hp=my_hp, my_dp=my_dp, all_hp=all_hp, all_dp=all_dp,
        sel_ids=sel, sel_uniq=_first_occurrence(sel),
        sel_hulls=gather_other(all_hulls), sel_dhulls=gather_other(all_dhulls),
        not_self=not_self,
    )


def pair_bad(tabs: PairCCD, my_steps, all_steps, offset, gjk_iters, pallas) -> jnp.ndarray:
    """[U] bool: any uncertified pair involving each local robot, with
    per-robot step intervals [0, s_i] x [0, s_j] (Step::self_step /
    couple_self_step semantics)."""
    u, p, r, n, _ = tabs.my_hull.shape
    ut = tabs.all_hp.shape[0]
    sm = my_steps[:, None, None, None, None]
    sa = all_steps[:, None, None, None, None]

    lo_a, hi_a = _swept_interval(tabs.my_hp, tabs.my_dp, sm)
    lo_b, hi_b = _swept_interval(tabs.all_hp, tabs.all_dp, sa)
    gap = _gap_interval(
        lo_a[:, None], hi_a[:, None], lo_b[None], hi_b[None]
    )                                                       # [U,Ut,P,R]
    kdop_ok = (gap > offset) | ~tabs.not_self[:, :, None, None]

    sel_gap = jnp.take_along_axis(
        jnp.moveaxis(gap, 1, -1), tabs.sel_ids, axis=-1
    )                                                       # [U,P,R,S]
    sel_real = tabs.not_self[
        jnp.arange(u)[:, None, None, None], tabs.sel_ids
    ]
    # count-based slot coverage (exact, no scatters)
    n_bad = jnp.sum(~kdop_ok, axis=(1,))                    # [U,P,R]
    n_cov = jnp.sum(tabs.sel_uniq & sel_real & ~(sel_gap > offset), axis=-1)
    unsel_bad = jnp.any(n_bad > n_cov, axis=(-1, -2))       # [U]

    # GJK on the slots, gated on k-DOP danger among them
    danger = sel_real & ~(sel_gap > offset)

    def run_gjk(_):
        sel_steps = all_steps[tabs.sel_ids]                 # [U,P,R,S]
        swept_a = jnp.concatenate(
            [tabs.my_hull, tabs.my_hull + sm * tabs.my_dhull], axis=-2
        )                                                   # [U,P,R,2n,3]
        so = sel_steps[..., None, None]
        swept_b = jnp.concatenate(
            [tabs.sel_hulls, tabs.sel_hulls + so * tabs.sel_dhulls], axis=-2
        )                                                   # [U,P,R,S,2n,3]
        diff = (
            swept_a[:, :, :, None, :, None, :] - swept_b[:, :, :, :, None, :, :]
        ).reshape(-1, 4 * n * n, 3)
        lb = geo.batched_origin_dist(diff, gjk_iters, pallas).lb
        ok = (lb > offset).reshape(tabs.sel_ids.shape)
        return jnp.any(danger & ~ok, axis=(1, 2, 3))        # [U]

    gjk_bad = jax.lax.cond(
        jnp.any(danger), run_gjk, lambda _: jnp.zeros((u,), bool), operand=None
    )
    return unsel_bad | gjk_bad
