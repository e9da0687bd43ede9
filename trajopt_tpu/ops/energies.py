"""Augmented-Lagrangian energies as pure, maskable JAX functions.

TPU-native re-expression of `HighOrderCCD/Energy_admm.h` + `Energy.h`:
every barrier term over (piece, subdivision, plane-slot, hull-point) is a
dense masked tensor expression — the reference's nested loops with early
``return INFINITY`` become one einsum plus a ``jnp.where`` mask and a separate
infeasibility flag (carried through the line search instead of IEEE inf so
that reverse-mode AD stays NaN-free).

Barrier: ``b(d) = -(d - margin)^2 * log(d / margin)`` for ``0 < d < margin``,
0 for ``d >= margin``, infeasible for ``d <= 0``  (Energy_admm.h:82-88 —
the IPC-style clamped log barrier).

All functions are per-robot; vmap over a leading robot/scenario axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import TrajOptConfig
from ..types import Planes, SplineConsts, SolverState


class EnergyVal(NamedTuple):
    value: jnp.ndarray       # scalar; valid only where ``infeasible`` is False
    infeasible: jnp.ndarray  # scalar bool


def piece_cps(consts: SplineConsts, spline: jnp.ndarray) -> jnp.ndarray:
    """Gather stored rows per piece: [T,3] -> [P,n,3]."""
    return spline[consts.piece_idx]


def seg_cps(consts: SplineConsts, spline: jnp.ndarray) -> jnp.ndarray:
    """Control hulls of every subdivided segment: [P,R,n,3].

    One einsum replaces the reference's per-segment `basis*bz` walks over
    ``subdivide_tree`` (Energy_admm.h:61-66).
    """
    return jnp.einsum(
        "prij,pjd->prid", consts.seg_basis, piece_cps(consts, spline)
    )


def _barrier(d: jnp.ndarray, margin: float, active: jnp.ndarray) -> jnp.ndarray:
    """Masked barrier values; ``active`` must imply ``d > 0``."""
    d_safe = jnp.where(active, d, margin)
    return jnp.where(
        active, -((d_safe - margin) ** 2) * jnp.log(d_safe / margin), 0.0
    )


def plane_distances(hull: jnp.ndarray, planes: Planes) -> jnp.ndarray:
    """Signed distances of hull CPs to planes: [P,R,K,n].

    hull: [P,R,n,3].  (Energy_admm.h:71-89.)
    """
    return jnp.einsum("prjd,prkd->prkj", hull, planes.c) + planes.d[..., None]


def plane_barrier_energy(
    consts: SplineConsts, cfg: TrajOptConfig, spline: jnp.ndarray, planes: Planes
) -> EnergyVal:
    """Separating-plane barrier (Energy_admm.h:46-96)."""
    hull = seg_cps(consts, spline)
    d = plane_distances(hull, planes)                      # [P,R,K,n]
    live = planes.mask[..., None]                          # [P,R,K,1]
    infeasible = jnp.any(live & (d <= 0))
    active = live & (d > 0) & (d < cfg.margin)
    w = consts.seg_weight[None, :, None, None]
    e = jnp.sum(w * _barrier(d, cfg.margin, active))
    return EnergyVal(e, infeasible)


def _safe_norm(vec: jnp.ndarray, active_hint: jnp.ndarray) -> jnp.ndarray:
    """Norm along last axis with NaN-free gradients for inactive entries.

    ``active_hint`` marks entries whose gradient matters; inactive ones (which
    include any exactly-zero vectors, e.g. pinned duplicate endpoint CPs) get a
    dummy positive radicand so reverse-mode AD never differentiates sqrt at 0.
    """
    sq = jnp.sum(vec * vec, axis=-1)
    sq_safe = jnp.where(active_hint, sq, 1.0)
    # inactive entries are masked out of the energy; returning 0 (not sqrt(sq))
    # keeps sqrt'(0)=inf out of the backward pass entirely (double-where rule)
    return jnp.where(active_hint, jnp.sqrt(sq_safe), 0.0)


def bound_energy(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    piece_time: jnp.ndarray,
) -> EnergyVal:
    """Velocity/acceleration limit barrier on subdivided control polygons
    (Energy_admm.h:98-170)."""
    hull = seg_cps(consts, spline)                         # [P,R,n,3]
    n = consts.order
    w = consts.seg_weight[None, :, None]                   # [1,R,1]

    vel = n * jnp.diff(hull, axis=2)                       # [P,R,n-1,3]
    vnorm = jnp.sqrt(jnp.sum(vel * vel, axis=-1))          # forward only
    dv = cfg.vel_limit - vnorm / (w * piece_time)
    v_inf = jnp.any(dv <= 0)
    v_act = (dv > 0) & (dv < cfg.margin)
    # recompute with AD-safe norm on the active set
    vn_safe = _safe_norm(vel, v_act)
    dv_safe = cfg.vel_limit - vn_safe / (w * piece_time)
    e_v = jnp.sum(w * _barrier(dv_safe, cfg.margin, v_act))

    acc = n * (n - 1) * jnp.diff(hull, n=2, axis=2)        # [P,R,n-2,3]
    anorm = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    da = cfg.acc_limit - anorm / (w * w * piece_time * piece_time)
    a_inf = jnp.any(da <= 0)
    a_act = (da > 0) & (da < cfg.margin)
    an_safe = _safe_norm(acc, a_act)
    da_safe = cfg.acc_limit - an_safe / (w * w * piece_time * piece_time)
    e_a = jnp.sum(w * _barrier(da_safe, cfg.margin, a_act))

    return EnergyVal(e_v + e_a, v_inf | a_inf)


def dynamic_energy(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    p_part: jnp.ndarray,
    t_part: jnp.ndarray,
) -> jnp.ndarray:
    """Jerk + time cost for one piece's true Bezier CPs (Energy_admm.h:199-215).

    p_part: [n,3] (or broadcastable batch), t_part scalar-like.
    """
    quad = jnp.einsum("...id,ij,...jd->...", p_part, consts.m_dyn, p_part)
    smooth = cfg.ks / t_part ** (2 * cfg.der - 1) * 0.5 * quad
    return smooth + cfg.kt * t_part**1.1


def consensus_terms(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    piece_time: jnp.ndarray,
    p_slack: jnp.ndarray,
    t_slack: jnp.ndarray,
    p_lambda: jnp.ndarray,
    t_lambda: jnp.ndarray,
) -> jnp.ndarray:
    """Spline-side AL coupling terms, summed over pieces (Energy_admm.h:24-41)."""
    c_spline = jnp.einsum("pij,pjd->pid", consts.convert, piece_cps(consts, spline))
    p_delta = c_spline - p_slack
    t_delta = piece_time - t_slack
    return (
        cfg.mu / 2.0 * jnp.sum(p_delta * p_delta)
        + jnp.sum(p_lambda * p_delta)
        + cfg.mu / 2.0 * jnp.sum(t_delta * t_delta)
        + jnp.sum(t_lambda * t_delta)
    )


def spline_energy(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    planes: Planes,
    spline: jnp.ndarray | None = None,
    piece_time: jnp.ndarray | None = None,
) -> EnergyVal:
    """The spline-subproblem AL objective used by the Armijo line search
    (Energy_admm.h:16-44): lam*(plane barrier + bound barrier) + AL terms.

    ``spline``/``piece_time`` default to the state's but can be overridden to
    evaluate trial points.
    """
    spline = state.spline if spline is None else spline
    piece_time = state.piece_time if piece_time is None else piece_time
    pb = plane_barrier_energy(consts, cfg, spline, planes)
    bd = bound_energy(consts, cfg, spline, piece_time)
    al = consensus_terms(
        consts, cfg, spline, piece_time,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
    )
    return EnergyVal(cfg.lam * (pb.value + bd.value) + al, pb.infeasible | bd.infeasible)


def slack_energy(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    c_spline: jnp.ndarray,   # [P,n,3] converted spline CPs (constant here)
    piece_time: jnp.ndarray,
    p_part: jnp.ndarray,     # [P,n,3] slack variables
    t_part: jnp.ndarray,     # [P]
    p_lambda: jnp.ndarray,
    t_lambda: jnp.ndarray,
) -> jnp.ndarray:
    """Per-piece slack-subproblem energies, returned as a [P] vector
    (Energy_admm.h:172-190; the reference loops pieces sequentially)."""
    quad = jnp.einsum("pid,ij,pjd->p", p_part, consts.m_dyn, p_part)
    dyn = cfg.ks / t_part ** (2 * cfg.der - 1) * 0.5 * quad + cfg.kt * t_part**1.1
    delta = c_spline - p_part
    t_delta = piece_time - t_part
    return (
        dyn
        + cfg.mu / 2.0 * jnp.sum(delta * delta, axis=(1, 2))
        + jnp.sum(p_lambda * delta, axis=(1, 2))
        + cfg.mu / 2.0 * t_delta * t_delta
        + t_lambda * t_delta
    )


def true_objective(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    piece_time: jnp.ndarray,
    planes: Planes,
) -> dict:
    """Diagnostic decomposition of the non-AL objective (Energy.h:17-46,
    printed by the reference at Optimization3D_multi.h:804-807)."""
    c_spline = jnp.einsum("pij,pjd->pid", consts.convert, piece_cps(consts, spline))
    quad = jnp.einsum("pid,ij,pjd->", c_spline, consts.m_dyn, c_spline)
    smooth = cfg.ks / piece_time ** (2 * cfg.der - 1) * 0.5 * quad
    pb = plane_barrier_energy(consts, cfg, spline, planes)
    bd = bound_energy(consts, cfg, spline, piece_time)
    return {
        "smooth": smooth,
        "barrier": cfg.lam * pb.value,
        "bound": cfg.lam * bd.value,
        "time": cfg.kt * consts.whole_weight * piece_time,
        "infeasible": pb.infeasible | bd.infeasible,
    }


class TrialTables(NamedTuple):
    """Per-iteration tables for O(elementwise) line-search energy evaluation.

    Every quantity inside `spline_energy` is affine in the trial step s
    (spline(s) = spline + s*direction, t(s) = t + s*dt), so the plane
    distances d(s) = d0 + s*dd, the vel/acc control-polygon differences, and
    the AL consensus terms (an exact quadratic a0 + a1 s + a2 s^2) can be
    precomputed ONCE per iteration; each Armijo rung then costs a masked
    elementwise pass — no per-rung hull/plane einsums (the einsums were the
    ladder stages' cost in the round-5 fused-step profile).  All leaves carry
    a leading robot axis U.
    """

    d0: jnp.ndarray      # [U,P,R,K,n] plane distances at s=0
    dd: jnp.ndarray      # [U,P,R,K,n] their derivative in s
    live: jnp.ndarray    # [U,P,R,K,1]
    vel0: jnp.ndarray    # [U,P,R,n-1,3]
    dvel: jnp.ndarray
    acc0: jnp.ndarray    # [U,P,R,n-2,3]
    dacc: jnp.ndarray
    t0: jnp.ndarray      # [U]
    dt: jnp.ndarray      # [U]
    a0: jnp.ndarray      # [U] AL quadratic coefficients
    a1: jnp.ndarray
    a2: jnp.ndarray


def build_trial_tables(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,      # leaves [U,...]
    planes: Planes,          # [U,P,R,K,...]
    directions: jnp.ndarray, # [U,T,3]
    dt: jnp.ndarray,         # [U]
) -> TrialTables:
    import jax

    hull0 = jax.vmap(lambda s: seg_cps(consts, s))(state.spline)
    dhull = jax.vmap(lambda s: seg_cps(consts, s))(directions)
    d0 = (
        jnp.einsum("uprjd,uprkd->uprkj", hull0, planes.c)
        + planes.d[..., None]
    )
    dd = jnp.einsum("uprjd,uprkd->uprkj", dhull, planes.c)
    n = consts.order
    vel0 = n * jnp.diff(hull0, axis=3)
    dvel = n * jnp.diff(dhull, axis=3)
    acc0 = n * (n - 1) * jnp.diff(hull0, n=2, axis=3)
    dacc = n * (n - 1) * jnp.diff(dhull, n=2, axis=3)

    def al_coeffs(st, dirs, dtt):
        c0 = jnp.einsum("pij,pjd->pid", consts.convert, piece_cps(consts, st.spline))
        cd = jnp.einsum("pij,pjd->pid", consts.convert, piece_cps(consts, dirs))
        d0_ = c0 - st.p_slack
        td0 = st.piece_time - st.t_slack
        a0 = (
            cfg.mu / 2.0 * jnp.sum(d0_ * d0_)
            + jnp.sum(st.p_lambda * d0_)
            + cfg.mu / 2.0 * jnp.sum(td0 * td0)
            + jnp.sum(st.t_lambda * td0)
        )
        a1 = (
            cfg.mu * jnp.sum(d0_ * cd)
            + jnp.sum(st.p_lambda * cd)
            + cfg.mu * jnp.sum(td0) * dtt
            + jnp.sum(st.t_lambda) * dtt
        )
        p_num = st.t_slack.shape[0]
        a2 = cfg.mu / 2.0 * jnp.sum(cd * cd) + cfg.mu / 2.0 * p_num * dtt**2
        return a0, a1, a2

    a0, a1, a2 = jax.vmap(al_coeffs)(state, directions, dt)
    return TrialTables(
        d0=d0, dd=dd, live=planes.mask[..., None],
        vel0=vel0, dvel=dvel, acc0=acc0, dacc=dacc,
        t0=state.piece_time, dt=dt, a0=a0, a1=a1, a2=a2,
    )


def trial_energy(
    consts: SplineConsts, cfg: TrajOptConfig, tt: TrialTables, s: jnp.ndarray
) -> jnp.ndarray:
    """[U] spline AL energies at per-robot steps ``s`` ([U] or scalar),
    +inf where infeasible — elementwise from the precomputed tables;
    identical values to `spline_energy` at spline + s*direction up to f32
    reassociation (d0 + s*dd vs (hull0 + s*dhull).c)."""
    s = jnp.broadcast_to(jnp.asarray(s, tt.t0.dtype), tt.t0.shape)
    su = s[:, None, None, None, None]
    d = tt.d0 + su * tt.dd                               # [U,P,R,K,n]
    live = tt.live
    bad = jnp.any(live & (d <= 0), axis=(1, 2, 3, 4))    # [U]
    act = live & (d > 0) & (d < cfg.margin)
    w = consts.seg_weight[None, None, :, None, None]
    e_pb = jnp.sum(w * _barrier(d, cfg.margin, act), axis=(1, 2, 3, 4))

    t = tt.t0 + s * tt.dt                                # [U]
    w3 = consts.seg_weight[None, None, :, None]
    sv = s[:, None, None, None, None]
    vel = tt.vel0 + sv * tt.dvel
    vn = jnp.sqrt(jnp.maximum(jnp.sum(vel * vel, axis=-1), 1e-30))
    dv = cfg.vel_limit - vn / (w3 * t[:, None, None, None])
    bad = bad | jnp.any(dv <= 0, axis=(1, 2, 3))
    v_act = (dv > 0) & (dv < cfg.margin)
    e_bd = jnp.sum(w3 * _barrier(dv, cfg.margin, v_act), axis=(1, 2, 3))
    acc = tt.acc0 + sv * tt.dacc
    an = jnp.sqrt(jnp.maximum(jnp.sum(acc * acc, axis=-1), 1e-30))
    da = cfg.acc_limit - an / (w3 * w3 * (t * t)[:, None, None, None])
    bad = bad | jnp.any(da <= 0, axis=(1, 2, 3))
    a_act = (da > 0) & (da < cfg.margin)
    e_bd = e_bd + jnp.sum(w3 * _barrier(da, cfg.margin, a_act), axis=(1, 2, 3))

    al = tt.a0 + tt.a1 * s + tt.a2 * s * s
    e = cfg.lam * (e_pb + e_bd) + al
    return jnp.where(bad | jnp.isnan(e), jnp.inf, e)
