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
