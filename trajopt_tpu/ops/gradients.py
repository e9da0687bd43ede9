"""Per-piece Newton blocks: local AL energies, autodiff grad/Hessian, and the
batched PSD repair.

The reference hand-derives every gradient/Hessian with Eigen rank updates
(`HighOrderCCD/Gradient_admm.h`).  Here each piece's 19-variable local energy
(18 control-point coordinates + 1 time) is differentiated with
``jax.grad`` / forward-over-reverse ``jax.jacfwd(jax.grad(...))`` and vmapped
over pieces — the per-piece PSD projection (Gradient_admm.h:40-53, load-bearing
for SPD-ness of the assembled KKT) becomes one batched ``eigh`` spectrum shift.

Sizes are tiny (19x19 per piece); the win on TPU is batching across
pieces x robots x scenarios, not per-block cleverness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TrajOptConfig
from ..types import Planes, SplineConsts
from . import energies as en
from . import smallchol as sc

N_CP = 6        # order + 1
N_LOC = 19      # 18 CP coords + shared time


class PieceData(NamedTuple):
    """Per-piece slices of constants and ADMM state (vmap leading axis P)."""

    seg_basis: jnp.ndarray   # [R, n, n]
    seg_weight: jnp.ndarray  # [R]
    convert: jnp.ndarray     # [n, n]
    plane_c: jnp.ndarray     # [R, K, 3]
    plane_d: jnp.ndarray     # [R, K]
    plane_mask: jnp.ndarray  # [R, K]
    p_slack: jnp.ndarray     # [n, 3]
    p_lambda: jnp.ndarray    # [n, 3]
    t_slack: jnp.ndarray     # []
    t_lambda: jnp.ndarray    # []


def gather_piece_data(
    consts: SplineConsts,
    planes: Planes,
    p_slack: jnp.ndarray,
    t_slack: jnp.ndarray,
    p_lambda: jnp.ndarray,
    t_lambda: jnp.ndarray,
) -> PieceData:
    p = consts.piece_num
    return PieceData(
        seg_basis=consts.seg_basis,
        seg_weight=jnp.broadcast_to(consts.seg_weight, (p, consts.res)),
        convert=consts.convert,
        plane_c=planes.c,
        plane_d=planes.d,
        plane_mask=planes.mask,
        p_slack=p_slack,
        p_lambda=p_lambda,
        t_slack=t_slack,
        t_lambda=t_lambda,
    )


def local_spline_energy(
    x: jnp.ndarray, data: PieceData, cfg: TrajOptConfig
) -> jnp.ndarray:
    """One piece's spline-subproblem AL energy as a function of its 19 local
    variables (Gradient_admm.h:67-164 `local_spline_gradient`'s integrand).

    Masked (never infinite) so that it is safely differentiable; feasibility is
    enforced by the line search, not here.
    """
    cp = x[: 3 * N_CP].reshape(N_CP, 3)
    piece_time = x[3 * N_CP]
    hull = jnp.einsum("rij,jd->rid", data.seg_basis, cp)        # [R,n,3]
    w = data.seg_weight                                          # [R]

    # --- plane barrier (lambda-weighted) --------------------------------
    d = (
        jnp.einsum("rjd,rkd->rkj", hull, data.plane_c)
        + data.plane_d[..., None]
    )                                                            # [R,K,n]
    act = data.plane_mask[..., None] & (d > 0) & (d < cfg.margin)
    e_pb = jnp.sum(w[:, None, None] * en._barrier(d, cfg.margin, act))

    # --- velocity / acceleration bounds ---------------------------------
    n = N_CP - 1
    vel = n * jnp.diff(hull, axis=1)                             # [R,n-1,3]
    wv = w[:, None]
    vn_raw = jnp.sqrt(jnp.sum(vel * vel, axis=-1))
    dv_raw = cfg.vel_limit - vn_raw / (wv * piece_time)
    v_act = (dv_raw > 0) & (dv_raw < cfg.margin)
    vn = en._safe_norm(vel, v_act)
    dv = cfg.vel_limit - vn / (wv * piece_time)
    e_bd = jnp.sum(wv * en._barrier(dv, cfg.margin, v_act))

    acc = n * (n - 1) * jnp.diff(hull, n=2, axis=1)              # [R,n-2,3]
    an_raw = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
    da_raw = cfg.acc_limit - an_raw / (wv * wv * piece_time * piece_time)
    a_act = (da_raw > 0) & (da_raw < cfg.margin)
    an = en._safe_norm(acc, a_act)
    da = cfg.acc_limit - an / (wv * wv * piece_time * piece_time)
    e_bd = e_bd + jnp.sum(wv * en._barrier(da, cfg.margin, a_act))

    # --- AL consensus coupling ------------------------------------------
    delta = data.convert @ cp - data.p_slack
    t_delta = piece_time - data.t_slack
    al = (
        cfg.mu / 2.0 * jnp.sum(delta * delta)
        + jnp.sum(data.p_lambda * delta)
        + cfg.mu / 2.0 * t_delta * t_delta
        + data.t_lambda * t_delta
    )
    return cfg.lam * (e_pb + e_bd) + al


def local_slack_energy(
    x: jnp.ndarray,
    c_spline: jnp.ndarray,   # [n,3] converted spline CPs (constant)
    piece_time: jnp.ndarray,
    p_lambda: jnp.ndarray,
    t_lambda: jnp.ndarray,
    m_dyn: jnp.ndarray,
    cfg: TrajOptConfig,
) -> jnp.ndarray:
    """One piece's slack-subproblem energy over its 19 local variables
    (Energy_admm.h:172-190 / Gradient_admm.h:574-622)."""
    p_part = x[: 3 * N_CP].reshape(N_CP, 3)
    t_part = x[3 * N_CP]
    quad = jnp.einsum("id,ij,jd->", p_part, m_dyn, p_part)
    dyn = cfg.ks / t_part ** (2 * cfg.der - 1) * 0.5 * quad + cfg.kt * t_part**1.1
    delta = c_spline - p_part
    t_delta = piece_time - t_part
    return (
        dyn
        + cfg.mu / 2.0 * jnp.sum(delta * delta)
        + jnp.sum(p_lambda * delta)
        + cfg.mu / 2.0 * t_delta * t_delta
        + t_lambda * t_delta
    )


def grad_and_hess(fn, x, *args):
    """Gradient and forward-over-reverse Hessian of a scalar function."""
    g = jax.grad(fn)(x, *args)
    h = jax.jacfwd(jax.grad(fn))(x, *args)
    return g, h


def _barrier_d12(d, margin, act):
    """Elementwise (b'(d), b''(d)) of the IPC barrier -(d-m)^2 log(d/m),
    zeroed outside ``act`` (Gradient_admm.h:380-384 e1/e2)."""
    ds = jnp.where(act, d, margin)
    ln = jnp.log(ds / margin)
    dm = ds - margin
    b1 = -2.0 * dm * ln - dm * dm / ds
    b2 = -2.0 * ln - 4.0 * dm / ds + dm * dm / (ds * ds)
    zero = jnp.zeros_like(ds)
    return jnp.where(act, b1, zero), jnp.where(act, b2, zero)


def analytic_spline_gh(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    xs: jnp.ndarray,        # [P,19]
    data: PieceData,        # leaves with leading P
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form batched gradient/Hessian of `local_spline_energy`.

    The autodiff route (`jacfwd(grad)`) re-traces the whole energy graph per
    tangent — hundreds of small fused kernels per step on TPU.  Every term
    here is either linear (plane distances, AL) or a norm of a linear map
    (vel/acc) in the 18 CP coordinates, so the exact Hessian collapses to a
    handful of einsums over [P,R,K,n] (the reference hand-derives the same
    rank structure, Gradient_admm.h:331-572).  Validated against autodiff at
    f64 in tests/test_energies_gradients.py.
    """
    p_num, _ = xs.shape
    n = N_CP - 1
    cp = xs[:, : 3 * N_CP].reshape(p_num, N_CP, 3)
    t = xs[:, 3 * N_CP]                                   # [P]
    B = data.seg_basis                                    # [P,R,n_cp,n_cp]
    w = data.seg_weight                                   # [P,R]
    lam = cfg.lam
    eye3 = jnp.eye(3, dtype=xs.dtype)

    hull = jnp.einsum("prji,pid->prjd", B, cp)            # [P,R,n,3]

    # ---- plane barrier:  d = hull . c + d0 (LINEAR in cp) ---------------
    d = (
        jnp.einsum("prjd,prkd->prkj", hull, data.plane_c)
        + data.plane_d[..., None]
    )                                                     # [P,R,K,n]
    act = data.plane_mask[..., None] & (d > 0) & (d < cfg.margin)
    b1, b2 = _barrier_d12(d, cfg.margin, act)
    wk = w[:, :, None, None]
    e1 = lam * wk * b1
    e2 = lam * wk * b2
    c = data.plane_c                                      # [P,R,K,3]
    g_cp = jnp.einsum("prkj,prji,prkd->pid", e1, B, c)
    # contract the plane axis K FIRST: e_cc [P,R,n,3,3] costs P*R*n*9*K MACs
    # and the basis contraction P*R*n*36*9 — ~2.3x fewer FLOPs than the
    # round-4 order (m_iq [P,R,K,n,n] then a K-contraction), and it avoids
    # materializing the [U,P,R,K,6,6] intermediate that led the round-5
    # fused-step device profile (fusion "prkiq,prkd,prke", 0.32 ms/iter)
    e_cc = jnp.einsum("prkj,prkd,prke->prjde", e2, c, c)
    h_cp = jnp.einsum("prji,prjq,prjde->pidqe", B, B, e_cc)

    g_t = jnp.zeros((p_num,), xs.dtype)
    h_tt = jnp.zeros((p_num,), xs.dtype)
    h_cpt = jnp.zeros((p_num, N_CP, 3), xs.dtype)

    # ---- velocity / acceleration bounds:  norm of a LINEAR map ----------
    def bound_terms(lin_basis, lin_val, s, ds_dt_factor, d2s_tt_factor, limit):
        """Shared vel/acc assembly.

        lin_basis: [P,R,A,n_cp] rows of the linear map; lin_val [P,R,A,3];
        s: [P,R] scale with  d = limit - |v|*s;  ds_dt_factor: ds/dt = -f*s/t
        (f=1 vel, f=2 acc);  d2s_tt_factor: d2(|v|s)/dt2 = g*|v|s/t^2
        (g=2 vel, g=6 acc)."""
        vn_raw = jnp.sqrt(jnp.sum(lin_val * lin_val, axis=-1))     # [P,R,A]
        sv = s[:, :, None]
        dv_raw = limit - vn_raw * sv
        a_act = (dv_raw > 0) & (dv_raw < cfg.margin)
        vn = jnp.where(a_act, jnp.maximum(vn_raw, 1e-30), 1.0)
        u = lin_val / vn[..., None]
        dv = limit - vn * sv
        b1, b2 = _barrier_d12(dv, cfg.margin, a_act)
        e1 = lam * w[:, :, None] * b1
        e2 = lam * w[:, :, None] * b2
        f = ds_dt_factor
        tt = t[:, None, None]
        # gradient
        g_cp = jnp.einsum("pra,prad,prai->pid", -e1 * sv, u, lin_basis)
        g_t = jnp.sum(e1 * f * vn * sv / tt, axis=(1, 2))
        # cp-cp block:  e2 s^2 uu^T + e1 s/vn (uu^T - I)
        cA = e2 * sv * sv + e1 * sv / vn
        cB = -e1 * sv / vn
        # MXU shape: the rank-1 uu^T part is one batched [P, 18, RA]x[P, RA,
        # 18] matmul of M1 = cA*basis_i*u_d against M2 = basis_q*u_e (the
        # 5-operand einsum lowered to ~80 GFLOP/s VPU convolutions in the
        # round-5 fused-step profile)
        pnum, rr, aa, ncp = lin_basis.shape
        m1 = jnp.einsum("pra,prai,prad->praid", cA, lin_basis, u)
        m2 = jnp.einsum("praq,prae->praqe", lin_basis, u)
        h_cp = jnp.einsum(
            "prax,pray->pxy",
            m1.reshape(pnum, rr, aa, ncp * 3),
            m2.reshape(pnum, rr, aa, ncp * 3),
        ).reshape(pnum, ncp, 3, ncp, 3)
        h_cp = h_cp + jnp.einsum(
            "pra,prai,praq,de->pidqe", cB, lin_basis, lin_basis, eye3
        )
        # cp-t block:  e2 (-s u)(f vn s/t) + e1 (f s/t) u
        cT = (-e2 * f * vn * sv * sv + e1 * f * sv) / tt
        h_cpt = jnp.einsum("pra,prad,prai->pid", cT, u, lin_basis)
        # t-t:  e2 (f vn s/t)^2 - e1 * g * vn s/t^2
        h_tt = jnp.sum(
            e2 * (f * vn * sv / tt) ** 2
            - e1 * d2s_tt_factor * vn * sv / (tt * tt),
            axis=(1, 2),
        )
        return g_cp, g_t, h_cp, h_cpt, h_tt

    vel_basis = n * (B[:, :, 1:, :] - B[:, :, :-1, :])     # [P,R,n-1,n_cp]
    vel = jnp.einsum("prai,pid->prad", vel_basis, cp)
    s_v = 1.0 / (w * t[:, None])
    gv, gvt, hv, hvt, hvtt = bound_terms(vel_basis, vel, s_v, 1.0, 2.0, cfg.vel_limit)

    acc_basis = (n - 1) * (vel_basis[:, :, 1:, :] - vel_basis[:, :, :-1, :])
    acc = jnp.einsum("prai,pid->prad", acc_basis, cp)
    s_a = 1.0 / (w * w * t[:, None] * t[:, None])
    ga, gat, ha, hat, hatt = bound_terms(acc_basis, acc, s_a, 2.0, 6.0, cfg.acc_limit)

    g_cp = g_cp + gv + ga
    g_t = g_t + gvt + gat
    h_cp = h_cp + hv + ha
    h_cpt = h_cpt + hvt + hat
    h_tt = h_tt + hvtt + hatt

    # ---- AL consensus coupling (quadratic) ------------------------------
    delta = jnp.einsum("pji,pid->pjd", data.convert, cp) - data.p_slack
    g_cp = g_cp + jnp.einsum(
        "pji,pjd->pid", data.convert, cfg.mu * delta + data.p_lambda
    )
    h_cp = h_cp + cfg.mu * jnp.einsum(
        "pji,pjq,de->pidqe", data.convert, data.convert, eye3
    )
    g_t = g_t + cfg.mu * (t - data.t_slack) + data.t_lambda
    h_tt = h_tt + cfg.mu

    # ---- assemble [P,19] / [P,19,19] ------------------------------------
    g = jnp.concatenate([g_cp.reshape(p_num, 3 * N_CP), g_t[:, None]], axis=1)
    h18 = h_cp.reshape(p_num, 3 * N_CP, 3 * N_CP)
    hct = h_cpt.reshape(p_num, 3 * N_CP)
    h = jnp.zeros((p_num, N_LOC, N_LOC), xs.dtype)
    h = h.at[:, : 3 * N_CP, : 3 * N_CP].set(h18)
    h = h.at[:, : 3 * N_CP, 3 * N_CP].set(hct)
    h = h.at[:, 3 * N_CP, : 3 * N_CP].set(hct)
    h = h.at[:, 3 * N_CP, 3 * N_CP].set(h_tt)
    return g, h


_LADDER_RUNGS = 13     # nonzero rungs spanning _LADDER_DECADES below Gershgorin
_LADDER_DECADES = 6.0  # G can overestimate -lambda_min by 1e4+ on real blocks
_LADDER_BISECT = 3     # geometric-bisection refinements of the bracketing rungs


def psd_repair_ladder(h: jnp.ndarray) -> jnp.ndarray:
    """PSD repair via a parallel Cholesky shift ladder (TPU-fast `psd_repair`).

    The reference shifts indefinite blocks by ``-lambda_min + 0.01`` computed
    with a dense eigensolver (Gradient_admm.h:44-53).  XLA's batched 19x19
    ``eigh`` profiles at ~44% of the whole ADMM iteration on TPU, so instead
    we factor ``H + s_j*I`` for a geometric ladder of candidate shifts — all
    in ONE batched Cholesky (an indefinite input yields NaNs, not an error) —
    then refine the bracketing pair of rungs with a few geometric-bisection
    Cholesky steps.  Rungs are scaled by the per-block Gershgorin bound
    ``G = max(0, -min_i(h_ii - sum|h_ij|))``: the needed shift is at most
    ``G``, so the top rung (= G) always succeeds, and on real blocks G
    overestimates ``-lambda_min`` by up to ~3e4, hence the 6-decade span
    (the floor rung G*1e-6 is a <=1e-6 *relative* perturbation of H — inert
    for the Newton step).  Guarantees:

    * PD blocks get shift 0 (exactly the reference's no-repair path);
    * repaired blocks are PD by construction (verified by the factorization
      itself, not an estimate), over-shifted by at most
      ``10^(DECADES/(RUNGS-1)/2^BISECT)`` ≈ 1.16x vs the minimal
      Cholesky-accepted shift, plus the reference's +0.01 floor.
    """
    m = h.shape[-1]
    eye = jnp.eye(m, dtype=h.dtype)
    ldiag_idx = (..., jnp.arange(m), jnp.arange(m))

    def chol_ok(mat):  # [..., m, m] -> [...] bool: is mat numerically PD?
        # unrolled factorization: XLA's while-loop cholesky costs ~1 ms per
        # call on TPU at these block sizes (see ops/smallchol.py)
        ld = sc.cholesky(mat)[ldiag_idx]
        return jnp.all(jnp.isfinite(ld) & (ld > 0), axis=-1)

    diag = jnp.diagonal(h, axis1=-2, axis2=-1)
    offsum = jnp.sum(jnp.abs(h), axis=-1) - jnp.abs(diag)
    gersh = jnp.maximum(-jnp.min(diag - offsum, axis=-1), 1e-30)  # >= -lambda_min
    ratio = 10.0 ** (_LADDER_DECADES / (_LADDER_RUNGS - 1))
    expo = jnp.arange(1 - _LADDER_RUNGS, 1, dtype=h.dtype) * (
        _LADDER_DECADES / (_LADDER_RUNGS - 1)
    )                                                           # -DECADES..0
    shifts = jnp.concatenate(
        [jnp.zeros(1, h.dtype), 10.0 ** expo]
    ) * gersh[..., None]                                        # [..., S+1]
    trial = h[..., None, :, :] + shifts[..., None, None] * eye  # [..., S+1, m, m]
    ok = chol_ok(trial)                                         # [..., S+1]
    first = jnp.argmax(ok, axis=-1)                             # smallest PD rung
    hi = jnp.take_along_axis(shifts, first[..., None], axis=-1)[..., 0]
    # measure-zero degeneracy: H + G*I numerically singular -> bump past bound
    hi = jnp.where(jnp.any(ok, axis=-1), hi, 1.1 * gersh)
    # Refine within (hi/ratio, hi]: geometric bisection, one batched Cholesky
    # per step.  Skip blocks already settled (PD at rung 0 or floor rung 1 —
    # their shift is 0 or a <=1e-6 relative perturbation).
    refine = first > 1
    lo = hi / ratio
    for _ in range(_LADDER_BISECT):
        mid = jnp.sqrt(lo * hi)
        mid_ok = chol_ok(h + jnp.where(refine, mid, gersh)[..., None, None] * eye)
        hi = jnp.where(refine & mid_ok, mid, hi)
        lo = jnp.where(refine & ~mid_ok, mid, lo)
    # zero shift iff rung 0 (shift 0) itself factorized: on all-fail blocks
    # first==0 too (argmax of all-False), but ok[...,0] is False there, so the
    # 1.1*gersh degeneracy bump in ``hi`` is kept instead of discarded.
    shift = jnp.where(ok[..., 0], 0.0, hi)
    shift = jnp.where(shift > 0, shift + 0.01, 0.0)             # reference floor
    return h + shift[..., None, None] * eye


def psd_repair_gmw(h: jnp.ndarray) -> jnp.ndarray:
    """PSD repair by GMW-style modified Cholesky (the TPU default).

    One fused factorization pass produces the diagonal boosts e >= 0 with
    ``h + diag(e)`` PD by construction and e == 0 on comfortably-PD blocks —
    the reference's no-repair path (Gradient_admm.h:40-53 shifts only on
    Cholesky failure).  Unlike `psd_repair`'s spectral shift the modification
    is per-diagonal-entry; measured r2: ~0.04 ms fused at [256,19,19] vs
    ~4 ms for the eigh shift and ~9 ms for the Cholesky ladder (XLA's eigh /
    cholesky lowerings are launch-bound at tiny block sizes).
    """
    from . import pallas_chol as pc

    m = h.shape[-1]
    if pc.use_pallas_linalg(h.dtype) and m <= pc.MAX_M:
        flat = h.reshape((-1, m, m))
        _, e = pc.mod_chol(flat)
        e = e.reshape(h.shape[:-1])
    else:
        _, e = sc.mod_cholesky(h)
    return h + e[..., None] * jnp.eye(m, dtype=h.dtype)


def psd_repair(h: jnp.ndarray) -> jnp.ndarray:
    """Batched spectrum shift: if min eigenvalue < 0, ``h - w_min I + 0.01 I``.

    Exactly the reference's repair on Cholesky failure
    (Gradient_admm.h:44-53, Optimization3D_admm.h:316-327), applied
    unconditionally via one batched eigh (cheap at 19x19).

    NaN-proofed for TPU: if eigh fails to produce finite eigenvalues for a
    block, fall back to a Gershgorin-bound shift for that block (loose but
    always sufficient), so a bad eigh can only over-damp, never poison.
    """
    w = jnp.linalg.eigvalsh(h)
    wmin = w[..., 0]
    diag = jnp.diagonal(h, axis1=-2, axis2=-1)
    offdiag = jnp.sum(jnp.abs(h), axis=-1) - jnp.abs(diag)
    gersh = jnp.min(diag - offdiag, axis=-1)
    wmin = jnp.where(jnp.isfinite(wmin), wmin, gersh)
    shift = jnp.where(wmin < 0, -wmin + 0.01, 0.0)
    eye = jnp.eye(h.shape[-1], dtype=h.dtype)
    return h + shift[..., None, None] * eye


def piece_grads_and_hessians(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    spline: jnp.ndarray,
    piece_time: jnp.ndarray,
    planes: Planes,
    p_slack: jnp.ndarray,
    t_slack: jnp.ndarray,
    p_lambda: jnp.ndarray,
    t_lambda: jnp.ndarray,
    repair: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[P,19] gradients and PSD-repaired [P,19,19] Hessians of the spline
    subproblem (reference: `global_spline_gradient`, Gradient_admm.h:13-65)."""
    cps = en.piece_cps(consts, spline)                    # [P,n,3]
    xs = jnp.concatenate(
        [cps.reshape(consts.piece_num, 3 * N_CP),
         jnp.broadcast_to(piece_time, (consts.piece_num,))[:, None]],
        axis=1,
    )                                                      # [P,19]
    data = gather_piece_data(consts, planes, p_slack, t_slack, p_lambda, t_lambda)

    if getattr(cfg, "grad_mode", "analytic") == "analytic":
        g, h = analytic_spline_gh(consts, cfg, xs, data)
    else:
        def one(x, d):
            return grad_and_hess(local_spline_energy, x, d, cfg)

        g, h = jax.vmap(one)(xs, data)
    if not repair:
        return g, h
    return g, apply_psd_repair(cfg, h)


def apply_psd_repair(cfg: TrajOptConfig, h: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on ``cfg.psd_method`` ("gmw" default | "eigh" | "ladder")."""
    if cfg.psd_method == "eigh":
        return psd_repair(h)
    if cfg.psd_method == "ladder":
        return psd_repair_ladder(h)
    return psd_repair_gmw(h)
