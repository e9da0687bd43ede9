"""Reduced arrowhead KKT assembly and Schur-complement Newton solve.

The spline Newton system couples all free control-point coordinates (a
block-banded matrix: adjacent pieces share 3 stored rows) with one scalar
time variable — an arrowhead.  The reference assembles a dense (3T+1)^2 matrix
and runs a sparse Cholesky (`Optimization3D_admm.h:400-503`); here assembly is
one scatter-add of the [P,19,19] piece blocks and the solve is a dense
Cholesky of the spline block with a Schur complement on the time scalar:

    [A  b] [ds]   [gs]          s   = h_tt - b^T A^-1 b
    [b^T c] [dt] = -[gt]   =>   dt  = -(gt - b^T A^-1 gs) / s
                                ds  = -A^-1 gs - dt * A^-1 b

Under robot sharding the coupled-time variant (Optimization3D_multi.h:508-557)
sums ``s`` and the dt numerator across robots — one psum — while every robot's
``A`` solve stays local.  This is the consensus communication point called out
in SURVEY.md §2.3.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import SplineConsts
from .gradients import N_CP


class ReducedKKT(NamedTuple):
    """Per-robot reduced system pieces (free spline coords + time scalar)."""

    a: jnp.ndarray     # [ns, ns] spline block (SPD after per-piece repair)
    b: jnp.ndarray     # [ns]     time coupling column
    gs: jnp.ndarray    # [ns]     spline gradient
    gt: jnp.ndarray    # []       time gradient
    htt: jnp.ndarray   # []       time diagonal


def free_coord_indices(consts: SplineConsts) -> jnp.ndarray:
    """[P, 18] flat free-DOF index per piece-local coordinate.

    Stored row r is free iff 2 <= r <= T-3 (two pinned rows at each end,
    Optimization3D_admm.h:429-441); pinned coords map to the dummy slot ``ns``
    so scatter-adds into an (ns+1)-padded buffer drop them.
    """
    t = consts.trajectory_num
    ns = 3 * (t - 4)
    rows = consts.piece_idx                       # [P, n]
    free_row = rows - 2
    ok = (rows >= 2) & (rows <= t - 3)
    flat = 3 * free_row[..., None] + jnp.arange(3)  # [P, n, 3]
    flat = jnp.where(ok[..., None], flat, ns)
    return flat.reshape(consts.piece_num, 3 * N_CP)


def assemble_reduced(
    consts: SplineConsts, g: jnp.ndarray, h: jnp.ndarray
) -> ReducedKKT:
    """Scatter-add [P,19] grads and [P,19,19] Hessians into the reduced system."""
    t = consts.trajectory_num
    ns = 3 * (t - 4)
    ix = free_coord_indices(consts)               # [P, 18]

    g_cp, g_t = g[:, : 3 * N_CP], g[:, 3 * N_CP]
    h_cp = h[:, : 3 * N_CP, : 3 * N_CP]
    h_ct = h[:, : 3 * N_CP, 3 * N_CP]
    h_tt = h[:, 3 * N_CP, 3 * N_CP]

    a = (
        jnp.zeros((ns + 1, ns + 1), dtype=h.dtype)
        .at[ix[:, :, None], ix[:, None, :]]
        .add(h_cp)[:ns, :ns]
    )
    b = jnp.zeros(ns + 1, dtype=h.dtype).at[ix].add(h_ct)[:ns]
    gs = jnp.zeros(ns + 1, dtype=g.dtype).at[ix].add(g_cp)[:ns]
    return ReducedKKT(a=a, b=b, gs=gs, gt=g_t.sum(), htt=h_tt.sum())


class LocalSolve(NamedTuple):
    """Robot-local solve results; enough to finish either time mode."""

    ainv_gs: jnp.ndarray   # [ns]
    ainv_b: jnp.ndarray    # [ns]
    schur_s: jnp.ndarray   # [] h_tt - b^T A^-1 b
    schur_r: jnp.ndarray   # [] gt  - b^T A^-1 gs
    gnorm: jnp.ndarray     # [] norm of the full reduced gradient
    chol: jnp.ndarray      # [ns, ns] Cholesky factor of A (upper, cho_factor)


def local_solve(kkt: ReducedKKT) -> LocalSolve:
    # tiny relative ridge: keeps f32 Cholesky of the (PSD by construction)
    # block safely positive definite on TPU
    ns = kkt.a.shape[0]
    ridge = 1e-6 * jnp.trace(kkt.a) / ns
    kkt = kkt._replace(a=kkt.a + ridge * jnp.eye(ns, dtype=kkt.a.dtype))
    chol = jax.scipy.linalg.cho_factor(kkt.a)
    rhs = jnp.stack([kkt.gs, kkt.b], axis=-1)
    sol = jax.scipy.linalg.cho_solve(chol, rhs)
    ainv_gs, ainv_b = sol[:, 0], sol[:, 1]
    schur_s = kkt.htt - kkt.b @ ainv_b
    schur_r = kkt.gt - kkt.b @ ainv_gs
    gnorm = jnp.sqrt(jnp.sum(kkt.gs**2) + kkt.gt**2)
    return LocalSolve(ainv_gs, ainv_b, schur_s, schur_r, gnorm, chol[0])


def finish_direction(
    ls: LocalSolve,
    schur_s_total: jnp.ndarray,
    schur_r_total: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complete the Newton direction given (possibly psum-reduced) Schur
    scalars.  Decoupled/single-robot passes the local scalars; coupled passes
    the across-robot sums.

    The floor on ``s`` is relative: f32 cancellation in ``htt - b^T A^-1 b``
    can make the raw scalar tiny or negative, and a 1e-12 floor would turn
    that into an astronomically large (and wrong) time step."""
    s = jnp.maximum(schur_s_total, 1e-5 * jnp.maximum(jnp.abs(schur_s_total), 1.0))
    dt = -schur_r_total / s
    ds = -ls.ainv_gs - dt * ls.ainv_b
    return ds, dt


def correct_direction(
    red: ReducedKKT,
    ls: LocalSolve,
    ds: jnp.ndarray,
    dt: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One iterative-refinement residual for the arrowhead system.

    Returns (r_s, r_t_local, ainv_rs): the spline residual, this robot's
    contribution to the scalar time-row residual (sum/psum across robots in
    coupled mode), and A^-1 r_s.  The correction then reuses
    `finish_direction` with (r_s, r_t) in place of the gradient.  One round
    recovers the ~6 digits f32 loses on ill-conditioned blocks — without it
    the Schur scalar can go negative and Armijo accepts a non-descent step.
    """
    r_s = red.a @ ds + red.b * dt + red.gs
    r_t = red.b @ ds + red.htt * dt + red.gt
    ainv_rs = jax.scipy.linalg.cho_solve((ls.chol, False), r_s)
    return r_s, r_t, ainv_rs


def spread_direction(consts: SplineConsts, ds: jnp.ndarray) -> jnp.ndarray:
    """[ns] free-coordinate direction -> [T,3] stored-row direction (pinned
    rows zero), matching Optimization3D_admm.h:486-493."""
    t = consts.trajectory_num
    d = jnp.zeros((t, 3), dtype=ds.dtype)
    return d.at[2 : t - 2].set(ds.reshape(t - 4, 3))
