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
from . import pallas_chol as pc
from . import smallchol as sc
from .gradients import N_CP

# blocks at or below this size use the fused Pallas / unrolled Cholesky
# (ops/pallas_chol.py, ops/smallchol.py); larger reduced systems fall back to
# lax's blocked factorization
_UNROLL_MAX = 64


_BT_BLOCK = 18  # 6 stored rows x 3 coords: coord bandwidth is 17 (pieces
                # share 3 stored rows), so 18-blocks make A block-tridiagonal


def _factor_block_tridiag(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of the block-banded spline KKT via a block-tridiagonal scan.

    The reference runs sparse `SimplicialLLT` on this system
    (Optimization3D_admm.h:470-475); XLA's dense Cholesky is O(ns^3) with a
    long sequential panel chain.  Here the exact structure is used: with
    18-coordinate blocks the matrix is block-tridiagonal, so L is
    block-bidiagonal and one `lax.scan` of P/2-ish 18x18 factor/solve steps
    produces the same L as the dense factorization (equal up to roundoff —
    Cholesky is unique).  Returns a dense [ns, ns] lower factor so every
    downstream solve path is unchanged.  Batch-polymorphic.
    """
    ns = a.shape[-1]
    nb = -(-ns // _BT_BLOCK)
    pad = nb * _BT_BLOCK - ns
    batch = a.shape[:-2]
    if pad:
        eye_pad = jnp.eye(ns + pad, dtype=a.dtype)[ns:]
        a = jnp.concatenate(
            [jnp.concatenate([a, jnp.zeros(batch + (ns, pad), a.dtype)], -1),
             jnp.broadcast_to(eye_pad, batch + (pad, ns + pad))],
            -2,
        )
    k = _BT_BLOCK
    blocks = a.reshape(batch + (nb, k, nb, k))
    # diagonal blocks D_b = A[bk:(b+1)k, bk:(b+1)k]; sub-diagonal E_b below
    idx = jnp.arange(nb)
    d = blocks[..., idx, :, idx, :]                      # [nb, ..., k, k]
    e = blocks[..., idx[1:], :, idx[:-1], :]             # [nb-1, ..., k, k] sub-diag
    e = jnp.concatenate([jnp.zeros_like(e[:1]), e], axis=0)

    def step(l_prev, de):
        d_b, e_b = de
        # X_b = E_b L_{b-1}^{-T}  (solve L_{b-1} X^T = E^T)
        xt = jax.scipy.linalg.solve_triangular(l_prev, e_b.swapaxes(-1, -2), lower=True)
        x = xt.swapaxes(-1, -2)
        dp = d_b - x @ x.swapaxes(-1, -2)
        l_b = jnp.linalg.cholesky(dp)
        return l_b, (l_b, x)

    l0 = jnp.broadcast_to(jnp.eye(k, dtype=a.dtype), batch + (k, k))
    _, (ls, xs) = jax.lax.scan(step, l0, (d, e))

    # write the block-bidiagonal factor back into a dense lower triangle
    full = jnp.zeros(batch + (nb * k, nb * k), dtype=a.dtype)
    full = full.reshape(batch + (nb, k, nb, k))
    full = full.at[..., idx, :, idx, :].set(ls)
    full = full.at[..., idx[1:], :, idx[:-1], :].set(xs[1:])
    full = full.reshape(batch + (nb * k, nb * k))
    return full[..., :ns, :ns]


def _factor(a: jnp.ndarray) -> jnp.ndarray:
    """Lower factor of PD(ish) blocks [..., ns, ns] (batch-polymorphic).

    Small blocks route to the fused modified-Cholesky kernels, whose GMW
    boosts engage only if f32 roundoff made a block numerically indefinite
    (the iterative-refinement round in `correct_direction` then corrects
    toward the true system).  Large systems (P >= 8 single-UAV splines) use
    the block-tridiagonal scan — the structure `SimplicialLLT` exploits in
    the reference."""
    ns = a.shape[-1]
    if ns <= _UNROLL_MAX:
        if pc.use_pallas_linalg(a.dtype):
            l, _ = pc.mod_chol(a.reshape((-1, ns, ns)))
            return l.reshape(a.shape)
        return sc.mod_cholesky(a)[0]
    return _factor_block_tridiag(a)


def _factor_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b given `_factor`'s output (batch-polymorphic)."""
    ns = l.shape[-1]
    if ns <= _UNROLL_MAX:
        if pc.use_pallas_linalg(l.dtype):
            vec = b.ndim == l.ndim - 1
            flat_b = b.reshape((-1, ns) if vec else (-1, ns, b.shape[-1]))
            return pc.chol_solve(l.reshape((-1, ns, ns)), flat_b).reshape(b.shape)
        return sc.cho_solve(l, b)
    return jax.scipy.linalg.cho_solve((l, True), b)


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
    """Robot-local factor + solves.  Batch-polymorphic: every field of
    `ReducedKKT` may carry identical leading batch dims (the multi solver
    passes the whole robot axis in one call so the Pallas factorization runs
    once over the stacked blocks instead of per-robot under vmap)."""
    # tiny relative ridge: keeps f32 Cholesky of the (PSD by construction)
    # block safely positive definite on TPU
    ns = kkt.a.shape[-1]
    ridge = 1e-6 * jnp.trace(kkt.a, axis1=-2, axis2=-1) / ns
    a = kkt.a + ridge[..., None, None] * jnp.eye(ns, dtype=kkt.a.dtype)
    rhs = jnp.stack([kkt.gs, kkt.b], axis=-1)           # [..., ns, 2]
    chol = _factor(a)
    sol = _factor_solve(chol, rhs)
    ainv_gs, ainv_b = sol[..., 0], sol[..., 1]
    schur_s = kkt.htt - jnp.einsum("...i,...i->...", kkt.b, ainv_b)
    schur_r = kkt.gt - jnp.einsum("...i,...i->...", kkt.b, ainv_gs)
    gnorm = jnp.sqrt(jnp.sum(kkt.gs**2, axis=-1) + kkt.gt**2)
    return LocalSolve(ainv_gs, ainv_b, schur_s, schur_r, gnorm, chol)


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
    that into an astronomically large (and wrong) time step.

    Batch-polymorphic: ``ls`` may carry leading batch dims; the Schur scalars
    broadcast against them (coupled mode passes psum'd scalars), and ``dt``
    is returned broadcast to the batch shape."""
    s = jnp.maximum(schur_s_total, 1e-5 * jnp.maximum(jnp.abs(schur_s_total), 1.0))
    dt = jnp.broadcast_to(-schur_r_total / s, ls.ainv_gs.shape[:-1])
    ds = -ls.ainv_gs - dt[..., None] * ls.ainv_b
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
    Batch-polymorphic like `local_solve`.
    """
    r_s = (
        jnp.einsum("...ij,...j->...i", red.a, ds)
        + red.b * dt[..., None]
        + red.gs
    )
    r_t = jnp.einsum("...i,...i->...", red.b, ds) + red.htt * dt + red.gt
    ainv_rs = _factor_solve(ls.chol, r_s)
    return r_s, r_t, ainv_rs


def spread_direction(consts: SplineConsts, ds: jnp.ndarray) -> jnp.ndarray:
    """[ns] free-coordinate direction -> [T,3] stored-row direction (pinned
    rows zero), matching Optimization3D_admm.h:486-493."""
    t = consts.trajectory_num
    d = jnp.zeros((t, 3), dtype=ds.dtype)
    return d.at[2 : t - 2].set(ds.reshape(t - 4, 3))
