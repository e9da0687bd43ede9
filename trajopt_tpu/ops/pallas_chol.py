"""Pallas TPU kernels: batched modified Cholesky (GMW-style) + triangular solves.

The solver factorizes thousands of tiny SPD-ish blocks per iteration (19x19
per-piece Newton blocks, the 3(T-4) reduced spline KKT).  XLA's `cholesky` /
`eigh` lowerings cost ~1-9 ms per call at these sizes on TPU (while-loop
algorithms, launch-bound — measured r2), and an unrolled jnp version is still
~0.9 ms because each of the m dependent steps becomes its own micro-kernel.
Here the whole factorization runs inside ONE kernel: the block axis lives on
the 128-wide lane dimension (layout per `pallas_gjk.py`), the matrix on
sublanes/leading dims, and the m-step recurrence is unrolled in-kernel as
[m, LANES]-wide VPU ops.

`mod_chol` additionally performs the PSD repair in the same pass via
GMW81-style diagonal boosting (Gill-Murray-Wright, "Practical Optimization"):
pivot j is raised to max(|d_j|, (theta_j/beta)^2, delta), which guarantees
  * PD output `h + diag(e)` by construction (all pivots >= delta > 0),
  * bounded factor growth (|l_ij| <= beta),
  * e = 0 for comfortably-PD blocks — exactly the reference's no-repair path
    (Gradient_admm.h:40-53 only shifts on Cholesky failure).
This replaces the reference's "-lambda_min + 0.01" eigensolver shift with a
diagonal (not spectral) modification — same role, one fused pass, no eigh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# largest block size routed to these kernels (VMEM: [m, m, 128] f32 <= ~2 MB)
MAX_M = 64


def use_pallas_linalg(dtype) -> bool:
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def _chol_kernel(a_ref, l_ref, e_ref, *, m: int, gmw: bool):
    a = a_ref[:]                                        # [m, m, L]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 0)
    eps = jnp.float32(1.19e-7)

    if gmw:
        diag = jnp.stack([a[i, i, :] for i in range(m)], axis=0)  # [m, L]
        gamma = jnp.max(jnp.abs(diag), axis=0)          # [L]
        offmax = jnp.max(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (m, m, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (m, m, LANES), 1),
                jnp.float32(0.0),
                jnp.abs(a),
            ),
            axis=(0, 1),
        )                                               # [L]
        nf = jnp.float32(max((m * m - 1) ** 0.5, 1.0))
        beta2 = jnp.maximum(jnp.maximum(gamma, offmax / nf), eps)
        delta = eps * jnp.maximum(gamma + offmax, jnp.float32(1.0))

    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m, LANES), 1)
    l = jnp.zeros((m, m, LANES), jnp.float32)
    e = jnp.zeros((m, LANES), jnp.float32)
    for j in range(m):
        dorig = a[j, j, :]                              # [L]
        colfull = a[:, j, :]                            # [m, L]
        below = jnp.where(rows > j, colfull, jnp.float32(0.0))
        if gmw:
            theta = jnp.max(jnp.abs(below), axis=0)     # [L]
            dnew = jnp.maximum(
                jnp.maximum(jnp.abs(dorig), theta * theta / beta2), delta
            )
            e = jnp.where(rows == j, (dnew - dorig)[None, :], e)
        else:
            dnew = dorig                                # plain chol: NaN if <=0
        piv = jnp.sqrt(dnew)
        col = below / piv
        lcol = col + jnp.where(rows == j, piv, jnp.float32(0.0))
        # one-hot column select (scatter is not lowerable on TPU Pallas)
        l = jnp.where(cols_iota == j, lcol[:, None, :], l)
        if j < m - 1:
            a = a - col[:, None, :] * col[None, :, :]
    l_ref[:] = l
    e_ref[:] = e


def _solve_kernel(l_ref, b_ref, x_ref, *, m: int, k: int):
    """Solve L L^T x = b for one lane-tile: l [m,m,L], b/x [m,k,L]."""
    lmat = l_ref[:]
    b = b_ref[:]
    inv_diag = [jnp.float32(1.0) / lmat[i, i, :] for i in range(m)]
    ys = []
    for i in range(m):
        acc = b[i]                                      # [k, L]
        for jj in range(i):
            acc = acc - lmat[i, jj, :][None, :] * ys[jj]
        ys.append(acc * inv_diag[i][None, :])
    xs = [None] * m
    for i in range(m - 1, -1, -1):
        acc = ys[i]
        for jj in range(i + 1, m):
            acc = acc - lmat[jj, i, :][None, :] * xs[jj]
        xs[i] = acc * inv_diag[i][None, :]
    x_ref[:] = jnp.stack(xs, axis=0)                    # [m, k, L]


def _pad_lanes(x: jnp.ndarray, fill: float = 0.0) -> tuple[jnp.ndarray, int]:
    """[B, ...] -> [Bp, ...] padded to a LANES multiple."""
    b = x.shape[0]
    bp = -(-b // LANES) * LANES
    if bp == b:
        return x, b
    pad = jnp.full((bp - b,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0), b


def mod_chol(h: jnp.ndarray, gmw: bool = True):
    """Batched (modified) Cholesky.

    h: [B, m, m] float32 -> (l [B, m, m] lower, e [B, m] diagonal boosts).
    With ``gmw=True``, ``l @ l.T == h + diag(e)`` exactly and is PD by
    construction; with ``gmw=False`` this is a plain Cholesky (NaNs if not PD)
    and e == 0.

    vmap-safe: outer batch axes flatten into the kernel's lane axis (one
    pallas dispatch over B_total = prod(batch dims)) instead of lifting the
    pallas_call rank — a vmapped [U,P,m,m] call would otherwise pad EVERY
    robot's P blocks to a full 128-lane tile ([U,128,m,m] scatter, measured
    ~0.6 ms at U=64, P=4).
    """
    return (_mod_chol_gmw if gmw else _mod_chol_plain)(h)


@jax.custom_batching.custom_vmap
@jax.jit
def _mod_chol_gmw(h):
    return _mod_chol_impl(h, True)


@jax.custom_batching.custom_vmap
@jax.jit
def _mod_chol_plain(h):
    return _mod_chol_impl(h, False)


def _mod_chol_flatten(fn, h):
    flat = h.reshape((-1,) + h.shape[-2:])
    l, e = fn(flat)
    return (l.reshape(h.shape), e.reshape(h.shape[:-1])), (True, True)


@_mod_chol_gmw.def_vmap
def _mod_chol_gmw_vmap(axis_size, in_batched, h):
    return _mod_chol_flatten(_mod_chol_gmw, h)


@_mod_chol_plain.def_vmap
def _mod_chol_plain_vmap(axis_size, in_batched, h):
    return _mod_chol_flatten(_mod_chol_plain, h)


@functools.partial(jax.jit, static_argnames=("gmw",))
def _mod_chol_impl(h: jnp.ndarray, gmw: bool = True):
    b, m, _ = h.shape
    hp, n_real = _pad_lanes(h.astype(jnp.float32))
    # benign identity filler in the padded lanes
    if hp.shape[0] != n_real:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32),
                               (hp.shape[0] - n_real, m, m))
        hp = hp.at[n_real:].set(eye)
    ht = jnp.moveaxis(hp, 0, -1)                        # [m, m, Bp]
    grid = hp.shape[0] // LANES
    spec3 = pl.BlockSpec((m, m, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((m, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    lt, et = pl.pallas_call(
        functools.partial(_chol_kernel, m=m, gmw=gmw),
        grid=(grid,),
        in_specs=[spec3],
        out_specs=[spec3, spec2],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, hp.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct((m, hp.shape[0]), jnp.float32),
        ],
    )(ht)
    l = jnp.moveaxis(lt, -1, 0)[:n_real]
    e = jnp.moveaxis(et, -1, 0)[:n_real]
    return l.astype(h.dtype), e.astype(h.dtype)


@jax.custom_batching.custom_vmap
@jax.jit
def chol_solve(l: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = rhs.  l: [B, m, m]; rhs: [B, m] or [B, m, k].

    vmap-safe: outer batch axes flatten into the lane axis (see mod_chol)."""
    return _chol_solve_impl(l, rhs)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, l, rhs):
    lb, rb = in_batched
    if not lb:
        l = jnp.broadcast_to(l[None], (axis_size,) + l.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    lf = l.reshape((-1,) + l.shape[-2:])
    vec = rhs.ndim == l.ndim - 1                 # [..., m] vs [..., m, k]
    tail = rhs.shape[-1:] if vec else rhs.shape[-2:]
    rf = rhs.reshape((-1,) + tail)
    x = chol_solve(lf, rf)
    return x.reshape(rhs.shape), True


@jax.jit
def _chol_solve_impl(l: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    b, m, k = rhs.shape
    lp, n_real = _pad_lanes(l.astype(jnp.float32))
    if lp.shape[0] != n_real:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32),
                               (lp.shape[0] - n_real, m, m))
        lp = lp.at[n_real:].set(eye)
    bp, _ = _pad_lanes(rhs.astype(jnp.float32))
    lt = jnp.moveaxis(lp, 0, -1)                        # [m, m, Bp]
    bt = jnp.moveaxis(bp, 0, -1)                        # [m, k, Bp]
    grid = lp.shape[0] // LANES
    spec_l = pl.BlockSpec((m, m, LANES), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((m, k, LANES), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    xt = pl.pallas_call(
        functools.partial(_solve_kernel, m=m, k=k),
        grid=(grid,),
        in_specs=[spec_l, spec_b],
        out_specs=spec_b,
        out_shape=jax.ShapeDtypeStruct((m, k, lp.shape[0]), jnp.float32),
    )(lt, bt)
    x = jnp.moveaxis(xt, -1, 0)[:n_real].astype(rhs.dtype)
    return x[..., 0] if vec else x
