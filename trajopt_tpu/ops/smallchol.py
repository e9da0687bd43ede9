"""Unrolled batched Cholesky + triangular solves for tiny blocks.

XLA's `linalg.cholesky` / `eigh` lower to while-loop algorithms with dynamic
slicing that cost ~1-10 ms per call on TPU regardless of size — measured
(U=64 bench, [256,19,19] f32): `jnp.linalg.cholesky` ≈ 1.0 ms,
`jnp.linalg.eigvalsh` ≈ 4-9 ms, while the whole arithmetic is ~0.6 MFLOP.
For the solver's per-piece (19x19) and reduced-KKT (3(T-4)x3(T-4)) blocks the
right lowering is a fully UNROLLED outer-product Cholesky: a static Python
loop of rank-1 updates that XLA fuses into one elementwise kernel batched
over blocks.  Unrolls are O(m) ops of O(batch*m^2) work — fine for m <= ~64
(the solver's blocks are 19 and 33 at the bench piece counts).

An indefinite input yields NaNs in the factor (like lax.linalg.cholesky),
which `psd_repair_ladder` uses as its PD test.
"""

from __future__ import annotations

import jax.numpy as jnp


def mod_cholesky(a: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GMW-style modified Cholesky, unrolled (CPU fallback of
    `pallas_chol.mod_chol`; see its docstring for the algorithm/guarantees).

    a: [..., m, m] -> (l lower with ``l @ l.T == a + diag(e)`` PD by
    construction, e [..., m] diagonal boosts; e == 0 on comfortably-PD input).
    """
    m = a.shape[-1]
    eps = jnp.asarray(1.19e-7, a.dtype)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    gamma = jnp.max(jnp.abs(diag), axis=-1)
    offmax = jnp.max(
        jnp.abs(a - diag[..., None] * jnp.eye(m, dtype=a.dtype)), axis=(-1, -2)
    )
    nf = jnp.asarray(max((m * m - 1) ** 0.5, 1.0), a.dtype)
    beta2 = jnp.maximum(jnp.maximum(gamma, offmax / nf), eps)
    delta = eps * jnp.maximum(gamma + offmax, jnp.asarray(1.0, a.dtype))

    cols = []
    es = []
    for j in range(m):
        dorig = a[..., 0, 0]
        below = a[..., 1:, 0]                             # [..., m-1-j]
        theta = (
            jnp.max(jnp.abs(below), axis=-1)
            if below.shape[-1]
            else jnp.zeros_like(dorig)
        )
        dnew = jnp.maximum(
            jnp.maximum(jnp.abs(dorig), theta * theta / beta2), delta
        )
        es.append(dnew - dorig)
        piv = jnp.sqrt(dnew)
        col = jnp.concatenate([piv[..., None], below / piv[..., None]], axis=-1)
        if j < m - 1:
            rest = col[..., 1:]
            a = a[..., 1:, 1:] - rest[..., :, None] * rest[..., None, :]
        if j:
            col = jnp.concatenate(
                [jnp.zeros(col.shape[:-1] + (j,), col.dtype), col], axis=-1
            )
        cols.append(col)
    return jnp.stack(cols, axis=-1), jnp.stack(es, axis=-1)


def cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of [..., m, m] PD blocks, unrolled.

    Not-PD blocks contaminate with NaN (sqrt of negative pivot).
    """
    m = a.shape[-1]
    cols = []
    for j in range(m):
        piv = jnp.sqrt(a[..., 0, 0])                      # [...]
        col = a[..., :, 0] / piv[..., None]               # [..., m-j]
        if j < m - 1:
            rest = col[..., 1:]
            a = a[..., 1:, 1:] - rest[..., :, None] * rest[..., None, :]
        if j:
            col = jnp.concatenate(
                [jnp.zeros(col.shape[:-1] + (j,), col.dtype), col], axis=-1
            )
        cols.append(col)
    return jnp.stack(cols, axis=-1)                        # columns -> [.., m, m]


def solve_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution: solve L y = b, unrolled.

    ``l``: [..., m, m] lower; ``b``: [..., m] or [..., m, k].
    """
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    m = l.shape[-1]
    ys = []
    for i in range(m):
        acc = b[..., i, :]
        if i:
            lrow = l[..., i, :i]                           # [..., i]
            stacked = jnp.stack(ys, axis=-1)               # [..., k, i]
            acc = acc - jnp.einsum("...ki,...i->...k", stacked, lrow)
        ys.append(acc / l[..., i, i][..., None])
    y = jnp.stack(ys, axis=-2)                             # [..., m, k]
    return y[..., 0] if vec else y


def solve_upper_t(l: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Back substitution with L^T: solve L^T x = y, unrolled."""
    vec = y.ndim == l.ndim - 1
    if vec:
        y = y[..., None]
    m = l.shape[-1]
    xs_rev = []
    for i in range(m - 1, -1, -1):
        acc = y[..., i, :]
        if xs_rev:
            lcol = l[..., i + 1 :, i]                      # [..., m-1-i]
            stacked = jnp.stack(xs_rev[::-1], axis=-1)     # [..., k, m-1-i]
            acc = acc - jnp.einsum("...ki,...i->...k", stacked, lcol)
        xs_rev.append(acc / l[..., i, i][..., None])
    x = jnp.stack(xs_rev[::-1], axis=-2)
    return x[..., 0] if vec else x


def cho_solve(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the unrolled Cholesky factor L of A."""
    return solve_upper_t(l, solve_lower(l, b))


def solve_pd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for PD A (factor + two substitutions, all unrolled)."""
    return cho_solve(cholesky(a), b)
