"""Reduced KKT assembly / banded factorization oracles.

The reference solves the block-banded spline system with sparse
`SimplicialLLT` (Optimization3D_admm.h:470-475); the TPU build factors it
with a block-tridiagonal scan for large P.  Cholesky factors are unique, so
the banded path must match the dense factorization to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.ops import kkt


def _synthetic_banded_spd(P, rng):
    """SPD matrix with the solver's exact sparsity: piece p couples free
    coords [9p-6, 9p+12) (pieces share 3 stored rows)."""
    ns = 9 * P - 3
    a = np.zeros((ns, ns))
    for p in range(P):
        lo, hi = max(0, 9 * p - 6), min(ns, 9 * p + 12)
        blk = rng.standard_normal((hi - lo, hi - lo))
        a[lo:hi, lo:hi] += blk @ blk.T + 0.1 * np.eye(hi - lo)
    return a


def test_block_tridiag_factor_matches_dense():
    rng = np.random.default_rng(0)
    for P in (8, 16, 64):
        a = _synthetic_banded_spd(P, rng)
        l_banded = kkt._factor_block_tridiag(jnp.asarray(a))
        l_dense = jnp.linalg.cholesky(jnp.asarray(a))
        np.testing.assert_allclose(
            np.asarray(l_banded), np.asarray(l_dense), atol=1e-12
        )


def test_block_tridiag_factor_batched():
    rng = np.random.default_rng(1)
    a = _synthetic_banded_spd(16, rng)
    ab = jnp.stack([jnp.asarray(a), jnp.asarray(2.0 * a)])
    lb = kkt._factor_block_tridiag(ab)
    for i, scale in enumerate((1.0, 2.0)):
        np.testing.assert_allclose(
            np.asarray(lb[i]),
            np.asarray(jnp.linalg.cholesky(jnp.asarray(scale * a))),
            atol=1e-12,
        )


def test_large_local_solve_direction_matches_dense():
    """`local_solve` at P=16 (banded path) vs an explicit dense solve."""
    rng = np.random.default_rng(2)
    P = 16
    ns = 9 * P - 3
    a = _synthetic_banded_spd(P, rng)
    b = rng.standard_normal(ns)
    gs = rng.standard_normal(ns)
    red = kkt.ReducedKKT(
        a=jnp.asarray(a), b=jnp.asarray(b), gs=jnp.asarray(gs),
        gt=jnp.asarray(3.0), htt=jnp.asarray(50.0),
    )
    ls = kkt.local_solve(red)
    ds, dt = kkt.finish_direction(ls, ls.schur_s, ls.schur_r)
    # oracle: dense arrowhead solve (with the same relative ridge)
    ridge = 1e-6 * np.trace(a) / ns
    full = np.zeros((ns + 1, ns + 1))
    full[:ns, :ns] = a + ridge * np.eye(ns)
    full[:ns, ns] = b
    full[ns, :ns] = b
    full[ns, ns] = 50.0
    sol = np.linalg.solve(full, -np.concatenate([gs, [3.0]]))
    np.testing.assert_allclose(np.asarray(ds), sol[:ns], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(dt), sol[ns], rtol=1e-6)
