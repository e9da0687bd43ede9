"""Pallas GJK kernel vs the pure-JAX reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.ops import geometry as geo
from trajopt_tpu.ops import pallas_gjk as pg


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run the kernel in the Pallas interpreter (no TPU in CI)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def reference(u, iters=32):
    out = jax.vmap(
        lambda d: geo.point_hull_distance(d, jnp.zeros(3, d.dtype), iters)
    )(jnp.asarray(u, jnp.float32))
    return out


@pytest.mark.parametrize("n,m", [(5, 6), (130, 12), (64, 36)])
@pytest.mark.slow
def test_matches_pure_jax_bounds(n, m):
    rng = np.random.default_rng(n * 100 + m)
    u = rng.standard_normal((n, m, 3)).astype(np.float32) + np.array(
        [0.5, 0.2, -0.1], np.float32
    )
    got = pg.gjk_diffset(jnp.asarray(u), iters=32)
    # exact oracle in f64
    for i in range(n):
        from tests.test_geometry import brute_point_hull

        true = brute_point_hull(u[i].astype(np.float64), np.zeros(3))
        tol = 1e-4 * (1.0 + true)  # f32 kernel vs f64 oracle
        # the bounds are the contract (lb <= true <= dist); the upper bound
        # converges more slowly on zigzag-prone instances
        assert float(got.lb[i]) <= true + tol
        assert float(got.dist[i]) >= true - tol
        # loose accuracy sanity only: downstream logic consumes the certified
        # bounds, not the exact value (FW upper bounds zigzag on some inputs;
        # interior points converge sublinearly and are rejected via lb anyway)
        if true > 1e-6:
            assert abs(float(got.dist[i]) - true) < 3e-2 + 0.7 * true


@pytest.mark.slow
def test_separated_pairs():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((17, 6, 3)).astype(np.float32)
    b = rng.standard_normal((17, 6, 3)).astype(np.float32) + np.array(
        [4.0, 0, 0], np.float32
    )
    got = pg.gjk_pairs(jnp.asarray(a), jnp.asarray(b), iters=32)
    ref_lb = []
    for i in range(17):
        hd = geo.hull_hull_distance(jnp.asarray(a[i]), jnp.asarray(b[i]), 48)
        ref_lb.append(float(hd.dist))
    np.testing.assert_allclose(np.asarray(got.dist), ref_lb, rtol=2e-2, atol=1e-3)
    assert (np.asarray(got.lb) <= np.asarray(got.dist) + 1e-6).all()
    assert (np.asarray(got.lb) > 0.5).all()  # clearly separated


@pytest.mark.parametrize("n,m", [(5, 6), (130, 12), (40, 36)])
@pytest.mark.slow
def test_exact_kernel_matches_pure_jax(n, m):
    """gjk_exact_diffset (the production solver) vs origin_simplex_dist and
    the f64 brute oracle — including collinear (degenerate) sets."""
    rng = np.random.default_rng(n * 7 + m)
    u = rng.standard_normal((n, m, 3)).astype(np.float32)
    # make a third of the sets collinear (the real workload's common case)
    for i in range(0, n, 3):
        a, b = rng.standard_normal(3), rng.standard_normal(3)
        t = np.sort(rng.uniform(0, 1, m))[:, None]
        u[i] = (a * (1 - t) + b * t).astype(np.float32)
    got = pg.gjk_exact_diffset(jnp.asarray(u), iters=12)
    ref = jax.vmap(lambda d: geo.origin_simplex_dist(d, 12))(jnp.asarray(u))
    from tests.test_geometry import brute_point_hull

    for i in range(0, n, max(1, n // 16)):
        true = brute_point_hull(u[i].astype(np.float64), np.zeros(3))
        tol = 2e-4 * (1.0 + true)
        assert float(got.lb[i]) <= true + tol
        assert float(got.dist[i]) >= true - tol
        if true > 1e-3:
            assert abs(float(got.dist[i]) - true) < 5e-3 * (1 + true), (
                i, float(got.dist[i]), true,
            )
    # bounds of kernel and pure JAX agree closely on separated sets
    sep = np.asarray(ref.dist) > 1e-2
    np.testing.assert_allclose(
        np.asarray(got.dist)[sep], np.asarray(ref.dist)[sep], rtol=2e-2, atol=2e-3
    )


def test_point_hull_witness_direction():
    verts = np.array(
        [[[0, 0, 1.0], [1, 0, 1], [0, 1, 1], [1, 1, 1], [0.5, 0.5, 2], [0.2, 0.8, 1.5]]],
        np.float32,
    )
    pt = np.zeros((1, 3), np.float32)
    got = pg.gjk_points(jnp.asarray(verts), jnp.asarray(pt), iters=32)
    # closest point is (0,0,1): distance 1, v points up
    np.testing.assert_allclose(float(got.dist[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v[0]), [0, 0, 1.0], atol=1e-4)
