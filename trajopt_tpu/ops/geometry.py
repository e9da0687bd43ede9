"""Device-side convex collision geometry: fixed-iteration GJK, separating
planes, k-DOP filters, and conservative CCD predicates.

TPU-native replacement for openGJK (`lib/opengjk/src/openGJK.c:754` — a
branchy Johnson-subalgorithm GJK), `HighOrderCCD/Separate.h`, and
`HighOrderCCD/CCD/CCD.h`.  All hulls here are tiny point sets (6 control
points; 12 for swept CCD hulls; Minkowski differences up to 144), so instead
of simplex bookkeeping we run a fixed number of Frank-Wolfe iterations (with
pairwise/away steps for linear convergence) on

    min_{w in simplex} || U^T w ||^2,   U = hull vertices - query point,

which is branch-free and vmaps over every (segment x obstacle) pair at once.

Conservativeness: each iteration yields a certified LOWER bound on the true
distance, ``lb = min_i u_i . v / ||v||`` (the GJK separation bound).  All
safety decisions (CCD acceptance, plane validity) use the lower bound, so a
non-converged solve can only make us more cautious — never unsafe.  The upper
bound ``||v||`` converges to the true distance and is used where the reference
uses the exact GJK distance for *generation* decisions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


class HullDist(NamedTuple):
    dist: jnp.ndarray      # [] upper bound == ||v|| (converges to exact)
    lb: jnp.ndarray        # [] certified lower bound (<= true distance)
    v: jnp.ndarray         # [3] vector from query point to closest hull point


# ---------------------------------------------------------------------------
# Exact simplex GJK (the default distance solver)
# ---------------------------------------------------------------------------
#
# Branch-free re-architecture of openGJK's Johnson-subalgorithm GJK
# (lib/opengjk/src/openGJK.c:754, S1D/S2D/S3D at :82-398): the distance
# subalgorithm enumerates ALL 15 vertex subsets of the <=4-point simplex in
# one masked batch instead of walking the case tree.  Termination is a fixed
# iteration count (jit-static); at termination the certified lower bound
# ``min_i u_i.v/||v||`` coincides with ``||v||``, so — unlike the
# Frank-Wolfe solver below — near-contact clearances certify exactly like the
# reference's openGJK distances do (Step.h:88-100).  That exactness is what
# removes the reference-vs-TPU semantic gap that froze near-contact states
# (planes kept being dropped / CCD kept refusing every rung).

_ALL_SUBSETS = [
    tuple(i for i in range(4) if (s >> i) & 1) for s in range(1, 16)
]
_FEAS_TOL = 1e-6


def _det4_cols(a):
    """4x4 determinant by Laplace expansion along the first two rows.
    ``a``: nested 4x4 list of same-shaped arrays."""
    def m2(r0, r1, c0, c1):
        return a[r0][c0] * a[r1][c1] - a[r0][c1] * a[r1][c0]

    return (
        m2(0, 1, 0, 1) * m2(2, 3, 2, 3)
        - m2(0, 1, 0, 2) * m2(2, 3, 1, 3)
        + m2(0, 1, 0, 3) * m2(2, 3, 1, 2)
        + m2(0, 1, 1, 2) * m2(2, 3, 0, 3)
        - m2(0, 1, 1, 3) * m2(2, 3, 0, 2)
        + m2(0, 1, 2, 3) * m2(2, 3, 0, 1)
    )


def _subset_solve(subset, g):
    """Unnormalized barycentric solve x = adj(G_S) @ e for a STATIC subset.

    ``subset``: tuple of active slot ids; ``g``: nested 4x4 list of Gram
    entries (arrays of any common shape).  Returns (xs, s): dict slot->x and
    s = sum(x); lam = x/s are the subset's barycentric coordinates.  Each
    subset size gets its own minimal closed form — crucial for f32 accuracy
    (a generic padded 4x4 adjugate loses ~3 digits to cancellation on
    near-degenerate simplices)."""
    k = len(subset)
    if k == 1:
        (i,) = subset
        one = jnp.ones_like(g[i][i])
        return {i: one}, one
    if k == 2:
        i, j = subset
        xi = g[j][j] - g[i][j]
        xj = g[i][i] - g[i][j]
        return {i: xi, j: xj}, xi + xj
    if k == 3:
        i, j, l = subset
        a_, b_, c_ = g[i][i], g[i][j], g[i][l]
        d_, e_ = g[j][j], g[j][l]
        f_ = g[l][l]
        adj11 = d_ * f_ - e_ * e_
        adj12 = c_ * e_ - b_ * f_
        adj13 = b_ * e_ - c_ * d_
        adj22 = a_ * f_ - c_ * c_
        adj23 = b_ * c_ - a_ * e_
        adj33 = a_ * d_ - b_ * b_
        xi = adj11 + adj12 + adj13
        xj = adj12 + adj22 + adj23
        xl = adj13 + adj23 + adj33
        return {i: xi, j: xj, l: xl}, xi + xj + xl
    # k == 4: Cramer — x_i = det(G with column i replaced by ones)
    xs = {}
    for col in range(4):
        a = [[(jnp.ones_like(g[0][0]) if c == col else g[r][c]) for c in range(4)]
             for r in range(4)]
        xs[col] = _det4_cols(a)
    return xs, xs[0] + xs[1] + xs[2] + xs[3]


def _min_norm_simplex(w: jnp.ndarray, active: jnp.ndarray):
    """Min-norm point of conv(w[active]):  w [4,3], active [4] bool.

    Enumerates all 15 subsets; each solves the Gram system
    ``G_S lam = e, sum lam = 1`` (the min-norm point of the subset's affine
    hull) via `_subset_solve`.  Soundness by construction: every candidate
    with nonnegative normalized coefficients is a point IN the hull (an upper
    bound on the distance), and the subset carrying the true projection
    solves exactly, so the minimum over subsets is the exact projection even
    when degenerate subsets produce garbage.
    Returns (v [3], norm2 [], sub [4] bool).
    """
    dt = w.dtype
    g = [[None] * 4 for _ in range(4)]
    gm = w @ w.T                                           # [4,4]
    for i in range(4):
        for j in range(4):
            g[i][j] = gm[i, j]

    best_n2 = jnp.asarray(jnp.inf, dt)
    best_v = jnp.zeros(3, dt)
    best_sub = jnp.zeros(4, bool)
    for subset in _ALL_SUBSETS:
        xs, s = _subset_solve(subset, g)
        sub_ok = jnp.asarray(True)
        for i in subset:
            sub_ok = sub_ok & active[i]
        ok_sum = s > 1e-12
        inv = 1.0 / jnp.where(ok_sum, s, 1.0)
        v = jnp.zeros(3, dt)
        feas = sub_ok & ok_sum
        tot = jnp.zeros((), dt)
        for i in subset:
            lam = xs[i] * inv
            feas = feas & jnp.isfinite(lam) & (lam >= -_FEAS_TOL)
            lam_pos = jnp.maximum(lam, 0.0)
            tot = tot + lam_pos
            v = v + lam_pos * w[i]
        # Degeneracy guard: for (near-)affinely-dependent subsets — the
        # COMMON case here, straight trajectory segments have collinear
        # control points — xs is pure roundoff noise; lam can be ~1e-6-sized
        # (individually passing the -tol test, NOT summing to 1) and the
        # clamped v collapses toward 0, i.e. a catastrophically-false "in
        # contact".  A real solution has tot = 1 +- 4e-6; renormalizing and
        # flooring tot makes v a genuine convex combination (a sound upper
        # bound) for every accepted subset.
        feas = feas & (tot > 0.5)
        v = v / jnp.maximum(tot, 0.5)
        n2 = jnp.sum(v * v)
        score = jnp.where(feas, n2, jnp.inf)
        take = score < best_n2
        best_n2 = jnp.where(take, score, best_n2)
        best_v = jnp.where(take, v, best_v)
        best_sub = jnp.where(
            take, jnp.asarray([i in subset for i in range(4)], bool), best_sub
        )
    return best_v, best_n2, best_sub


def origin_simplex_dist(u: jnp.ndarray, iters: int = 12) -> HullDist:
    """Distance from the origin to conv(u), u [m,3], by simplex GJK.

    ``dist`` is exact up to f32 roundoff once the support loop has converged
    (typically <= 8 additions); ``lb`` is the certified separation bound,
    which coincides with ``dist`` at convergence.  Both remain sound
    (lb <= true <= dist) at any iteration count.
    """
    m = u.shape[0]
    scale = jnp.maximum(jnp.max(jnp.abs(u)), 1e-30)
    us = u / scale
    i0 = jnp.argmin(jnp.sum(us * us, axis=1))
    w0 = jnp.broadcast_to(us[i0], (4, 3)).astype(us.dtype)
    active0 = jnp.arange(4) == 0
    # convergence: the support vertex cannot improve on the current simplex
    # (KKT of the simplex solve guarantees u_i.v >= |v|^2 on active vertices,
    # so a strictly-smaller support score implies a NEW vertex — no cycling)
    tol = 100 * jnp.finfo(us.dtype).eps

    def body(_, carry):
        w, active, lb_best, v_best, n2_best, done = carry
        v, n2, sub = _min_norm_simplex(w, active)
        # monotone best iterate (f32 roundoff on ill-conditioned faces can
        # briefly regress the raw sequence)
        better = n2 < n2_best
        v_best = jnp.where(better, v, v_best)
        n2_best = jnp.where(better, n2, n2_best)
        vn = jnp.sqrt(jnp.maximum(n2, _EPS))
        scores = us @ v                                    # [m]
        lb_best = jnp.maximum(lb_best, jnp.min(scores) / vn)
        s = jnp.argmin(scores)
        # done when: support can't improve; origin inside the full simplex;
        # or no progress (the support vertex is already in the simplex — an
        # f32-degenerate face solve; iterating further would cycle).  The
        # outputs stay sound either way: v is a real hull point (upper
        # bound), lb a real separation certificate (lower bound).
        stale = jnp.any(active & jnp.all(w == us[s][None, :], axis=1))
        done = (
            done
            | (scores[s] >= n2 - tol * jnp.maximum(n2, 1.0))
            | jnp.all(sub)
            | stale
        )
        free = jnp.argmin(sub)                             # first inactive slot
        w_new = w.at[free].set(us[s])
        active_new = sub.at[free].set(True)
        w = jnp.where(done, w, w_new)
        active = jnp.where(done, active, active_new)
        return w, active, lb_best, v_best, n2_best, done

    w, active, lb_best, v_best, n2_best, _ = jax.lax.fori_loop(
        0, iters, body,
        (w0, active0, jnp.asarray(-jnp.inf, us.dtype),
         jnp.zeros(3, us.dtype), jnp.asarray(jnp.inf, us.dtype),
         jnp.asarray(False)),
    )
    v, n2, _ = _min_norm_simplex(w, active)
    better = n2 < n2_best
    v = jnp.where(better, v, v_best)
    n2 = jnp.where(better, n2, n2_best)
    dist = jnp.sqrt(jnp.maximum(n2, 0.0)) * scale
    lb = jnp.minimum(lb_best * scale, dist)
    return HullDist(dist=dist, lb=lb, v=v * scale)


def point_hull_distance(verts: jnp.ndarray, point: jnp.ndarray, iters: int = 24) -> HullDist:
    """Distance from ``point`` to the convex hull of ``verts`` [m,3] —
    exact simplex GJK (see `origin_simplex_dist`)."""
    return origin_simplex_dist(verts - point, iters)


def point_hull_distance_fw(verts: jnp.ndarray, point: jnp.ndarray, iters: int = 24) -> HullDist:
    """Frank-Wolfe distance solver (kept as a second, independent
    implementation for cross-checks; its ``lb`` is loose near contact).

    Frank-Wolfe with a paired away-step (picks whichever of the FW/pairwise
    update decreases the objective more), fixed ``iters`` iterations.
    """
    u = verts - point                                      # [m,3]
    m = u.shape[0]
    norms2 = jnp.sum(u * u, axis=1)
    w0 = jax.nn.one_hot(jnp.argmin(norms2), m, dtype=u.dtype)

    def body(_, carry):
        w, lb_best = carry
        v = w @ u                                          # [3]
        vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v), _EPS))
        scores = u @ v                                     # [m]
        lb = jnp.min(scores) / vn
        lb_best = jnp.maximum(lb_best, lb)

        s = jnp.argmin(scores)
        # FW step toward vertex s
        d_fw = u[s] - v
        g_fw = jnp.clip(-jnp.dot(v, d_fw) / jnp.maximum(jnp.sum(d_fw * d_fw), _EPS), 0.0, 1.0)
        w_fw = w + g_fw * (jax.nn.one_hot(s, m, dtype=w.dtype) - w)

        # pairwise step: move mass from the worst in-support vertex to s
        away_scores = jnp.where(w > 1e-10, scores, -jnp.inf)
        a = jnp.argmax(away_scores)
        d_pw = u[s] - u[a]
        g_max = w[a]
        g_pw = jnp.clip(-jnp.dot(v, d_pw) / jnp.maximum(jnp.sum(d_pw * d_pw), _EPS), 0.0, g_max)
        w_pw = w + g_pw * (jax.nn.one_hot(s, m, dtype=w.dtype) - jax.nn.one_hot(a, m, dtype=w.dtype))

        f_fw = jnp.sum((w_fw @ u) ** 2)
        f_pw = jnp.sum((w_pw @ u) ** 2)
        w_new = jnp.where(f_pw < f_fw, w_pw, w_fw)
        return w_new, lb_best

    w, lb_best = jax.lax.fori_loop(0, iters, body, (w0, jnp.asarray(-jnp.inf, u.dtype)))
    v = w @ u
    dist = jnp.sqrt(jnp.maximum(jnp.sum(v * v), 0.0))
    return HullDist(dist=dist, lb=jnp.minimum(lb_best, dist), v=v)


def hull_hull_distance(
    verts_a: jnp.ndarray, verts_b: jnp.ndarray, iters: int = 24
) -> HullDist:
    """Distance between two convex hulls via their Minkowski difference.

    ``v`` points from hull B toward hull A (matches the openGJK witness used
    by Separate::selfgjk, Separate.h:244-262).
    """
    diff = (verts_a[:, None, :] - verts_b[None, :, :]).reshape(-1, 3)
    return point_hull_distance(diff, jnp.zeros(3, dtype=verts_a.dtype), iters)


def use_pallas_gjk(cfg, dtype) -> bool:
    """Dispatch decision for the fused Pallas GJK kernel (trace-time)."""
    if cfg.use_pallas_gjk is not None:
        return bool(cfg.use_pallas_gjk)
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def batched_origin_dist(
    diffsets: jnp.ndarray, iters: int, pallas: bool = False
) -> HullDist:
    """Distance from the origin to conv(diffsets[i]) for a flat batch [N,m,3]
    — exact simplex GJK (matches the reference's openGJK distance semantics).

    ``pallas=True`` routes to the fused TPU kernel (`ops.pallas_gjk`), which
    runs the whole simplex iteration in VMEM in a single dispatch; the
    fallback is the vmapped pure-JAX solver (identical math).
    """
    if pallas:
        from . import pallas_gjk

        return pallas_gjk.gjk_exact_diffset(diffsets, min(iters, 16))
    return jax.vmap(lambda d: origin_simplex_dist(d, min(iters, 16)))(diffsets)


# ---------------------------------------------------------------------------
# Separating planes
# ---------------------------------------------------------------------------


class PlaneFit(NamedTuple):
    c: jnp.ndarray      # [3] unit normal (c . x + d >= 0 holds on the hull)
    d: jnp.ndarray      # []
    valid: jnp.ndarray  # [] bool
    dist: jnp.ndarray   # [] hull distance estimate


def obstacle_plane(
    hull: jnp.ndarray,       # [n,3] segment control hull
    point: jnp.ndarray,      # [3] obstacle point
    offset: float,
    margin: float,
    iters: int = 24,
) -> PlaneFit:
    """Half-space separating a segment hull from an obstacle point.

    Mirrors `Separate::opengjk` (Separate.h:18-163): normal = unit closest
    vector from the point to the hull, ``d = -c.point - offset``; generated
    only when the distance is within ``offset + margin``.
    """
    hd = point_hull_distance(hull, point, iters)
    vn = jnp.maximum(hd.dist, _EPS)
    c = hd.v / vn
    d = -jnp.dot(c, point) - offset
    valid = hd.dist <= offset + margin
    return PlaneFit(c=c, d=d, valid=valid, dist=hd.dist)


def pair_plane(
    hull_a: jnp.ndarray,     # [n,3] robot A segment hull
    hull_b: jnp.ndarray,     # [n,3] robot B segment hull
    offset: float,
    margin: float,
    iters: int = 24,
    refine_iters: int = 8,
) -> PlaneFit:
    """Mid-plane between two robot hulls (A side: ``c.x + d - offset/2 >= 0``).

    Mirrors `Separate::selfgjk` (Separate.h:165-304): ``d`` is the average of
    the two support values, then refined by the 1-D Newton of
    `Optimal_plane::optimal_d` (Optimal_plane.h:13-71) which the default multi
    path applies (Optimization3D_multi.h:297).
    """
    hd = hull_hull_distance(hull_a, hull_b, iters)
    vn = jnp.maximum(hd.dist, _EPS)
    c = hd.v / vn
    d0 = jnp.min(-hull_b @ c)
    d1 = jnp.max(-hull_a @ c)
    d = 0.5 * (d0 + d1)
    d = _optimal_d(hull_a, hull_b, c, d, offset, margin, refine_iters)
    valid = hd.dist <= offset + 2 * margin
    return PlaneFit(c=c, d=d, valid=valid, dist=hd.dist)


def _optimal_d(hull_a, hull_b, c, d, offset, margin, iters):
    """Damped 1-D Newton on the symmetric two-sided barrier in ``d``
    (Optimal_plane.h:13-71).  Keeps both sides strictly feasible."""

    da = hull_a @ c  # [n]
    db = hull_b @ c

    def grad_hess(dv):
        dist_a = da + dv - 0.5 * offset
        dist_b = -db - dv - 0.5 * offset
        g = _barrier_d1(dist_a, margin).sum() - _barrier_d1(dist_b, margin).sum()
        h = _barrier_d2(dist_a, margin).sum() + _barrier_d2(dist_b, margin).sum()
        return g, h

    def feasible(dv):
        return (jnp.min(da + dv - 0.5 * offset) > 0) & (
            jnp.min(-db - dv - 0.5 * offset) > 0
        )

    def body(_, dv):
        g, h = grad_hess(dv)
        step = -g / jnp.maximum(h, 1e-8)
        # backtrack (3 halvings) to stay feasible
        def bt(_, s):
            return jnp.where(feasible(dv + s), s, 0.5 * s)

        step = jax.lax.fori_loop(0, 4, bt, step)
        return jnp.where(feasible(dv + step), dv + step, dv)

    ok0 = feasible(d)
    d_new = jax.lax.fori_loop(0, iters, body, d)
    return jnp.where(ok0, d_new, d)


def _barrier_d1(dist, margin):
    """d/d(dist) of the clamped log barrier (e1 in Gradient_admm.h:380)."""
    act = (dist > 0) & (dist < margin)
    ds = jnp.where(act, dist, margin)
    e1 = -(2 * (ds - margin) * jnp.log(ds / margin) + (ds - margin) ** 2 / ds)
    return jnp.where(act, e1, 0.0)


def _barrier_d2(dist, margin):
    """Second derivative (e2 in Gradient_admm.h:384)."""
    act = (dist > 0) & (dist < margin)
    ds = jnp.where(act, dist, margin)
    e2 = -(
        2 * jnp.log(ds / margin)
        + 4 * (ds - margin) / ds
        - (ds - margin) ** 2 / (ds * ds)
    )
    return jnp.where(act, e2, 0.0)


def refine_pair_plane(
    hull_a: jnp.ndarray,     # [n,3]
    hull_b: jnp.ndarray,     # [n,3]
    c: jnp.ndarray,          # [3] current unit normal (A side positive)
    d: jnp.ndarray,          # [] current midplane offset
    offset: float,
    margin: float,
    iters: int = 6,
    ladder: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Barrier-optimal robot-pair plane refinement
    (`Optimal_plane::self_optimal_cd`, Optimal_plane.h:620-773): damped
    Newton on the SYMMETRIC two-sided barrier in local rotation coordinates
    (theta, phi) of the unit normal, with ``d`` re-optimized by the 1-D
    Newton of `_optimal_d` at each trial normal.

    Returns (c, d); falls back to the inputs when refinement cannot improve
    while keeping both sides strictly feasible.
    """

    def frame(cv):
        c0 = jnp.stack([cv[1], -cv[0], jnp.zeros((), cv.dtype)])
        n0 = jnp.sqrt(jnp.maximum(jnp.sum(c0 * c0), _EPS))
        c0 = jnp.where(n0 > 1e-6, c0 / n0, jnp.array([1.0, 0.0, 0.0], cv.dtype))
        c1 = jnp.cross(c0, cv)
        c1 = c1 / jnp.sqrt(jnp.maximum(jnp.sum(c1 * c1), _EPS))
        return c0, c1

    def both_sides_energy(cv, dv):
        dist_a = hull_a @ cv + dv - 0.5 * offset
        dist_b = -(hull_b @ cv) - dv - 0.5 * offset

        def side(dist):
            act = (dist > 0) & (dist < margin)
            ds = jnp.where(act, dist, margin)
            e = jnp.where(act, -((ds - margin) ** 2) * jnp.log(ds / margin), 0.0)
            e_bad = jnp.where(dist <= 0, (margin - dist) ** 2 * 1e3, 0.0)
            return jnp.sum(e + e_bad)

        return side(dist_a) + side(dist_b)

    def energy_of(cv):
        dv = _optimal_d(
            hull_a, hull_b, cv,
            0.5 * (jnp.min(-hull_b @ cv) + jnp.max(-hull_a @ cv)),
            offset, margin, 4,
        )
        return both_sides_energy(cv, dv), dv

    def body(_, carry):
        cv, dv = carry
        c0, c1 = frame(cv)

        def local_e(tp):
            th, ph = tp[0], tp[1]
            cc = jnp.cos(th) * cv + jnp.sin(th) * (jnp.cos(ph) * c0 + jnp.sin(ph) * c1)
            return both_sides_energy(cc, dv)

        tp0 = jnp.zeros(2, cv.dtype)
        g = jax.grad(local_e)(tp0)
        h = jax.jacfwd(jax.grad(local_e))(tp0)
        h = h + 1e-2 * jnp.eye(2, dtype=cv.dtype)
        det = h[0, 0] * h[1, 1] - h[0, 1] * h[1, 0]
        det = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        inv = jnp.array([[h[1, 1], -h[0, 1]], [-h[1, 0], h[0, 0]]], cv.dtype) / det
        direction = -(inv @ g)
        big = jnp.maximum(jnp.abs(direction[0]), jnp.abs(direction[1]))
        step0 = jnp.where(big > 0.5 * jnp.pi, 0.95 * 0.5 * jnp.pi / big, 1.0)
        steps = step0 * (0.8 ** jnp.arange(ladder, dtype=cv.dtype))
        w = -jnp.dot(g, direction)
        e0 = local_e(tp0)
        es = jax.vmap(lambda s: local_e(s * direction))(steps)
        ok = e0 - 1e-4 * w * steps >= es
        ok = jnp.concatenate([ok[:-1], jnp.ones(1, bool)])
        s = steps[jnp.argmax(ok)]
        tp = s * direction
        cc = (
            jnp.cos(tp[0]) * cv
            + jnp.sin(tp[0]) * (jnp.cos(tp[1]) * c0 + jnp.sin(tp[1]) * c1)
        )
        cc = cc / jnp.sqrt(jnp.maximum(jnp.sum(cc * cc), _EPS))
        e_new, d_new = energy_of(cc)
        better = (e_new <= e0) & (w > 0)
        return jnp.where(better, cc, cv), jnp.where(better, d_new, dv)

    c_new, d_new = jax.lax.fori_loop(0, iters, body, (c, d))
    return c_new, d_new


def refine_plane(
    hull: jnp.ndarray,       # [n,3]
    point: jnp.ndarray,      # [3]
    c: jnp.ndarray,          # [3] current unit normal
    offset: float,
    margin: float,
    iters: int = 8,
    ladder: int = 12,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Barrier-optimal plane refinement (`Optimal_plane::optimal_cd`,
    Optimal_plane.h:160-293): damped Newton on the hull-side barrier energy in
    local rotation coordinates (theta, phi) of the unit normal, with ``d``
    eliminated as ``-c.point - offset``.

    Differences from the reference: fixed iteration/backtracking counts for
    jit, and derivatives via autodiff of the same energy instead of the
    hand-coded 2x2 system.  Returns (c, d).
    """

    def frame(cv):
        c0 = jnp.stack([cv[1], -cv[0], jnp.zeros((), cv.dtype)])
        n0 = jnp.sqrt(jnp.maximum(jnp.sum(c0 * c0), _EPS))
        # degenerate when c ~ +-z: use x axis instead
        c0 = jnp.where(n0 > 1e-6, c0 / n0, jnp.array([1.0, 0.0, 0.0], cv.dtype))
        c1 = jnp.cross(c0, cv)
        c1 = c1 / jnp.sqrt(jnp.maximum(jnp.sum(c1 * c1), _EPS))
        return c0, c1

    def energy_of(cv):
        dist = hull @ cv - jnp.dot(cv, point) - offset
        act = (dist > 0) & (dist < margin)
        ds = jnp.where(act, dist, margin)
        e = jnp.where(act, -((ds - margin) ** 2) * jnp.log(ds / margin), 0.0)
        # infeasible side contributes a large smooth penalty so the Newton
        # step is pushed back toward validity
        e_bad = jnp.where(dist <= 0, (margin - dist) ** 2 * 1e3, 0.0)
        return jnp.sum(e + e_bad)

    def body(_, cv):
        c0, c1 = frame(cv)

        def local_e(tp):
            th, ph = tp[0], tp[1]
            cc = jnp.cos(th) * cv + jnp.sin(th) * (jnp.cos(ph) * c0 + jnp.sin(ph) * c1)
            return energy_of(cc)

        tp0 = jnp.zeros(2, cv.dtype)
        g = jax.grad(local_e)(tp0)
        h = jax.jacfwd(jax.grad(local_e))(tp0)
        h = h + 1e-2 * jnp.eye(2, dtype=cv.dtype)
        det = h[0, 0] * h[1, 1] - h[0, 1] * h[1, 0]
        det = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        inv = jnp.array([[h[1, 1], -h[0, 1]], [-h[1, 0], h[0, 0]]], cv.dtype) / det
        direction = -(inv @ g)
        # angle clamp (Optimal_plane.h:232-235)
        big = jnp.maximum(jnp.abs(direction[0]), jnp.abs(direction[1]))
        step0 = jnp.where(big > 0.5 * jnp.pi, 0.95 * 0.5 * jnp.pi / big, 1.0)
        steps = step0 * (0.8 ** jnp.arange(ladder, dtype=cv.dtype))
        w = -jnp.dot(g, direction)
        e0 = local_e(tp0)
        es = jax.vmap(lambda s: local_e(s * direction))(steps)
        ok = e0 - 1e-4 * w * steps >= es
        ok = jnp.concatenate([ok[:-1], jnp.ones(1, bool)])
        s = steps[jnp.argmax(ok)]
        tp = s * direction
        cc = (
            jnp.cos(tp[0]) * cv
            + jnp.sin(tp[0]) * (jnp.cos(tp[1]) * c0 + jnp.sin(tp[1]) * c1)
        )
        cc = cc / jnp.sqrt(jnp.maximum(jnp.sum(cc * cc), _EPS))
        # keep only if it improved and stayed valid
        better = (energy_of(cc) <= e0) & (w > 0)
        return jnp.where(better, cc, cv)

    c_new = jax.lax.fori_loop(0, iters, body, c)
    d_new = -jnp.dot(c_new, point) - offset
    return c_new, d_new


# ---------------------------------------------------------------------------
# k-DOP filters (reference: CCD::KDOPDCD / KDOPCCD, CCD.h:354-473)
# ---------------------------------------------------------------------------


def kdop_axes() -> np.ndarray:
    """The reference's 49 normalized k-DOP directions (CCDUtils.cpp:56-119)."""
    base = [
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 1), (1, -1, 1), (1, 1, -1), (1, -1, -1),
        (0, 1, 1), (0, 1, -1), (1, 0, 1), (1, 0, -1), (1, 1, 0), (1, -1, 0),
        (0, 2, 1), (0, 2, -1), (0, 1, 2), (0, 1, -2),
        (2, 0, 1), (2, 0, -1), (1, 0, 2), (1, 0, -2),
        (2, 1, 0), (2, -1, 0), (1, 2, 0), (1, -2, 0),
        (1, 2, 1), (1, 2, -1), (1, -2, 1), (-1, 2, 1),
        (1, 1, 2), (1, 1, -2), (1, -1, 2), (-1, 1, 2),
        (2, 1, 1), (2, 1, -1), (2, -1, 1), (-2, 1, 1),
        (2, 2, 1), (2, 2, -1), (2, -2, 1), (-2, 2, 1),
        (2, 1, 2), (2, 1, -2), (2, -1, 2), (-2, 1, 2),
        (1, 2, 2), (1, 2, -2), (1, -2, 2), (-1, 2, 2),
    ]
    a = np.asarray(base, dtype=np.float64)
    return a / np.linalg.norm(a, axis=1, keepdims=True)


def kdop_separation_lb(
    verts_a: jnp.ndarray, verts_b: jnp.ndarray, axes: jnp.ndarray
) -> jnp.ndarray:
    """Max directional gap over the k-DOP axes — a cheap distance lower bound.

    ``> d`` exactly reproduces the reference's "k-DOP says separated by more
    than d" filter (CCD.h:354-413).
    """
    pa = verts_a @ axes.T                                  # [...,m,A]
    pb = verts_b @ axes.T
    gap_ab = jnp.min(pb, axis=-2) - jnp.max(pa, axis=-2)   # B above A
    gap_ba = jnp.min(pa, axis=-2) - jnp.max(pb, axis=-2)
    return jnp.max(jnp.maximum(gap_ab, gap_ba), axis=-1)


# ---------------------------------------------------------------------------
# Conservative CCD predicates
# ---------------------------------------------------------------------------


def swept_hull(hull: jnp.ndarray, direction: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Convex bound of the moving control hull over [0, step]: the union of
    start and end control points (CCD::GJKCCD hull construction,
    CCD.h:116-164; linear CP motion makes this exact)."""
    return jnp.concatenate([hull, hull + step * direction], axis=-2)


def ccd_point_clear(
    hull: jnp.ndarray,       # [n,3]
    direction: jnp.ndarray,  # [n,3]
    point: jnp.ndarray,      # [3]
    step: jnp.ndarray,
    offset: float,
    iters: int = 24,
) -> jnp.ndarray:
    """True if the swept hull provably stays > offset away from the point.

    Uses the certified lower bound, so True is always safe to accept."""
    sw = swept_hull(hull, direction, step)
    hd = point_hull_distance(sw, point, iters)
    return hd.lb > offset


def ccd_pair_clear(
    hull_a: jnp.ndarray, dir_a: jnp.ndarray,
    hull_b: jnp.ndarray, dir_b: jnp.ndarray,
    step: jnp.ndarray, offset: float, iters: int = 24,
) -> jnp.ndarray:
    """True if two swept hulls provably stay > offset apart over [0, step]
    (CCD::SelfGJKCCD, CCD.h:227-352, with the joint scalar step of
    Step::couple_self_step)."""
    sa = swept_hull(hull_a, dir_a, step)
    sb = swept_hull(hull_b, dir_b, step)
    hd = hull_hull_distance(sa, sb, iters)
    return hd.lb > offset
