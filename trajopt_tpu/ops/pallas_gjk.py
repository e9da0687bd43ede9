"""Pallas TPU kernel: batched Frank-Wolfe GJK distance with certified bounds.

The solver's dominant op-count contributor is the fixed-iteration FW-GJK solve
(`geometry.point_hull_distance` / `hull_hull_distance`) vmapped over tens of
thousands of (hull, hull) pairs: under XLA each of the ~24 loop iterations is
a chain of small fused kernels.  This kernel runs the whole iteration in VMEM
for a tile of pairs — one dispatch for the entire batch.

Layout: the PAIR axis lives on the 128-wide lane dimension; the (Minkowski
difference) vertex axis lives on sublanes.  Every FW operation is then an
(m, 128) elementwise op or a sublane reduction — pure VPU work.

Semantics match `geometry.point_hull_distance` on the difference set
``u[i*mb+j] = A[i] - B[j]``:
  * ``dist``: upper bound (converges to the true distance),
  * ``lb``:   certified lower bound min_i u_i . v / ||v||  (safety decisions),
  * ``v``:    witness vector from B toward A.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import geometry as geo

LANES = 128
_EPS = 1e-12


def _gjk_kernel(ux_ref, uy_ref, uz_ref, dist_ref, lb_ref, vx_ref, vy_ref, vz_ref,
                *, iters: int, m: int):
    """One tile: difference-set coords u{x,y,z}: [m, LANES] -> outputs [1, LANES]."""
    ux, uy, uz = ux_ref[:], uy_ref[:], uz_ref[:]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 0)

    def first_hit_onehot(hit):
        """One-hot of the first True row per lane (no cumsum: Mosaic-friendly)."""
        ids = jnp.where(hit, row_ids, jnp.int32(m))
        first = jnp.min(ids, axis=0, keepdims=True)
        return jnp.where(row_ids == first, jnp.float32(1.0), jnp.float32(0.0))

    norms2 = ux * ux + uy * uy + uz * uz                    # [m, L]
    # start at the nearest vertex: one-hot over sublanes
    n_min = jnp.min(norms2, axis=0, keepdims=True)          # [1, L]
    w = first_hit_onehot(norms2 <= n_min)                   # [m, L]

    def pick(mask_scores, reduce_min):
        """One-hot of the (first) argmin/argmax row of mask_scores."""
        best = (
            jnp.min(mask_scores, axis=0, keepdims=True)
            if reduce_min
            else jnp.max(mask_scores, axis=0, keepdims=True)
        )
        hit = mask_scores <= best if reduce_min else mask_scores >= best
        return first_hit_onehot(hit)

    def body(_, carry):
        w, lb_best = carry
        vx = jnp.sum(w * ux, axis=0, keepdims=True)         # [1, L]
        vy = jnp.sum(w * uy, axis=0, keepdims=True)
        vz = jnp.sum(w * uz, axis=0, keepdims=True)
        vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, jnp.float32(_EPS)))
        scores = ux * vx + uy * vy + uz * vz                # [m, L]
        lb = jnp.min(scores, axis=0, keepdims=True) / vn
        lb_best = jnp.maximum(lb_best, lb)

        sel_s = pick(scores, reduce_min=True)               # FW vertex
        sx = jnp.sum(sel_s * ux, axis=0, keepdims=True)
        sy = jnp.sum(sel_s * uy, axis=0, keepdims=True)
        sz = jnp.sum(sel_s * uz, axis=0, keepdims=True)

        # FW step toward s
        dx, dy, dz = sx - vx, sy - vy, sz - vz
        dd = jnp.maximum(dx * dx + dy * dy + dz * dz, jnp.float32(_EPS))
        g_fw = jnp.clip(-(vx * dx + vy * dy + vz * dz) / dd, jnp.float32(0.0), jnp.float32(1.0))
        w_fw = w + g_fw * (sel_s - w)

        # pairwise step: away vertex = argmax score among support
        away_scores = jnp.where(w > 1e-10, scores, -jnp.inf)
        sel_a = pick(away_scores, reduce_min=False)
        ax = jnp.sum(sel_a * ux, axis=0, keepdims=True)
        ay = jnp.sum(sel_a * uy, axis=0, keepdims=True)
        az = jnp.sum(sel_a * uz, axis=0, keepdims=True)
        g_max = jnp.sum(sel_a * w, axis=0, keepdims=True)
        px, py, pz = sx - ax, sy - ay, sz - az
        pp = jnp.maximum(px * px + py * py + pz * pz, jnp.float32(_EPS))
        g_pw = jnp.clip(-(vx * px + vy * py + vz * pz) / pp, jnp.float32(0.0), g_max)
        w_pw = w + g_pw * (sel_s - sel_a)

        def f_of(wc):
            fx = jnp.sum(wc * ux, axis=0, keepdims=True)
            fy = jnp.sum(wc * uy, axis=0, keepdims=True)
            fz = jnp.sum(wc * uz, axis=0, keepdims=True)
            return fx * fx + fy * fy + fz * fz

        use_pw = f_of(w_pw) < f_of(w_fw)                    # [1, L]
        w_new = jnp.where(use_pw, w_pw, w_fw)
        return w_new, lb_best

    lb0 = jnp.full((1, LANES), -jnp.inf, dtype=jnp.float32)
    w, lb_best = jax.lax.fori_loop(0, iters, body, (w, lb0))

    vx = jnp.sum(w * ux, axis=0, keepdims=True)
    vy = jnp.sum(w * uy, axis=0, keepdims=True)
    vz = jnp.sum(w * uz, axis=0, keepdims=True)
    dist = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, jnp.float32(0.0)))
    dist_ref[:] = dist
    lb_ref[:] = jnp.minimum(lb_best, dist)
    vx_ref[:] = vx
    vy_ref[:] = vy
    vz_ref[:] = vz


@functools.partial(jax.jit, static_argnames=("iters",))
def gjk_diffset(u: jnp.ndarray, iters: int = 24) -> geo.HullDist:
    """Distance from the origin to conv(u) for a batch of difference sets.

    u: [N, m, 3] float32 -> HullDist with fields [N].
    """
    n, m, _ = u.shape
    n_pad = -(-n // LANES) * LANES
    # pair axis -> lanes: [m, N_pad] per coordinate
    up = jnp.zeros((n_pad, m, 3), dtype=jnp.float32)
    up = up.at[:n].set(u.astype(jnp.float32))
    # pad lanes with a benign unit simplex (avoid 0/0)
    if n_pad > n:
        filler = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (m, 1))
        up = up.at[n:].set(filler)
    ut = up.transpose(1, 0, 2)                              # [m, N_pad, 3]
    ux, uy, uz = ut[..., 0], ut[..., 1], ut[..., 2]

    grid = n_pad // LANES
    spec_in = pl.BlockSpec((m, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * 5
    dist, lb, vx, vy, vz = pl.pallas_call(
        functools.partial(_gjk_kernel, iters=iters, m=m),
        grid=(grid,),
        in_specs=[spec_in, spec_in, spec_in],
        out_specs=[spec_out] * 5,
        out_shape=out_shape,
    )(ux, uy, uz)
    v = jnp.stack([vx[0, :n], vy[0, :n], vz[0, :n]], axis=-1)
    return geo.HullDist(dist=dist[0, :n], lb=lb[0, :n], v=v)


# ---------------------------------------------------------------------------
# Exact simplex GJK kernel (the default solver — see geometry.origin_simplex_dist)
# ---------------------------------------------------------------------------
#
# Same algorithm as `geometry.origin_simplex_dist`: Johnson-style simplex GJK
# with the distance subalgorithm enumerating all 15 vertex subsets — but here
# each subset's constrained least-norm solve is SPECIALIZED at trace time to
# its closed-form adjugate (1x1/2x2/3x3/4x4), so the whole iteration is a
# fixed chain of [rows, 128]-shaped VPU ops per lane-tile of pairs.

_FEAS_TOL = 1e-6


def _det4(a):
    """4x4 determinant by Laplace expansion along the first two rows.
    ``a``: nested 4x4 list of [1,L] arrays."""
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

    ``subset``: tuple of active slot ids; ``g``: 4x4 nested list of Gram rows
    ([1,L] each).  Returns (xs, s) with xs a dict slot->x and s = sum(x);
    the normalized lam = x/s are the subset's barycentric coordinates."""
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
        xs[col] = _det4(a)
    return xs, xs[0] + xs[1] + xs[2] + xs[3]


_ALL_SUBSETS = [
    tuple(i for i in range(4) if (s >> i) & 1) for s in range(1, 16)
]


def _min_norm_simplex_rows(wx, wy, wz, active):
    """Min-norm point of the active simplex, all-lanes at once.

    ``w{x,y,z}``: [4, L]; ``active``: [4, L] float 0/1.
    Returns (vx, vy, vz, n2, sub) with v*, n2 [1, L] and sub [4, L] 0/1.
    """
    inf = jnp.float32(jnp.inf)
    g = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i, 4):
            gij = (
                wx[i : i + 1] * wx[j : j + 1]
                + wy[i : i + 1] * wy[j : j + 1]
                + wz[i : i + 1] * wz[j : j + 1]
            )
            g[i][j] = gij
            g[j][i] = gij

    best_n2 = None
    best = [None, None, None] + [None] * 4     # vx, vy, vz, sub rows
    for subset in _ALL_SUBSETS:
        xs, s = _subset_solve(subset, g)
        sub_ok = jnp.ones_like(s, dtype=jnp.bool_)
        for i in subset:
            sub_ok = sub_ok & (active[i : i + 1] > 0)
        ok_sum = s > 1e-12
        inv = 1.0 / jnp.where(ok_sum, s, 1.0)
        vx = jnp.zeros_like(s)
        vy = jnp.zeros_like(s)
        vz = jnp.zeros_like(s)
        tot = jnp.zeros_like(s)
        feas = sub_ok & ok_sum
        for i in subset:
            lam = jnp.maximum(xs[i] * inv, 0.0)
            feas = feas & (xs[i] * inv >= -_FEAS_TOL)
            tot = tot + lam
            vx = vx + lam * wx[i : i + 1]
            vy = vy + lam * wy[i : i + 1]
            vz = vz + lam * wz[i : i + 1]
        # degeneracy guard (see geometry._min_norm_simplex): reject noise
        # solutions of affinely-dependent subsets and renormalize so v is a
        # genuine convex combination
        feas = feas & (tot > 0.5)
        inv_tot = 1.0 / jnp.maximum(tot, 0.5)
        vx = vx * inv_tot
        vy = vy * inv_tot
        vz = vz * inv_tot
        n2 = vx * vx + vy * vy + vz * vz
        score = jnp.where(feas, n2, inf)
        if best_n2 is None:
            best_n2 = score
            best[0], best[1], best[2] = vx, vy, vz
            for i in range(4):
                best[3 + i] = jnp.full_like(s, 1.0 if i in subset else 0.0)
        else:
            take = score < best_n2
            best_n2 = jnp.where(take, score, best_n2)
            best[0] = jnp.where(take, vx, best[0])
            best[1] = jnp.where(take, vy, best[1])
            best[2] = jnp.where(take, vz, best[2])
            for i in range(4):
                best[3 + i] = jnp.where(
                    take, 1.0 if i in subset else 0.0, best[3 + i]
                )
    sub = jnp.concatenate(best[3:7], axis=0)       # [4, L]
    return best[0], best[1], best[2], best_n2, sub


def _gjk_exact_kernel(ux_ref, uy_ref, uz_ref,
                      dist_ref, lb_ref, vx_ref, vy_ref, vz_ref,
                      *, iters: int, m: int):
    ux, uy, uz = ux_ref[:], uy_ref[:], uz_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, LANES), 0)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (4, LANES), 0)

    def first_hit_onehot(hit):
        ids = jnp.where(hit, row_ids, jnp.int32(m))
        first = jnp.min(ids, axis=0, keepdims=True)
        return jnp.where(row_ids == first, jnp.float32(1.0), jnp.float32(0.0))

    norms2 = ux * ux + uy * uy + uz * uz
    sel0 = first_hit_onehot(norms2 <= jnp.min(norms2, axis=0, keepdims=True))
    w0x = jnp.sum(sel0 * ux, axis=0, keepdims=True)
    w0y = jnp.sum(sel0 * uy, axis=0, keepdims=True)
    w0z = jnp.sum(sel0 * uz, axis=0, keepdims=True)
    wx = jnp.broadcast_to(w0x, (4, LANES))
    wy = jnp.broadcast_to(w0y, (4, LANES))
    wz = jnp.broadcast_to(w0z, (4, LANES))
    active = jnp.where(slot_ids == 0, jnp.float32(1.0), jnp.float32(0.0))
    tol = jnp.float32(100 * jnp.finfo(jnp.float32).eps)

    def body(_, carry):
        # ``done`` rides the carry as f32 0/1 (Mosaic cannot legalize i1
        # vectors in scf.for carries)
        wx, wy, wz, active, lb_best, bvx, bvy, bvz, bn2, done = carry
        vx, vy, vz, n2, sub = _min_norm_simplex_rows(wx, wy, wz, active)
        better = n2 < bn2                              # monotone best iterate
        bvx = jnp.where(better, vx, bvx)
        bvy = jnp.where(better, vy, bvy)
        bvz = jnp.where(better, vz, bvz)
        bn2 = jnp.where(better, n2, bn2)
        vn = jnp.sqrt(jnp.maximum(n2, jnp.float32(_EPS)))
        scores = ux * vx + uy * vy + uz * vz           # [m, L]
        smin = jnp.min(scores, axis=0, keepdims=True)
        lb_best = jnp.maximum(lb_best, smin / vn)
        sel = first_hit_onehot(scores <= smin)
        sx = jnp.sum(sel * ux, axis=0, keepdims=True)
        sy = jnp.sum(sel * uy, axis=0, keepdims=True)
        sz = jnp.sum(sel * uz, axis=0, keepdims=True)
        n_act = jnp.sum(sub, axis=0, keepdims=True)
        # stale: the support vertex is already an active simplex slot (an
        # f32-degenerate face solve — iterating further would cycle)
        stale = jnp.max(
            jnp.where(
                (active > 0) & (wx == sx) & (wy == sy) & (wz == sz),
                jnp.float32(1.0), jnp.float32(0.0),
            ),
            axis=0, keepdims=True,
        )
        conv = (smin >= n2 - tol * jnp.maximum(n2, 1.0)) | (n_act >= 4) | (stale > 0)
        done = jnp.maximum(done, jnp.where(conv, jnp.float32(1.0), jnp.float32(0.0)))
        # first inactive slot of sub
        free_ids = jnp.where(sub > 0, jnp.int32(4), slot_ids)
        free = jnp.min(free_ids, axis=0, keepdims=True)
        take = (slot_ids == free) & (done < 0.5)
        wx = jnp.where(take, sx, wx)
        wy = jnp.where(take, sy, wy)
        wz = jnp.where(take, sz, wz)
        active = jnp.where(
            done > 0.5, active, jnp.where(take, jnp.float32(1.0), sub)
        )
        return wx, wy, wz, active, lb_best, bvx, bvy, bvz, bn2, done

    lb0 = jnp.full((1, LANES), -jnp.inf, dtype=jnp.float32)
    done0 = jnp.zeros((1, LANES), dtype=jnp.float32)
    zero1 = jnp.zeros((1, LANES), dtype=jnp.float32)
    inf1 = jnp.full((1, LANES), jnp.inf, dtype=jnp.float32)
    wx, wy, wz, active, lb_best, bvx, bvy, bvz, bn2, _ = jax.lax.fori_loop(
        0, iters, body, (wx, wy, wz, active, lb0, zero1, zero1, zero1, inf1, done0)
    )
    vx, vy, vz, n2, _ = _min_norm_simplex_rows(wx, wy, wz, active)
    better = n2 < bn2
    vx = jnp.where(better, vx, bvx)
    vy = jnp.where(better, vy, bvy)
    vz = jnp.where(better, vz, bvz)
    n2 = jnp.where(better, n2, bn2)
    dist = jnp.sqrt(jnp.maximum(n2, jnp.float32(0.0)))
    dist_ref[:] = dist
    lb_ref[:] = jnp.minimum(lb_best, dist)
    vx_ref[:] = vx
    vy_ref[:] = vy
    vz_ref[:] = vz


@functools.partial(jax.jit, static_argnames=("iters",))
def gjk_exact_diffset(u: jnp.ndarray, iters: int = 12) -> geo.HullDist:
    """Exact-GJK distance from the origin to conv(u) for a batch [N, m, 3].

    Matches `geometry.origin_simplex_dist` (same subset-enumeration simplex
    solve, same certified bounds) in one fused TPU dispatch.
    """
    n, m, _ = u.shape
    n_pad = -(-n // LANES) * LANES
    uf = u.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(uf), axis=(1, 2)), 1e-30)   # [N]
    up = jnp.zeros((n_pad, m, 3), dtype=jnp.float32)
    up = up.at[:n].set(uf / scale[:, None, None])
    if n_pad > n:
        filler = jnp.tile(jnp.array([[1.0, 0.0, 0.0]], jnp.float32), (m, 1))
        up = up.at[n:].set(filler)
    ut = up.transpose(1, 0, 2)                              # [m, N_pad, 3]
    ux, uy, uz = ut[..., 0], ut[..., 1], ut[..., 2]

    grid = n_pad // LANES
    spec_in = pl.BlockSpec((m, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * 5
    dist, lb, vx, vy, vz = pl.pallas_call(
        functools.partial(_gjk_exact_kernel, iters=iters, m=m),
        grid=(grid,),
        in_specs=[spec_in, spec_in, spec_in],
        out_specs=[spec_out] * 5,
        out_shape=out_shape,
    )(ux, uy, uz)
    v = jnp.stack([vx[0, :n], vy[0, :n], vz[0, :n]], axis=-1) * scale[:, None]
    return geo.HullDist(dist=dist[0, :n] * scale, lb=lb[0, :n] * scale, v=v)


def gjk_pairs(a: jnp.ndarray, b: jnp.ndarray, iters: int = 24) -> geo.HullDist:
    """Batched hull-hull distance: a [N,ma,3], b [N,mb,3]."""
    diff = (a[:, :, None, :] - b[:, None, :, :]).reshape(a.shape[0], -1, 3)
    return gjk_diffset(diff, iters)


def gjk_points(verts: jnp.ndarray, points: jnp.ndarray, iters: int = 24) -> geo.HullDist:
    """Batched point-hull distance: verts [N,m,3], points [N,3]."""
    return gjk_diffset(verts - points[:, None, :], iters)
