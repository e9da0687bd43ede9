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


def gjk_pairs(a: jnp.ndarray, b: jnp.ndarray, iters: int = 24) -> geo.HullDist:
    """Batched hull-hull distance: a [N,ma,3], b [N,mb,3]."""
    diff = (a[:, :, None, :] - b[:, None, :, :]).reshape(a.shape[0], -1, 3)
    return gjk_diffset(diff, iters)


def gjk_points(verts: jnp.ndarray, points: jnp.ndarray, iters: int = 24) -> geo.HullDist:
    """Batched point-hull distance: verts [N,m,3], points [N,3]."""
    return gjk_diffset(verts - points[:, None, :], iters)
