"""Broad-phase candidate generation as dense device math.

The reference maintains three per-axis dynamic AABB trees and walks them per
segment (`HighOrderCCD/BVH/BVH.cpp`, vendored `AABB.cc`).  On TPU the right
structure is no structure: for the scales this solver targets
(segments x obstacles up to ~10^7 pairs) one fused point-to-AABB distance
computation plus a per-segment ``top_k`` is a handful of matmul-shaped ops,
runs entirely on device, and produces the fixed-K candidate tables jit needs.
For clouds beyond that, `trajopt_tpu.runtime` provides a host-side C++ voxel
prefilter applied once per scene.

Candidate semantics mirror `BVH::DCDCollision` / `BVH::CCDCollision`
(BVH.cpp:149-250): a segment's (swept) control-hull AABB, fattened by the
query margin, against every obstacle point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import Scene
from . import pallas_topk as ptk


class Candidates(NamedTuple):
    idx: jnp.ndarray   # [P, R, K] obstacle indices (int32)
    mask: jnp.ndarray  # [P, R, K] bool — candidate within query radius
    d2: jnp.ndarray    # [P, R, K] squared point-to-AABB distance


def aabb_point_dist2(
    lo: jnp.ndarray, hi: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Squared distance from each point to each AABB.

    lo/hi: [..., 3]; points: [N, 3] -> [..., N]
    """
    p = points  # [N,3]
    d = jnp.maximum(lo[..., None, :] - p, 0.0) + jnp.maximum(p - hi[..., None, :], 0.0)
    return jnp.sum(d * d, axis=-1)


def hull_aabbs(hull: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """AABBs of control hulls: [..., n, 3] -> ([..., 3], [..., 3])."""
    return hull.min(axis=-2), hull.max(axis=-2)


def topk_candidates(
    hull: jnp.ndarray,        # [P, R, n, 3] (use swept hulls for CCD)
    scene: Scene,
    radius: float,
    k: int,
    coarse_k: int = 0,
) -> Candidates:
    """K nearest obstacles per segment by point-to-AABB distance, masked to
    those within ``radius`` of the hull AABB.

    ``coarse_k > 0`` enables the two-level exact filter: one per-*piece*
    ``top_k`` over the full cloud (the piece AABB unions all its segments'
    hulls, so a point within ``radius`` of any segment is within ``radius``
    of the piece box — exactness is preserved while the expensive per-segment
    ``top_k`` runs over ``coarse_k`` points instead of N).  This is the TPU
    analog of the reference's AABB-tree descent (BVH.cpp:149-250): level 1 is
    the tree's upper levels, level 2 the leaf scan.  If more than ``coarse_k``
    points fall within radius of a piece box the overflow trims the *farthest*
    candidates (use `coarse_overflow` to audit a scene/config pair).
    """
    lo, hi = hull_aabbs(hull)                              # [P,R,3]
    n_points = scene.points.shape[0]
    coarse_k = max(coarse_k, k) if coarse_k > 0 else 0  # top_k(k) needs k<=Ck
    if 0 < coarse_k < n_points:
        plo, phi = lo.min(axis=-2), hi.max(axis=-2)        # [P,3] piece boxes
        d2p = aabb_point_dist2(plo, phi, scene.points)     # [P,N]
        d2p = jnp.where(scene.mask, d2p, jnp.inf)
        _, cidx = ptk.smallest_k(d2p, coarse_k)            # [P,Ck]
        sub = scene.points[cidx]                           # [P,Ck,3]
        subok = jnp.take_along_axis(
            jnp.broadcast_to(scene.mask, d2p.shape), cidx, axis=1
        )
        d = jnp.maximum(lo[..., None, :] - sub[:, None], 0.0) + jnp.maximum(
            sub[:, None] - hi[..., None, :], 0.0
        )                                                  # [P,R,Ck,3]
        d2 = jnp.where(subok[:, None], jnp.sum(d * d, axis=-1), jnp.inf)
        nd2, loc = ptk.smallest_k(d2, k)                   # [P,R,K]
        idx = jnp.take_along_axis(cidx[:, None], loc, axis=2)
    else:
        d2 = aabb_point_dist2(lo, hi, scene.points)        # [P,R,N]
        d2 = jnp.where(scene.mask, d2, jnp.inf)
        nd2, idx = ptk.smallest_k(d2, k)                   # [P,R,K]
    mask = nd2 <= radius * radius
    return Candidates(idx=idx.astype(jnp.int32), mask=mask, d2=nd2)


def fleet_candidates(
    hulls: jnp.ndarray,       # [U, P, R, n, 3] all robots' segment hulls
    scene: Scene,
    radius: float,
    k: int,
    coarse_k: int = 64,
    piece_budget: int = 32,
) -> tuple[Candidates, jnp.ndarray]:
    """Fleet-batched two-level candidate tables with DANGEROUS-PIECE
    compaction: only the ``piece_budget`` pieces nearest the cloud run the
    coarse top-k at all.

    EXACT under the returned overflow flag: a piece whose box-to-cloud min
    distance exceeds ``radius`` has no in-radius point for ANY of its
    segments (the piece box contains every segment hull, so point-to-box
    distance lower-bounds point-to-hull distance) — its table is all-masked
    either way.  ``overflow`` is True when more than ``piece_budget`` pieces
    are within radius (surfaced via StepDiag.plane_overflow; raise the
    budget for dense scenes).

    Replaces the round-4 path (per-robot `topk_candidates` under vmap),
    whose [U*P, N] `lax.top_k` lowered to a full TPU sort (~0.5 ms/iter at
    the 64-robot bench) plus two pathological scalar gathers (~0.5 ms) —
    the piece compaction runs the same math on ~32 rows instead of 256.

    Returns (Candidates [U,P,R,K], overflow).
    """
    u, p, r, n, _ = hulls.shape
    n_pts = scene.points.shape[0]
    up = u * p
    dtype = hulls.dtype
    lo, hi = hull_aabbs(hulls)                             # [U,P,R,3]
    lo_f = lo.reshape(up, r, 3)
    hi_f = hi.reshape(up, r, 3)
    plo = lo_f.min(axis=1)                                 # [UP,3] piece boxes
    phi = hi_f.max(axis=1)

    # level 0: fused piece-box-to-cloud min distances (no materialization)
    d2p = aabb_point_dist2(plo, phi, scene.points)         # [UP,N]
    d2p = jnp.where(scene.mask, d2p, jnp.inf)
    pmin = jnp.min(d2p, axis=-1)                           # [UP]
    r2 = radius * radius
    wp = min(piece_budget, up)
    overflow = jnp.sum(pmin <= r2) > wp

    k = min(k, n_pts)
    ck = max(coarse_k, k)
    ck = min(ck, n_pts)

    _, sel2 = ptk.smallest_k(pmin[None], wp)               # [1,Wp]
    sel = sel2[0]                                          # [Wp] piece ids

    # level 1: coarse top-k over the cloud, selected pieces only
    d2s = aabb_point_dist2(plo[sel], phi[sel], scene.points)   # [Wp,N]
    d2s = jnp.where(scene.mask, d2s, jnp.inf)
    cvals, cidx = ptk.smallest_k(d2s, ck)                  # [Wp,Ck]
    sub = scene.points[cidx]                               # [Wp,Ck,3]

    # level 2: per-segment nearest-k among the coarse candidates
    slo = lo_f[sel]                                        # [Wp,R,3]
    shi = hi_f[sel]
    d = jnp.maximum(slo[:, :, None] - sub[:, None], 0.0) + jnp.maximum(
        sub[:, None] - shi[:, :, None], 0.0
    )                                                      # [Wp,R,Ck,3]
    d2 = jnp.sum(d * d, axis=-1)
    # dead coarse slots (masked points / short clouds) carry cvals == inf
    d2 = jnp.where(jnp.isfinite(cvals)[:, None], d2, jnp.inf)
    nd2, loc = ptk.smallest_k(d2, k)                       # [Wp,R,K]
    # remap coarse-slot -> cloud id as a one-hot contraction: a 32k-element
    # scalar `take_along_axis` measured 0.4 ms (1.5 GiB/s) on TPU, while the
    # [Wp*R*K, Ck] one-hot matmul is ~2 MFLOP (cloud ids < 2^24 are exact
    # in f32)
    onehot = (
        loc[..., None] == jnp.arange(ck, dtype=loc.dtype)
    ).astype(dtype)                                        # [Wp,R,K,Ck]
    idx = jnp.einsum("wrkc,wc->wrk", onehot, cidx.astype(dtype))
    idx = idx.astype(jnp.int32)

    # scatter the compacted tables back to the full fleet layout
    idx_full = jnp.zeros((up, r, k), jnp.int32).at[sel].set(idx)
    d2_full = jnp.full((up, r, k), jnp.inf, dtype).at[sel].set(nd2)
    mask_full = (
        jnp.zeros((up, r, k), bool).at[sel].set(nd2 <= r2)
    )
    return (
        Candidates(
            idx=idx_full.reshape(u, p, r, k),
            mask=mask_full.reshape(u, p, r, k),
            d2=d2_full.reshape(u, p, r, k),
        ),
        overflow,
    )


def coarse_overflow(
    hull: jnp.ndarray, scene: Scene, radius: float, coarse_k: int
) -> jnp.ndarray:
    """[P] bool: does any piece box have more than ``coarse_k`` in-radius
    points (i.e. could the two-level filter drop a true candidate)?"""
    lo, hi = hull_aabbs(hull)
    plo, phi = lo.min(axis=-2), hi.max(axis=-2)
    d2p = aabb_point_dist2(plo, phi, scene.points)
    d2p = jnp.where(scene.mask, d2p, jnp.inf)
    return jnp.sum(d2p <= radius * radius, axis=-1) > coarse_k


def pairwise_robot_dist2(
    hulls: jnp.ndarray,  # [U, P, R, n, 3] all robots' segment hulls
) -> jnp.ndarray:
    """[P, R, U, U] squared AABB distances between robots per segment
    (reference: BVH::SelfDCDCollision builds a fresh tree per segment,
    BVH.cpp:252-287)."""
    lo, hi = hull_aabbs(hulls)                             # [U,P,R,3]
    lo = jnp.moveaxis(lo, 0, 2)                            # [P,R,U,3]
    hi = jnp.moveaxis(hi, 0, 2)
    gap = jnp.maximum(lo[..., :, None, :] - hi[..., None, :, :], 0.0)
    gap = jnp.maximum(gap, jnp.maximum(lo[..., None, :, :] - hi[..., :, None, :], 0.0))
    return jnp.sum(gap * gap, axis=-1)


class PairCandidates(NamedTuple):
    idx: jnp.ndarray   # [U, P, R, Ks] other-robot indices per robot
    mask: jnp.ndarray  # [U, P, R, Ks]


def topk_pair_candidates(
    hulls: jnp.ndarray, radius: float, k: int
) -> PairCandidates:
    """Per robot & segment: the K nearest other robots within ``radius``."""
    u = hulls.shape[0]
    d2 = pairwise_robot_dist2(hulls)                       # [P,R,U,U]
    eye = jnp.eye(u, dtype=bool)
    d2 = jnp.where(eye, jnp.inf, d2)
    k = min(k, max(u - 1, 1))
    neg, idx = jax.lax.top_k(-d2, k)                       # [P,R,U,K]
    mask = (-neg) <= radius * radius
    idx = jnp.moveaxis(idx, 2, 0)                          # [U,P,R,K]
    mask = jnp.moveaxis(mask, 2, 0)
    return PairCandidates(idx=idx.astype(jnp.int32), mask=mask)
