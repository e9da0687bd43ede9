"""Shared pytree containers for the solver.

The reference keeps all of this in mutable globals and loose Eigen matrices
(`HighOrderCCD/Utils/CCDUtils.h:36-82`); here the problem is an explicit,
immutable bundle of fixed-shape arrays so the entire ADMM iteration jits and
shards.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .ops import splines as _sp


class SplineConsts(NamedTuple):
    """Device-resident constant operators for one trajectory topology.

    Shapes: P pieces, R subdivisions, n = order+1 control points per piece.
    """

    convert: jnp.ndarray      # [P, n, n]
    seg_basis: jnp.ndarray    # [P, R, n, n]
    seg_weight: jnp.ndarray   # [R]
    m_dyn: jnp.ndarray        # [n, n]
    time_weight: jnp.ndarray  # [P]
    piece_idx: jnp.ndarray    # [P, n] int32: stored spline rows per piece

    @property
    def piece_num(self) -> int:
        return self.convert.shape[0]

    @property
    def res(self) -> int:
        return self.seg_basis.shape[1]

    @property
    def n_cp(self) -> int:
        return self.convert.shape[1]

    @property
    def order(self) -> int:
        return self.n_cp - 1

    @property
    def trajectory_num(self) -> int:
        return self.n_cp + (self.piece_num - 1) * (self.order - 2)

    @property
    def whole_weight(self) -> jnp.ndarray:
        return self.time_weight.sum()


def device_consts(ops: _sp.SplineOps, dtype=None) -> SplineConsts:
    """Upload host-built SplineOps to device constants."""
    conv = lambda x: jnp.asarray(x, dtype=dtype)
    return SplineConsts(
        convert=conv(ops.convert),
        seg_basis=conv(ops.seg_basis),
        seg_weight=conv(ops.seg_weight),
        m_dyn=conv(ops.m_dyn),
        time_weight=conv(ops.time_weight),
        piece_idx=jnp.asarray(
            _sp.piece_row_index(ops.piece_num, ops.order), dtype=jnp.int32
        ),
    )


class Planes(NamedTuple):
    """Fixed-K separating half-space table per subdivided segment.

    Constraint: ``c . x + d >= 0`` for every control point ``x`` of the
    segment's hull (reference: variable-length ``c_lists/d_lists``,
    Optimization3D_admm.h:69-197).  ``mask`` marks live slots.
    """

    c: jnp.ndarray     # [P, R, K, 3] unit normals
    d: jnp.ndarray     # [P, R, K]
    mask: jnp.ndarray  # [P, R, K] bool


def empty_planes(piece_num: int, res: int, k: int, dtype=jnp.float32) -> Planes:
    return Planes(
        c=jnp.zeros((piece_num, res, k, 3), dtype=dtype),
        d=jnp.zeros((piece_num, res, k), dtype=dtype),
        mask=jnp.zeros((piece_num, res, k), dtype=bool),
    )


def concat_planes(a: Planes, b: Planes) -> Planes:
    """Concatenate plane tables along the K axis."""
    return Planes(
        c=jnp.concatenate([a.c, b.c], axis=2),
        d=jnp.concatenate([a.d, b.d], axis=2),
        mask=jnp.concatenate([a.mask, b.mask], axis=2),
    )


class PlaneCache(NamedTuple):
    """Persistent per-(segment, obstacle-id) separating-plane cache.

    Parity with the reference's ``optimal_plane=1`` state (``is_seperate /
    seperate_c / seperate_d``, CCDUtils.h:64-70, consumed at
    Optimization3D_admm.h:126-193): planes survive across iterations keyed by
    obstacle id, and a cached plane warm-starts the barrier-optimal
    refinement (`geometry.refine_plane`) instead of restarting from the
    fresh GJK witness — refinement ACCUMULATES.  ``obs_id == -1`` marks an
    empty slot.
    """

    obs_id: jnp.ndarray  # [P, R, K] int32
    c: jnp.ndarray       # [P, R, K, 3] unit normals


def empty_plane_cache(piece_num: int, res: int, k: int, dtype=jnp.float32) -> PlaneCache:
    return PlaneCache(
        obs_id=jnp.full((piece_num, res, k), -1, dtype=jnp.int32),
        c=jnp.zeros((piece_num, res, k, 3), dtype=dtype),
    )


class PairPlaneCache(NamedTuple):
    """Persistent per-(robot, segment, partner-robot) pair-plane cache.

    Multi-robot analog of `PlaneCache`, mirroring the reference's
    ``is_self_seperate / self_seperate_c / self_seperate_d`` tables
    (CCDUtils.h:64-70, consumed at Optimization3D_multi.h:278-327): a pair
    plane keyed by the partner's global robot id survives across iterations
    and warm-starts the symmetric barrier-optimal refinement
    (`geometry.refine_pair_plane`), so refinement ACCUMULATES.
    ``partner == -1`` marks an empty slot.  Leading axis U (local robots) —
    shards with the robot mesh axis.
    """

    partner: jnp.ndarray  # [U, P, R, Ks] int32 global partner ids
    c: jnp.ndarray        # [U, P, R, Ks, 3] unit normals (own side positive)
    d: jnp.ndarray        # [U, P, R, Ks] midplane offsets


def empty_pair_plane_cache(
    u: int, piece_num: int, res: int, ks: int, dtype=jnp.float32
) -> PairPlaneCache:
    return PairPlaneCache(
        partner=jnp.full((u, piece_num, res, ks), -1, dtype=jnp.int32),
        c=jnp.zeros((u, piece_num, res, ks, 3), dtype=dtype),
        d=jnp.zeros((u, piece_num, res, ks), dtype=dtype),
    )


class Scene(NamedTuple):
    """Static obstacle point cloud (padded to fixed N)."""

    points: jnp.ndarray  # [N, 3]
    mask: jnp.ndarray    # [N] bool — live points


def make_scene(points: np.ndarray, pad_to: int | None = None, dtype=None) -> Scene:
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    pad_to = pad_to or n
    assert pad_to >= n
    padded = np.full((pad_to, 3), 1e8, dtype=np.float64)
    padded[:n] = pts
    mask = np.zeros(pad_to, dtype=bool)
    mask[:n] = True
    return Scene(points=jnp.asarray(padded, dtype=dtype), mask=jnp.asarray(mask))


class SolverState(NamedTuple):
    """Full ADMM state for one robot (stack leading axes for robots/batches).

    Mirrors the variables threaded through
    `Optimization3D_admm::optimization` (Optimization3D_admm.h:29-67).
    """

    spline: jnp.ndarray      # [T, 3] stored control rows
    piece_time: jnp.ndarray  # []      scalar time multiplier
    p_slack: jnp.ndarray     # [P, n, 3] per-piece slack control points
    t_slack: jnp.ndarray     # [P]
    p_lambda: jnp.ndarray    # [P, n, 3] duals for the control-point split
    t_lambda: jnp.ndarray    # [P]


class StepDiag(NamedTuple):
    """Per-iteration diagnostics (reference prints these ad hoc)."""

    gnorm: jnp.ndarray            # reduced-KKT gradient norm
    consensus_residual: jnp.ndarray
    step: jnp.ndarray             # accepted line-search step
    ccd_step: jnp.ndarray         # CCD-clamped max step
    n_planes: jnp.ndarray         # live separating planes
    energy: jnp.ndarray           # AL spline energy after the update
    infeasible: jnp.ndarray       # bool: barrier found an infeasible point
    # bool: more in-radius candidate pairs than plane_gjk_budget /
    # self_plane_gjk_budget GJK slots — overflow pairs get NO barrier plane
    # this iteration (CCD still keeps the trajectory safe); raise the budget
    plane_overflow: jnp.ndarray = False


def init_state(
    ops: _sp.SplineOps,
    way_points: np.ndarray,
    init_piece_time: float = 20.0,
    dtype=None,
    layout: str = "single",
) -> SolverState:
    """Build the initial ADMM state from waypoints.

    Mirrors `init_variable` (Main/admmPathPlanning3D.cpp:249-291): spline from
    waypoints with pinned ends, slack = converted spline, duals zero,
    per-piece slack times = initial piece_time.  ``layout``: see
    `ops.splines.waypoints_to_spline`.
    """
    spline = _sp.waypoints_to_spline(way_points, ops.order, layout=layout)
    assert spline.shape[0] == ops.trajectory_num
    idx = _sp.piece_row_index(ops.piece_num, ops.order)
    pieces = spline[idx]                                   # [P, n, 3]
    p_slack = np.einsum("pij,pjd->pid", ops.convert, pieces)
    p = ops.piece_num
    return SolverState(
        spline=jnp.asarray(spline, dtype=dtype),
        # np scalar => strongly-typed array, so the first admm_step output has
        # identical avals and the jit cache hits from call one
        piece_time=jnp.asarray(np.float64(init_piece_time), dtype=dtype),
        p_slack=jnp.asarray(p_slack, dtype=dtype),
        t_slack=jnp.full((p,), init_piece_time, dtype=dtype),
        p_lambda=jnp.zeros((p, ops.order + 1, 3), dtype=dtype),
        t_lambda=jnp.zeros((p,), dtype=dtype),
    )
