"""Outer ADMM loop drivers.

Two modes, matching the measurement protocol of the reference main loop
(Main/admmPathPlanning3D.cpp:498-547):

* ``solve``      — host-stepped loop (one device->host scalar sync per
                   iteration) with JSONL-able per-iteration metrics; this is
                   what the CLI uses.
* ``solve_fused``— the whole ``while gnorm >= stop`` loop as one
                   ``lax.while_loop`` on device; this is what the benchmark
                   uses (zero host round-trips).

Convergence gate: ``iter > 1 and gnorm < stop`` exactly as the reference
(Main/admmPathPlanning3D.cpp:504).
"""

from __future__ import annotations

import functools
import time
import warnings
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrajOptConfig
from ..types import Scene, SolverState, SplineConsts, StepDiag
from ..ops import broadphase as bp
from ..ops import energies as en
from . import admm


def initial_clearance(
    consts: SplineConsts, state: SolverState, scene: Scene
) -> float:
    """Min distance from the initial control hulls to the obstacle cloud.

    The solver (like the reference, whose CCD loop at Step.h:88-100 would spin
    forever) requires a collision-free initialization with clearance > offset;
    this is the cheap conservative check (hull AABB vs points) used to warn
    early instead of stalling silently at step=0.
    """
    from ..ops import geometry as geo

    hull = en.seg_cps(consts, state.spline)                 # [P,R,n,3]
    cand = bp.topk_candidates(hull, scene, radius=jnp.inf, k=8)
    pts = scene.points[cand.idx]                            # [P,R,8,3]
    p, r, k, _ = pts.shape
    hull_f = hull.reshape(p * r, -1, 3)
    pts_f = pts.reshape(p * r, k, 3)

    def per_seg(h, q):
        return jax.vmap(lambda pt: geo.point_hull_distance(h, pt, 32).dist)(q)

    d = jax.vmap(per_seg)(hull_f, pts_f)
    return float(d.min())


def initial_pair_clearance(consts: SplineConsts, state: SolverState) -> float:
    """Min pairwise hull-hull distance of a fleet state at equal segment
    index (the quantity the pairwise CCD certifies against ``offset``).

    Used by `solve_multi` to warn on a colliding initialization instead of
    silently freezing at step 0 — the multi analog of `initial_clearance`.
    """
    from ..ops import geometry as geo

    hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(state.spline)
    u, p, r, n, _ = hulls.shape
    if u < 2:
        return float("inf")
    iu, ju = np.triu_indices(u, 1)
    diff = (
        hulls[iu][:, :, :, :, None, :] - hulls[ju][:, :, :, None, :, :]
    ).reshape(-1, n * n, 3)
    d = geo.batched_origin_dist(diff, 48, False).dist
    return float(d.min())


def warn_on_coarse_overflow(
    consts: SplineConsts, cfg: TrajOptConfig, spline: jnp.ndarray, scene: Scene
) -> None:
    """One-time audit of the two-level broad phase: warn if any piece box has
    more in-radius points than ``broadphase_coarse_k`` can hold (the filter
    would then silently trim the farthest true candidates —
    `ops/broadphase.py::topk_candidates`)."""
    if not cfg.broadphase_coarse_k:
        return
    spline = spline if spline.ndim == 3 else spline[None]  # [U,T,3]
    hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(spline)
    ov = jax.vmap(
        lambda h: bp.coarse_overflow(
            h, scene, cfg.offset + cfg.margin, cfg.broadphase_coarse_k
        )
    )(hulls)
    if bool(np.any(np.asarray(ov))):
        warnings.warn(
            f"broad-phase coarse filter overflow: some piece boxes have more "
            f"than broadphase_coarse_k={cfg.broadphase_coarse_k} in-radius "
            "obstacle points; separating-plane quality may degrade — raise "
            "broadphase_coarse_k (or set it to 0 for the direct path)",
            stacklevel=3,
        )


def _warn_plane_overflow(cfg: TrajOptConfig, diag, history: list) -> None:
    """One warning per solve when the plane-GJK compaction dropped live
    in-radius candidate pairs (SURVEY §7.3 fixed-K overflow telemetry)."""
    if bool(diag.plane_overflow) and sum(
        1 for h in history if h.get("plane_overflow")
    ) == 1:
        warnings.warn(
            "separating-plane GJK budget overflow: more in-radius candidate "
            f"pairs than plane_gjk_budget={cfg.plane_gjk_budget} / "
            f"self_plane_gjk_budget={cfg.self_plane_gjk_budget} slots; "
            "overflow pairs get no barrier plane this iteration (CCD still "
            "prevents collisions) — raise the budget for dense scenes",
            stacklevel=3,
        )


def solve(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    scene: Scene,
    max_iters: int | None = None,
    callback: Callable[[int, StepDiag], None] | None = None,
    validate_init: bool = True,
    checkpointer=None,
) -> tuple[SolverState, list[dict]]:
    """Host-driven ADMM loop with per-iteration metrics.

    ``checkpointer``: optional `runtime.checkpoint.CheckpointManager`; the
    loop resumes from its latest checkpoint and saves every N iterations.
    """
    max_iters = max_iters if max_iters is not None else cfg.max_iters
    if validate_init:
        clr = initial_clearance(consts, state, scene)
        if clr <= cfg.offset:
            warnings.warn(
                f"initial trajectory clearance {clr:.4f} <= offset "
                f"{cfg.offset}: the CCD safety clamp will block all motion "
                "(the solver, like the reference, requires a collision-free "
                "initialization — use the RRT planner or better waypoints)",
                stacklevel=2,
            )
        warn_on_coarse_overflow(consts, cfg, state.spline, scene)
    history: list[dict] = []
    it = 0
    gnorm = np.inf
    # optimal_plane=1: thread the persistent plane cache (CCDUtils.h:64-70)
    cache = None
    if cfg.optimal_plane:
        from ..types import empty_plane_cache

        cache = empty_plane_cache(
            consts.piece_num, consts.res, cfg.max_planes, state.spline.dtype
        )
    if checkpointer is not None:
        restored = checkpointer.restore_latest_full(dtype=state.spline.dtype)
        if restored is not None:
            state, meta, saved_cache = restored
            it = meta["step"] + 1
            gnorm = meta.get("extra", {}).get("gnorm", np.inf)
            if cfg.optimal_plane and saved_cache is not None:
                # resume keeps the accumulated plane refinement instead of
                # silently restarting from an empty cache
                cache = saved_cache
    while it < max_iters:
        if it > 1 and gnorm < cfg.stop:
            break
        t0 = time.perf_counter()
        if cache is not None:
            state, diag, cache = admm.admm_step_cached(
                consts, cfg, state, scene, cache
            )
        else:
            state, diag = admm.admm_step(consts, cfg, state, scene)
        gnorm = float(diag.gnorm)
        rec = {
            "iter": it,
            "gnorm": gnorm,
            "consensus_residual": float(diag.consensus_residual),
            "step": float(diag.step),
            "ccd_step": float(diag.ccd_step),
            "n_planes": int(diag.n_planes),
            "energy": float(diag.energy),
            "plane_overflow": bool(diag.plane_overflow),
            "piece_time": float(state.piece_time),
            "wall_ms": (time.perf_counter() - t0) * 1e3,
        }
        history.append(rec)
        _warn_plane_overflow(cfg, diag, history)
        if callback:
            callback(it, diag)
        if checkpointer is not None:
            checkpointer.maybe_save(it, state, extra={"gnorm": gnorm}, cache=cache)
        it += 1
    return state, history


def solve_multi(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,          # leading robot axis U on all leaves
    scene: Scene,
    coupled: bool | None = None,
    max_iters: int | None = None,
    checkpointer=None,
) -> tuple[SolverState, list[dict]]:
    """Host-driven multi-robot loop (coupled defaults to ``not cfg.decouple``,
    the reference's mode switch, Main/multiPathPlanning3D.cpp:664-678).

    ``checkpointer``: optional `runtime.checkpoint.CheckpointManager`; resumes
    from its latest checkpoint (the whole robot-batched state is one pytree)
    and saves every N iterations — preemption-safe long multi-robot runs.
    """
    from . import multi as multi_mod

    coupled = (not cfg.decouple) if coupled is None else coupled
    max_iters = max_iters if max_iters is not None else cfg.max_iters
    warn_on_coarse_overflow(consts, cfg, state.spline, scene)
    clr = initial_pair_clearance(consts, state)
    if clr <= cfg.offset:
        warnings.warn(
            f"initial min pairwise robot clearance {clr:.4f} <= offset "
            f"{cfg.offset}: the pairwise CCD clamp will freeze all motion at "
            "step 0 (the solver, like the reference's Step.h shrink loops, "
            "requires a collision-free initialization — separate the initial "
            "paths, e.g. by lane offsets or the RRT planner)",
            stacklevel=2,
        )
    history: list[dict] = []
    it, gnorm = 0, np.inf
    # optimal_plane=1: persistent multi-robot plane caches (obstacle +
    # robot-pair, Optimization3D_multi.h:278-327) — refinement accumulates
    caches = None
    if cfg.optimal_plane:
        caches = multi_mod.init_multi_caches(
            cfg, consts, state.spline.shape[0], state.spline.dtype
        )
    if checkpointer is not None:
        restored = checkpointer.restore_latest_full(dtype=state.spline.dtype)
        if restored is not None:
            state, meta, saved_caches = restored
            it = meta["step"] + 1
            gnorm = meta.get("extra", {}).get("gnorm", np.inf)
            if (
                cfg.optimal_plane
                and isinstance(saved_caches, tuple)
                and len(saved_caches) == 2
            ):
                # resume keeps the accumulated obstacle + pair plane
                # refinement (Optimization3D_multi.h:278-327) instead of
                # silently restarting from empty caches
                caches = saved_caches
    while it < max_iters:
        if it > 1 and gnorm < cfg.stop:
            break
        t0 = time.perf_counter()
        if caches is not None:
            state, diag, caches = multi_mod.multi_admm_step_cached_jit(
                consts, cfg, state, scene, coupled, caches
            )
        else:
            state, diag = multi_mod.multi_admm_step_jit(
                consts, cfg, state, scene, coupled
            )
        gnorm = float(diag.gnorm)
        history.append(
            {
                "iter": it,
                "gnorm": gnorm,
                "consensus_residual": float(diag.consensus_residual),
                "step": float(diag.step),
                "ccd_step": float(diag.ccd_step),
                "n_planes": int(diag.n_planes),
                "energy": float(diag.energy),
                "plane_overflow": bool(diag.plane_overflow),
                "piece_time": float(jnp.max(state.piece_time)),
                "wall_ms": (time.perf_counter() - t0) * 1e3,
            }
        )
        _warn_plane_overflow(cfg, diag, history)
        if checkpointer is not None:
            checkpointer.maybe_save(
                it, state, extra={"gnorm": gnorm}, cache=caches
            )
        it += 1
    return state, history


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def solve_fused(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,
    scene: Scene,
    max_iters: int = 200,
) -> tuple[SolverState, jnp.ndarray, jnp.ndarray]:
    """Entire solve as one device-side while_loop.

    Returns (state, iterations_run, final_gnorm).
    """

    def cond(carry):
        state, it, gnorm = carry
        return (it < max_iters) & ((it <= 1) | (gnorm >= cfg.stop))

    def body(carry):
        state, it, gnorm = carry
        state, diag = admm.admm_step(consts, cfg, state, scene)
        return state, it + 1, diag.gnorm

    state, it, gnorm = jax.lax.while_loop(
        cond, body, (state, jnp.asarray(0), jnp.asarray(jnp.inf, state.piece_time.dtype))
    )
    return state, it, gnorm


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "coupled", "max_iters", "axis_name", "interact", "groups"
    ),
)
def solve_fused_multi(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,          # leading robot axis U on all leaves
    scene: Scene,
    coupled: bool,
    max_iters: int = 200,
    axis_name: str | None = None,
    interact: bool = True,
    groups: int = 1,
) -> tuple[SolverState, jnp.ndarray, jnp.ndarray]:
    """Entire multi-robot solve as one device-side while_loop (zero host
    round-trips — the production serving path; under shard_map pass the mesh
    ``axis_name`` and the loop carries the collectives inside).

    Returns (state, iterations_run, final_gnorm).
    """
    from . import multi as multi_mod

    def cond(carry):
        state, it, gnorm = carry
        return (it < max_iters) & ((it <= 1) | (gnorm >= cfg.stop))

    def body(carry):
        state, it, gnorm = carry
        state, diag = multi_mod.multi_admm_step(
            consts, cfg, state, scene, coupled=coupled, axis_name=axis_name,
            interact=interact, groups=groups,
        )
        return state, it + 1, diag.gnorm

    state, it, gnorm = jax.lax.while_loop(
        cond, body,
        (state, jnp.asarray(0), jnp.asarray(jnp.inf, state.piece_time.dtype)),
    )
    return state, it, gnorm


@functools.partial(
    jax.jit, static_argnames=("cfg", "coupled", "max_iters", "axis_name")
)
def solve_fused_multi_cached(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    state: SolverState,          # leading robot axis U on all leaves
    scene: Scene,
    coupled: bool,
    caches,                      # (obstacle PlaneCache [U,...], PairPlaneCache)
    max_iters: int = 200,
    axis_name: str | None = None,
) -> tuple[SolverState, jnp.ndarray, jnp.ndarray, object]:
    """`solve_fused_multi` with the persistent optimal_plane=1 caches carried
    through the device loop (reference semantics: the plane tables accumulate
    across the WHOLE run, Optimization3D_multi.h:278-327 — round-4 review
    flagged the fused path silently running cache-less).

    Returns (state, iterations_run, final_gnorm, caches).
    """
    from . import multi as multi_mod

    def cond(carry):
        state, it, gnorm, caches = carry
        return (it < max_iters) & ((it <= 1) | (gnorm >= cfg.stop))

    def body(carry):
        state, it, gnorm, caches = carry
        state, diag, caches = multi_mod.multi_admm_step_cached(
            consts, cfg, state, scene, coupled, caches, axis_name=axis_name
        )
        return state, it + 1, diag.gnorm, caches

    state, it, gnorm, caches = jax.lax.while_loop(
        cond, body,
        (state, jnp.asarray(0),
         jnp.asarray(jnp.inf, state.piece_time.dtype), caches),
    )
    return state, it, gnorm, caches


def solve_fused_batch(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    states: SolverState,         # leading SCENARIO axis B on all leaves
    scene: Scene,
    max_iters: int = 200,
) -> tuple[SolverState, jnp.ndarray, jnp.ndarray]:
    """Scenario-batched single-robot solves sharing one scene, as one fused
    device loop.

    This is NOT `vmap(solve_fused)`: vmap lowers every batched `lax.cond` to
    a `select` that executes BOTH branches, so each scenario pays the full
    GJK candidate table, the full Armijo ladder, and un-gated CCD every
    iteration — measured as the round-4 batch-throughput plateau (~3.4x
    aggregate).  Here the batch rides the multi-robot machinery with
    ``interact=False`` (no pair planes / pair CCD): predicates are
    batch-global scalars so the conds stay real branches, and the
    plane/broad-phase/CCD danger compaction pools candidates across the
    whole batch.  Convergence gate: mean gnorm over scenarios (the
    reference's multi-robot gnorm semantics, Optimization3D_multi.h:72).

    Returns (states, iterations_run, final_mean_gnorm).
    """
    return solve_fused_multi(
        consts, cfg, states, scene, coupled=False, max_iters=max_iters,
        interact=False,
    )


def solve_fused_batch_multi(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    states: SolverState,         # leading [B, U] scenario x robot axes
    scene: Scene,
    coupled: bool = True,
    max_iters: int = 200,
) -> tuple[SolverState, jnp.ndarray, jnp.ndarray]:
    """Scenario-batched MULTI-robot solves sharing one scene: B independent
    U-robot fleets advanced in lockstep in one fused device loop.

    The [B, U] axes flatten into one grouped fleet (``groups=B``): pair
    planes and pair CCD are masked scenario-block-diagonal, and in coupled
    mode the shared-time Schur sums / joint CCD min / joint Armijo become
    per-group reductions (`solver.multi._coupled_grouped_update`) — per-group
    math identical to a standalone coupled solve.  Same rationale as
    `solve_fused_batch`: no vmapped conds, batch-pooled compaction.

    Returns (states [B, U, ...], iterations_run, final_mean_gnorm).
    """
    b, u = states.spline.shape[:2]
    flat = jax.tree.map(
        lambda x: x.reshape((b * u,) + x.shape[2:]), states
    )
    out, it, gnorm = solve_fused_multi(
        consts, cfg, flat, scene, coupled=coupled, max_iters=max_iters,
        groups=b,
    )
    out = jax.tree.map(lambda x: x.reshape((b, u) + x.shape[1:]), out)
    return out, it, gnorm
