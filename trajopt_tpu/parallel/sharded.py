"""Robot/scenario sharding over a `jax.sharding.Mesh`.

The reference is single-process with no distribution (SURVEY.md §2.3); this
module provides the TPU-native scaling story:

* ``robot`` axis  — robots sharded across chips; the four cross-robot
  couplings inside `multi_admm_step` (hull all_gather for pair planes, the
  shared-time Schur psum, the joint CCD/Armijo reductions, gnorm) ride ICI as
  collectives.
* ``scenario`` axis — embarrassingly parallel batched solves (vmap inside a
  shard).

Collectives enter through ``axis_name`` plumbing in `solver/multi.py` —
no separate distributed code path: the same function runs single-chip
(axis_name=None) and sharded, which is what the equivalence tests check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import TrajOptConfig
from ..types import Scene, SolverState, SplineConsts, StepDiag
from ..solver import multi as multi_mod

ROBOT_AXIS = "robot"
SCENARIO_AXIS = "scenario"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host wiring: `jax.distributed.initialize` (idempotent no-op when
    already initialized or when running single-process with no coordinator).

    On a TPU pod slice all three arguments are auto-detected from the
    environment; on CPU/GPU clusters pass them explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).  After this,
    `jax.devices()` spans every host and `make_mesh`/`make_mesh_2d` lay
    collectives over ICI within a host-group and DCN across groups (XLA picks
    the transport per mesh axis; keep the robot axis innermost so its
    all_gather/psum ride ICI — SURVEY.md §2.3).
    """
    try:  # already-initialized check that does NOT initialize the backend
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return
    except (ImportError, AttributeError):
        pass
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return                          # single-process run: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        cluster_detection_method="deactivate",
    )


def make_mesh(n_devices: int | None = None, axis: str = ROBOT_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def make_mesh_2d(
    n_scenario: int, n_robot: int, devices=None
) -> Mesh:
    """2-D (scenario, robot) mesh: outer scenario axis (independent solves —
    zero communication, may cross DCN), inner robot axis (the consensus
    collectives — keep within an ICI domain).  Device order follows
    `jax.devices()`, which enumerates ICI-contiguous devices first."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_scenario * n_robot
    if len(devs) < need:
        raise ValueError(f"mesh {n_scenario}x{n_robot} needs {need} devices, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_scenario, n_robot)
    return Mesh(grid, (SCENARIO_AXIS, ROBOT_AXIS))


def sharded_multi_step(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    mesh: Mesh,
    coupled: bool = True,
):
    """Build a jitted multi-robot ADMM step with the robot axis sharded.

    Requires U % mesh.shape[robot] == 0 (pad robot count to the mesh size).
    Returns ``step(state, scene) -> (state, diag)`` with state leaves sharded
    on their leading robot axis and diag replicated.
    """

    def body(consts_, state, scene):
        new_state, diag = multi_mod.multi_admm_step(
            consts_, cfg, state, scene, coupled, axis_name=ROBOT_AXIS
        )
        return new_state, diag

    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(ROBOT_AXIS), P()),
        out_specs=(P(ROBOT_AXIS), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: SolverState, scene: Scene):
        return sm(consts, state, scene)

    return step


def sharded_multi_step_2d(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    mesh: Mesh,
    coupled: bool = True,
):
    """Jitted multi-robot ADMM step on a 2-D (scenario, robot) mesh.

    State leaves carry leading [B, U, ...] axes — B independent scenarios
    (sharded over SCENARIO_AXIS, no communication) of U robots each (sharded
    over ROBOT_AXIS; the four consensus collectives of `multi_admm_step` run
    per-scenario over the robot axis).  ``scene`` leaves carry a leading [B]
    scenario axis (per-scenario obstacle clouds), sharded over SCENARIO_AXIS.

    Requires B % mesh.shape[scenario] == 0 and U % mesh.shape[robot] == 0.
    Returns ``step(states, scenes) -> (states, diags)`` with diag leaves
    shaped [B].
    """

    def body(consts_, states, scenes):
        def one(state, scene):
            return multi_mod.multi_admm_step(
                consts_, cfg, state, scene, coupled, axis_name=ROBOT_AXIS
            )

        return jax.vmap(one)(states, scenes)

    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(SCENARIO_AXIS, ROBOT_AXIS), P(SCENARIO_AXIS)),
        out_specs=(P(SCENARIO_AXIS, ROBOT_AXIS), P(SCENARIO_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def step(states: SolverState, scenes: Scene):
        return sm(consts, states, scenes)

    return step


def scenario_sharded_solver(
    consts: SplineConsts,
    cfg: TrajOptConfig,
    mesh: Mesh,
    max_iters: int = 200,
    axis: str = "scenario",
):
    """Batched independent single-robot solves, one shard of scenarios per
    device (the scenario-batched config of BASELINE.json)."""

    def one_solve(state, scene):
        from ..solver import driver

        return driver.solve_fused(consts, cfg, state, scene, max_iters=max_iters)

    def body(states, scenes):
        return jax.vmap(one_solve)(states, scenes)

    sm = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sm)
