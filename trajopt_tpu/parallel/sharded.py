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


def make_mesh(n_devices: int | None = None, axis: str = ROBOT_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


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
