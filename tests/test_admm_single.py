"""End-to-end single-UAV ADMM solve on a synthetic sphere scene.

This is the minimum-slice integration test of SURVEY.md §7.2: run the full
jitted iteration (planes -> Newton -> CCD-clamped Armijo -> slack/dual) and
check descent, consensus-residual decay, convergence, and hard feasibility
(min obstacle clearance >= offset) — the properties the reference only
eyeballs in its viewer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.config import TrajOptConfig
from trajopt_tpu import types as tt
from trajopt_tpu.ops import energies as en
from trajopt_tpu.ops import geometry as geo
from trajopt_tpu.ops import splines as sp
from trajopt_tpu.scenes import generators as gen
from trajopt_tpu.solver import admm, driver


@pytest.fixture(scope="module")
def solved():
    cfg = TrajOptConfig(res=4, max_planes=16, max_ccd_candidates=16)
    cloud = gen.sphere_scene(n_points=400, radius=1.0, seed=1)
    # waypoints passing beside the sphere — feasible start, barrier-active path
    wp = np.array(
        [
            [-3.0, 0.0, 0.0],
            [-1.5, 1.6, 0.0],
            [0.0, 1.8, 0.0],
            [1.5, 1.6, 0.0],
            [3.0, 0.0, 0.0],
        ]
    )
    ops = sp.build_spline_ops(len(wp) - 1, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state0 = tt.init_state(ops, wp, cfg.init_piece_time)
    state, history = driver.solve(consts, cfg, state0, scene, max_iters=60)
    return cfg, ops, consts, scene, state0, state, history


def min_clearance(ops, scene, spline, piece_time):
    """Min distance from densely sampled CURVE points to live obstacles.

    Control-hull vertices are not a lower bound on curve clearance (the curve
    lies in the hulls' interior); sample the curve itself.
    """
    from trajopt_tpu import metrics as mt

    pts = np.asarray(scene.points)[np.asarray(scene.mask)]
    return mt.min_curve_clearance(
        ops, np.asarray(spline), pts, float(piece_time)
    )


def test_converges(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    gnorms = [h["gnorm"] for h in history]
    assert history[-1]["gnorm"] < cfg.stop or len(history) == 60
    # must have actually converged for this easy scene
    assert gnorms[-1] < cfg.stop, f"gnorm history tail: {gnorms[-5:]}"


def test_consensus_residual_decays(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    res = [h["consensus_residual"] for h in history]
    assert res[-1] < 0.1 * res[0] + 1e-3


def test_feasibility_maintained(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    clr = min_clearance(ops, scene, state.spline, state.piece_time)
    assert clr > cfg.offset - 1e-6, f"curve clearance {clr} <= offset"


def test_piece_time_positive_and_moved(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    t = float(state.piece_time)
    assert t > 0
    # time is co-optimized: with ks tiny and kt=1 it should shrink from 20
    assert t < float(state0.piece_time)


def test_velocity_limits_respected(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    ev = en.bound_energy(consts, cfg, state.spline, state.piece_time)
    assert not bool(ev.infeasible)


def test_steps_accepted(solved):
    cfg, ops, consts, scene, state0, state, history = solved
    # line search should usually accept nonzero steps
    steps = np.array([h["step"] for h in history])
    assert (steps > 0).all()
    assert steps.max() > 0.1
