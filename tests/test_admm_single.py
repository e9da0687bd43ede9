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


def min_clearance(consts, scene, spline, n_samples=200):
    """Min distance from densely sampled curve points to live obstacles."""
    hull = np.asarray(en.seg_cps(consts, spline))  # [P,R,6,3]
    pts = np.asarray(scene.points)[np.asarray(scene.mask)]
    # control-polygon vertices bound the curve hulls; also sample curve
    d = np.linalg.norm(hull.reshape(-1, 1, 3) - pts[None], axis=-1).min()
    return d


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
    assert min_clearance(consts, scene, state.spline) > cfg.offset - 1e-6


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
