"""Robot-sharded execution vs single-chip equivalence on the virtual CPU mesh.

The distributed test strategy of SURVEY.md §4: 8 virtual devices via
``--xla_force_host_platform_device_count=8`` (set in conftest), comparing the
shard_map'd coupled step — hull all_gather, shared-time Schur psum, joint
CCD/Armijo reductions — against the identical math on one device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.config import TrajOptConfig
from trajopt_tpu import types as tt
from trajopt_tpu.ops import splines as sp
from trajopt_tpu.scenes import generators as gen
from trajopt_tpu.solver import multi as multi_mod
from trajopt_tpu.parallel import sharded


def make_problem(uav_num=8, n_pieces=2):
    cfg = TrajOptConfig(
        res=2, ks=1e-3, max_planes=4, max_self_planes=2, max_ccd_candidates=4
    )
    wps = []
    for i in range(uav_num):
        sgn = 1 if i % 2 == 0 else -1
        s = np.array([sgn * 3.0, 0.11 * (i // 2), 0.27 * i])
        e = np.array([-sgn * 3.0, 0.11 * (i // 2), 0.27 * i])
        t = np.linspace(0, 1, n_pieces + 1)[:, None]
        wps.append(s * (1 - t) + e * t)
    ops = sp.build_spline_ops(n_pieces, cfg.res)
    consts = tt.device_consts(ops)
    cloud = gen.sphere_scene(64, radius=0.5, center=(0, 2.0, 0.5))
    scene = tt.make_scene(cloud)
    state = multi_mod.init_multi_state(ops, wps, cfg.init_piece_time)
    return cfg, consts, scene, state


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.slow
def test_sharded_step_matches_single_chip(n_dev):
    cfg, consts, scene, state = make_problem(uav_num=8)
    ref_state, ref_diag = multi_mod.multi_admm_step(
        consts, cfg, state, scene, coupled=True, axis_name=None
    )
    mesh = sharded.make_mesh(n_dev)
    step = sharded.sharded_multi_step(consts, cfg, mesh, coupled=True)
    got_state, got_diag = step(state, scene)

    for name, a, b in zip(ref_state._fields, ref_state, got_state):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9,
            err_msg=f"state field {name} diverged at {n_dev} devices",
        )
    np.testing.assert_allclose(float(ref_diag.gnorm), float(got_diag.gnorm), rtol=1e-8)
    np.testing.assert_allclose(
        float(ref_diag.consensus_residual), float(got_diag.consensus_residual), rtol=1e-7
    )


@pytest.mark.slow
def test_sharded_multi_iteration_run():
    """Several sharded steps keep state finite and consistent-time."""
    cfg, consts, scene, state = make_problem(uav_num=8)
    mesh = sharded.make_mesh(4)
    step = sharded.sharded_multi_step(consts, cfg, mesh, coupled=True)
    for _ in range(3):
        state, diag = step(state, scene)
    assert np.isfinite(float(diag.gnorm))
    pt = np.asarray(state.piece_time)
    np.testing.assert_allclose(pt, pt[0])  # shared time stays shared


@pytest.mark.slow
def test_2d_mesh_matches_vmapped_single_chip():
    """(scenario, robot) 2-D mesh == vmap of the single-chip step over
    scenarios: scenario axis carries no communication, robot collectives stay
    per-scenario."""
    cfg, consts, scene, state = make_problem(uav_num=4)
    # two scenarios: identical scene, second state jittered deterministically
    state2 = state._replace(spline=state.spline + 1e-3)
    states = jax.tree.map(lambda a, b: jnp.stack([a, b]), state, state2)
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)

    ref_states, ref_diags = jax.vmap(
        lambda st, sc: multi_mod.multi_admm_step(
            consts, cfg, st, sc, coupled=True, axis_name=None
        )
    )(states, scenes)

    mesh = sharded.make_mesh_2d(2, 4)
    assert mesh.shape == {"scenario": 2, "robot": 4}
    step = sharded.sharded_multi_step_2d(consts, cfg, mesh, coupled=True)
    got_states, got_diags = step(states, scenes)

    for name, a, b in zip(ref_states._fields, ref_states, got_states):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9,
            err_msg=f"state field {name} diverged on the 2-D mesh",
        )
    np.testing.assert_allclose(
        np.asarray(ref_diags.gnorm), np.asarray(got_diags.gnorm), rtol=1e-8
    )


@pytest.mark.slow
def test_dryrun_entrypoints():
    """The driver-facing entry points compile and run."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(4)
