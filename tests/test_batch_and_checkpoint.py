"""Scenario batching (vmap over problems) and checkpoint/resume."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.config import TrajOptConfig
from trajopt_tpu import types as tt
from trajopt_tpu.ops import splines as sp
from trajopt_tpu.runtime import checkpoint as ckpt
from trajopt_tpu.scenes import generators as gen
from trajopt_tpu.solver import admm, driver


def make_batch(n_scen=4, n_pieces=3, res=2):
    cfg = TrajOptConfig(res=res, max_planes=8, max_ccd_candidates=8)
    ops = sp.build_spline_ops(n_pieces, cfg.res)
    consts = tt.device_consts(ops)
    rng = np.random.default_rng(0)
    states, scenes = [], []
    for s in range(n_scen):
        # same topology, different obstacle positions and side offsets;
        # sphere sits 0.5+ clear of the waypoint line (feasible init)
        cloud = gen.sphere_scene(128, radius=0.8, seed=s, center=(0, 3.0 + 0.1 * s, 0))
        y = 1.7 + 0.1 * s
        wp = np.array([[-3.0, 0, 0], [-1.0, y, 0], [1.0, y, 0], [3.0, 0, 0]])
        scenes.append(tt.make_scene(cloud))
        states.append(tt.init_state(ops, wp, cfg.init_piece_time))
    batch_state = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    batch_scene = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    return cfg, ops, consts, batch_state, batch_scene, states, scenes


@pytest.mark.slow
def test_vmapped_scenarios_match_individual():
    cfg, ops, consts, bstate, bscene, states, scenes = make_batch()
    stepped = jax.jit(
        jax.vmap(lambda st, sc: admm.admm_step(consts, cfg, st, sc))
    )(bstate, bscene)
    batched_state, batched_diag = stepped
    for i in range(len(states)):
        ref_state, ref_diag = admm.admm_step(consts, cfg, states[i], scenes[i])
        np.testing.assert_allclose(
            np.asarray(batched_state.spline[i]), np.asarray(ref_state.spline),
            rtol=1e-9, atol=1e-10,
        )
        np.testing.assert_allclose(
            float(batched_diag.gnorm[i]), float(ref_diag.gnorm), rtol=1e-9
        )


@pytest.mark.slow
def test_batched_fused_solve_converges():
    cfg, ops, consts, bstate, bscene, *_ = make_batch(n_scen=3)
    solve = jax.jit(
        jax.vmap(
            lambda st, sc: driver.solve_fused(consts, cfg, st, sc, max_iters=60)
        )
    )
    out_state, iters, gnorm = solve(bstate, bscene)
    assert (np.asarray(gnorm) < cfg.stop).all(), np.asarray(gnorm)
    assert (np.asarray(out_state.piece_time) > 0).all()


@pytest.mark.slow
def test_solve_fused_batch_matches_individual():
    """The batch-aware fused driver (multi machinery, interact=False) must
    match per-scenario `solve_fused` results — same math, different
    compaction/batching (driver.solve_fused_batch)."""
    import jax.numpy as jnp

    cfg, ops, consts, bstate, bscene, states, scenes = make_batch(n_scen=3)
    # shared scene required by the batch driver: reuse scenario 0's scene
    scene = scenes[0]
    bstate = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    out_b, it, g = driver.solve_fused_batch(
        consts, cfg, bstate, scene, max_iters=6
    )
    for i in range(3):
        ref, *_ = driver.solve_fused(consts, cfg, states[i], scene, max_iters=6)
        np.testing.assert_allclose(
            np.asarray(out_b.spline[i]), np.asarray(ref.spline),
            rtol=1e-8, atol=1e-9,
        )
        np.testing.assert_allclose(
            float(out_b.piece_time[i]), float(ref.piece_time), rtol=1e-8
        )


@pytest.mark.slow
def test_solve_fused_batch_multi_matches_individual():
    """Grouped COUPLED fleet batching (driver.solve_fused_batch_multi): B
    independent coupled fleets in one call must match per-fleet coupled
    solves — scenario-block pair masks + per-group Schur/CCD/Armijo."""
    import jax.numpy as jnp

    from trajopt_tpu.solver import multi as multi_mod

    cfg, consts, scene, state = _multi_cross_problem()
    B = 3
    rng = np.random.default_rng(1)
    deltas = jnp.asarray(
        rng.normal(scale=1e-3, size=(B,) + state.spline.shape),
        state.spline.dtype,
    )
    states = jax.vmap(lambda d: state._replace(spline=state.spline + d))(deltas)
    out, it, g = driver.solve_fused_batch_multi(
        consts, cfg, states, scene, coupled=True, max_iters=5
    )
    for i in range(B):
        si = jax.tree.map(lambda x: x[i], states)
        ref, *_ = driver.solve_fused_multi(
            consts, cfg, si, scene, coupled=True, max_iters=5
        )
        np.testing.assert_allclose(
            np.asarray(out.spline[i]), np.asarray(ref.spline),
            rtol=1e-8, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(out.piece_time[i]), np.asarray(ref.piece_time),
            rtol=1e-8,
        )


def test_checkpoint_roundtrip(tmp_path):
    cfg, ops, consts, bstate, bscene, states, scenes = make_batch(n_scen=1)
    state = states[0]
    p = tmp_path / "ck.npz"
    ckpt.save(str(p), state, step=7, extra={"gnorm": 0.5})
    restored, meta = ckpt.load(str(p))
    assert meta["step"] == 7
    for a, b in zip(state, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path):
    cfg, ops, consts, bstate, bscene, states, scenes = make_batch(n_scen=1)
    state, scene = states[0], scenes[0]
    # uninterrupted
    ref, hist = driver.solve(consts, cfg, state, scene, max_iters=8, validate_init=False)
    # interrupted at iter 4 + resumed
    mgr = ckpt.CheckpointManager(str(tmp_path), every=1, keep=2)
    mid, _ = driver.solve(
        consts, cfg, state, scene, max_iters=4, validate_init=False, checkpointer=mgr
    )
    resumed, hist2 = driver.solve(
        consts, cfg, state, scene, max_iters=8, validate_init=False, checkpointer=mgr
    )
    for f, a, b in zip(ref._fields, ref, resumed):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=0,
            err_msg=f"resume diverged in {f}",
        )


def _multi_cross_problem(optimal_plane=False):
    from trajopt_tpu.solver import multi

    cfg = TrajOptConfig(
        res=4, max_planes=8, max_self_planes=4, max_ccd_candidates=8,
        ks=1e-3, optimal_plane=optimal_plane,
    )
    n_pieces = 3
    wps = []
    for i in range(2):
        sgn = 1 if i % 2 == 0 else -1
        s = np.array([sgn * 3.0, 0.0, 0.26 * i])
        e = np.array([-sgn * 3.0, 0.0, 0.26 * i])
        t = np.linspace(0, 1, n_pieces + 1)[:, None]
        wps.append(s * (1 - t) + e * t)
    ops = sp.build_spline_ops(n_pieces, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(np.full((8, 3), 100.0))
    state = multi.init_multi_state(ops, wps, cfg.init_piece_time)
    return cfg, consts, scene, state


@pytest.mark.slow
def test_multi_resume_matches_uninterrupted(tmp_path):
    """Kill/resume for the multi-robot host loop (robot-batched state pytree
    checkpoints transparently — r2 verdict task 7)."""
    cfg, consts, scene, state = _multi_cross_problem()

    ref, _ = driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=8
    )
    mgr = ckpt.CheckpointManager(str(tmp_path), every=1, keep=2)
    driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=4, checkpointer=mgr
    )
    resumed, _ = driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=8, checkpointer=mgr
    )
    for f, a, b in zip(ref._fields, ref, resumed):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=0,
            err_msg=f"multi resume diverged in {f}",
        )


@pytest.mark.slow
def test_multi_resume_optimal_plane_caches(tmp_path):
    """optimal_plane=1 multi resume: the persistent obstacle + pair plane
    caches must survive the checkpoint (reference semantics: the
    is_self_seperate/self_seperate_c/d tables live across the whole run,
    Optimization3D_multi.h:278-327) — a resume that restarts from empty
    caches diverges from the uninterrupted run (r4 verdict task 5)."""
    cfg, consts, scene, state = _multi_cross_problem(optimal_plane=True)

    ref, _ = driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=8
    )
    mgr = ckpt.CheckpointManager(str(tmp_path), every=1, keep=2)
    driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=4, checkpointer=mgr
    )
    resumed, _ = driver.solve_multi(
        consts, cfg, state, scene, coupled=True, max_iters=8, checkpointer=mgr
    )
    for f, a, b in zip(ref._fields, ref, resumed):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=0,
            err_msg=f"multi optimal_plane resume diverged in {f}",
        )


def test_multi_cache_checkpoint_roundtrip(tmp_path):
    """(obstacle PlaneCache, PairPlaneCache) serialization round-trip."""
    from trajopt_tpu.solver import multi as multi_mod

    cfg, consts, scene, state = _multi_cross_problem(optimal_plane=True)
    caches = multi_mod.init_multi_caches(cfg, consts, 2, state.spline.dtype)
    obs, pair = caches
    obs = obs._replace(obs_id=obs.obs_id.at[0, 0, 0, 0].set(5))
    pair = pair._replace(
        partner=pair.partner.at[1, 0, 0, 0].set(0),
        d=pair.d.at[1, 0, 0, 0].set(0.25),
    )
    p = tmp_path / "ck.npz"
    ckpt.save(str(p), state, step=3, cache=(obs, pair))
    _, meta, restored = ckpt.load_full(str(p))
    assert meta["cache_kind"] == "multi"
    r_obs, r_pair = restored
    for a, b in zip(obs, r_obs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(pair, r_pair):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
