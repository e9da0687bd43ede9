"""Validate energies against plain-loop oracles and the assembled KKT system
against direct global autodiff — the finite-difference discipline the reference
only hints at in a commented-out check (Optimal_plane.h:677-718)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.config import TrajOptConfig
from trajopt_tpu.ops import energies as en
from trajopt_tpu.ops import gradients as gr
from trajopt_tpu.ops import kkt
from trajopt_tpu.ops import splines as sp
from trajopt_tpu import types as tt

P, R, K = 3, 4, 5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    ops = sp.build_spline_ops(P, R)
    consts = tt.device_consts(ops)
    cfg = TrajOptConfig()
    wp = np.cumsum(rng.standard_normal((P + 1, 3)), axis=0)
    state = tt.init_state(ops, wp, cfg.init_piece_time)

    # Random planes that keep the current spline feasible, with ~half the
    # hull-point distances inside the activation window (0, margin).
    hull = np.asarray(en.seg_cps(consts, state.spline))       # [P,R,6,3]
    c = rng.standard_normal((P, R, K, 3))
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    proj = np.einsum("prjd,prkd->prkj", hull, c)              # [P,R,K,6]
    dmin = proj.min(axis=-1)
    d = -dmin + cfg.margin * rng.uniform(0.2, 1.5, size=(P, R, K))
    mask = rng.uniform(size=(P, R, K)) < 0.7
    planes = tt.Planes(c=jnp.asarray(c), d=jnp.asarray(d), mask=jnp.asarray(mask))
    return ops, consts, cfg, state, planes


def test_plane_barrier_matches_loop_oracle(setup):
    ops, consts, cfg, state, planes = setup
    hull = np.asarray(en.seg_cps(consts, state.spline))
    c, d, mask = map(np.asarray, planes)
    e_ref, infeasible = 0.0, False
    for p in range(P):
        for r in range(R):
            w = 1.0 / R
            for k in range(K):
                if not mask[p, r, k]:
                    continue
                for j in range(6):
                    dist = hull[p, r, j] @ c[p, r, k] + d[p, r, k]
                    if dist <= 0:
                        infeasible = True
                    elif dist < cfg.margin:
                        e_ref += -w * (dist - cfg.margin) ** 2 * np.log(dist / cfg.margin)
    got = en.plane_barrier_energy(consts, cfg, state.spline, planes)
    assert bool(got.infeasible) == infeasible
    np.testing.assert_allclose(float(got.value), e_ref, rtol=1e-10)
    assert e_ref > 0  # exercise something


def test_bound_energy_matches_loop_oracle(setup):
    ops, consts, cfg, state, planes = setup
    hull = np.asarray(en.seg_cps(consts, state.spline))
    # choose limits so some constraints are active for the test
    n = 5
    w = 1.0 / R
    t = float(state.piece_time)
    speeds = np.linalg.norm(n * np.diff(hull, axis=2), axis=-1) / (w * t)
    accs = np.linalg.norm(n * (n - 1) * np.diff(hull, n=2, axis=2), axis=-1) / (w * w * t * t)
    cfg = cfg.replace(
        vel_limit=float(np.quantile(speeds, 0.6)) + 0.5 * cfg.margin,
        acc_limit=float(np.quantile(accs, 0.6)) + 0.5 * cfg.margin,
    )
    e_ref = 0.0
    for p in range(P):
        for r in range(R):
            for j in range(5):
                dv = cfg.vel_limit - speeds[p, r, j]
                if 0 < dv < cfg.margin:
                    e_ref += -w * (dv - cfg.margin) ** 2 * np.log(dv / cfg.margin)
            for j in range(4):
                da = cfg.acc_limit - accs[p, r, j]
                if 0 < da < cfg.margin:
                    e_ref += -w * (da - cfg.margin) ** 2 * np.log(da / cfg.margin)
    got = en.bound_energy(consts, cfg, state.spline, state.piece_time)
    np.testing.assert_allclose(float(got.value), e_ref, rtol=1e-10)
    assert e_ref > 0


def _global_energy(consts, cfg, state, planes, free_flat, piece_time):
    """Oracle: total spline AL energy as a function of free coords + time."""
    t = consts.trajectory_num
    spline = state.spline.at[2 : t - 2].set(free_flat.reshape(t - 4, 3))
    e = en.spline_energy(
        consts, cfg, state, planes, spline=spline, piece_time=piece_time
    )
    return e.value


@pytest.mark.slow
def test_assembled_kkt_matches_global_autodiff(setup):
    ops, consts, cfg, state, planes = setup
    # activate some bound terms too
    hull = np.asarray(en.seg_cps(consts, state.spline))
    n, w, t0 = 5, 1.0 / R, float(state.piece_time)
    speeds = np.linalg.norm(n * np.diff(hull, axis=2), axis=-1) / (w * t0)
    cfg = cfg.replace(vel_limit=float(np.quantile(speeds, 0.5)) + 0.5 * cfg.margin)

    g, h = gr.piece_grads_and_hessians(
        consts, cfg, state.spline, state.piece_time, planes,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
        repair=False,
    )
    red = kkt.assemble_reduced(consts, g, h)

    t = consts.trajectory_num
    free0 = state.spline[2 : t - 2].reshape(-1)
    f = lambda x, pt: _global_energy(consts, cfg, state, planes, x, pt)
    gs_ref = jax.grad(f, argnums=0)(free0, state.piece_time)
    gt_ref = jax.grad(f, argnums=1)(free0, state.piece_time)
    a_ref = jax.hessian(f, argnums=0)(free0, state.piece_time)
    b_ref = jax.jacfwd(jax.grad(f, argnums=0), argnums=1)(free0, state.piece_time)
    htt_ref = jax.hessian(f, argnums=1)(free0, state.piece_time)

    np.testing.assert_allclose(np.asarray(red.gs), np.asarray(gs_ref), atol=1e-9)
    np.testing.assert_allclose(float(red.gt), float(gt_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(red.a), np.asarray(a_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(red.b), np.asarray(b_ref), atol=1e-8)
    np.testing.assert_allclose(float(red.htt), float(htt_ref), atol=1e-8)
    assert float(jnp.abs(red.gs).max()) > 0


@pytest.mark.slow
def test_newton_direction_solves_system(setup):
    ops, consts, cfg, state, planes = setup
    g, h = gr.piece_grads_and_hessians(
        consts, cfg, state.spline, state.piece_time, planes,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
    )
    red = kkt.assemble_reduced(consts, g, h)
    ls = kkt.local_solve(red)
    ds, dt = kkt.finish_direction(ls, ls.schur_s, ls.schur_r)
    # residual of the arrowhead system; local_solve adds a deliberate 1e-6
    # relative ridge, so compare at matching tolerance
    scale = float(np.abs(np.asarray(red.a)).max() * np.abs(np.asarray(ds)).max())
    top = np.asarray(red.a) @ np.asarray(ds) + np.asarray(red.b) * float(dt)
    np.testing.assert_allclose(top, -np.asarray(red.gs), atol=3e-6 * max(scale, 1.0))
    bot = float(red.b @ ds + red.htt * dt)
    np.testing.assert_allclose(bot, -float(red.gt), atol=3e-6 * max(scale, 1.0))


def test_psd_repair(setup):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((4, 19, 19))
    m = (m + m.transpose(0, 2, 1)) / 2
    fixed = gr.psd_repair(jnp.asarray(m))
    w = np.linalg.eigvalsh(np.asarray(fixed))
    assert (w[:, 0] > 0.009).all()
    # PD input untouched
    pd = np.einsum("bij,bkj->bik", m, m) + 1e-3 * np.eye(19)
    np.testing.assert_allclose(np.asarray(gr.psd_repair(jnp.asarray(pd))), pd)


def test_slack_energy_vector_matches_local(setup):
    ops, consts, cfg, state, planes = setup
    c_spline = jnp.einsum(
        "pij,pjd->pid", consts.convert, en.piece_cps(consts, state.spline)
    )
    vec = en.slack_energy(
        consts, cfg, c_spline, state.piece_time,
        state.p_slack, state.t_slack, state.p_lambda, state.t_lambda,
    )
    for p in range(P):
        x = jnp.concatenate(
            [state.p_slack[p].reshape(-1), state.t_slack[p][None]]
        )
        e = gr.local_slack_energy(
            x, c_spline[p], state.piece_time,
            state.p_lambda[p], state.t_lambda[p], consts.m_dyn, cfg,
        )
        np.testing.assert_allclose(float(vec[p]), float(e), rtol=1e-12)


@pytest.mark.slow
def test_psd_repair_ladder_makes_pd():
    """Ladder repair must leave every block PD, keep PD blocks untouched, and
    over-shift by at most ~1.16x the needed shift (+ floor-rung + 0.01)."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(64, 19, 19))
    sym = 0.5 * (a + a.transpose(0, 2, 1)) * 10.0
    fixed = np.asarray(gr.psd_repair_ladder(jnp.asarray(sym)))
    wmin = np.linalg.eigvalsh(fixed)[:, 0]
    assert (wmin > 0).all(), wmin.min()
    # bounded over-shift: <= bisection factor * (-lambda_min) + floor-rung
    # (G*1e-6, inert) + the reference's 0.01 floor
    true_min = np.linalg.eigvalsh(sym)[:, 0]
    diag = np.einsum("bii->bi", sym)
    gersh = np.maximum(-(diag - (np.abs(sym).sum(-1) - np.abs(diag))).min(-1), 0)
    shift = (fixed - sym)[:, 0, 0]
    factor = 10.0 ** (gr._LADDER_DECADES / (gr._LADDER_RUNGS - 1) / 2**gr._LADDER_BISECT)
    assert (shift <= factor * np.maximum(-true_min, 0) + 1e-5 * gersh + 0.011).all()

    # already-PD blocks stay untouched
    pd = np.einsum("bij,bkj->bik", a, a) + 0.1 * np.eye(19)
    np.testing.assert_allclose(
        np.asarray(gr.psd_repair_ladder(jnp.asarray(pd))), pd
    )

    # clustered all-negative spectra: shift still sufficient
    q, _ = np.linalg.qr(rng.normal(size=(32, 19, 19)))
    w = -np.abs(rng.normal(size=(32, 19)))
    w[:, 0] = w[:, 1] - 1e-9
    h = np.einsum("bij,bj,bkj->bik", q, w, q)
    fixed = np.asarray(gr.psd_repair_ladder(jnp.asarray(h)))
    assert (np.linalg.eigvalsh(fixed)[:, 0] > 0).all()




@pytest.mark.slow
def test_psd_repair_ladder_all_fail_degenerate():
    """Blocks where even H + Gershgorin*I is numerically singular must still
    come out PD (the 1.1*Gershgorin degeneracy bump — ADVICE r1 medium:
    argmax over all-False rungs used to discard the bump and return shift 0)."""
    # H = -c*I: Gershgorin bound G = c exactly, so H + G*I == 0 (singular at
    # every rung); the repair must bump past the bound, not return H.
    for c in (1.0, 1e-4, 1e4):
        h = jnp.asarray(-c * np.eye(19)[None])
        fixed = np.asarray(gr.psd_repair_ladder(h))
        wmin = np.linalg.eigvalsh(fixed)[:, 0]
        assert (wmin > 0).all(), (c, wmin.min())


@pytest.mark.slow
def test_analytic_gh_matches_autodiff():
    """ops/gradients.py::analytic_spline_gh == jacfwd(grad) oracle at f64,
    with plane-barrier AND vel/acc-bound terms active."""
    import dataclasses

    import numpy as np
    from trajopt_tpu.config import TrajOptConfig
    from trajopt_tpu import types as tt
    from trajopt_tpu.ops import splines as sp, gradients as gr, energies as en
    from trajopt_tpu.types import Planes

    rng = np.random.default_rng(0)
    cfg = TrajOptConfig(res=4, max_planes=6)
    ops = sp.build_spline_ops(3, cfg.res)
    consts = tt.device_consts(ops, dtype=jnp.float64)
    p = consts.piece_num
    wp = rng.normal(size=(4, 3)) * 4.0
    state = tt.init_state(ops, wp, 1.5, dtype=jnp.float64)  # small t: bounds activate
    state = state._replace(
        spline=state.spline + 0.01 * rng.normal(size=state.spline.shape),
        p_lambda=jnp.asarray(rng.normal(size=state.p_lambda.shape) * 0.1),
        t_lambda=jnp.asarray(rng.normal(size=state.t_lambda.shape) * 0.1),
    )
    hull = en.seg_cps(consts, state.spline)
    k = 6
    c = rng.normal(size=(p, cfg.res, k, 3))
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    dmat = np.einsum("prjd,prkd->prkj", np.asarray(hull), c)
    d0 = -dmat.min(axis=-1) + rng.uniform(0.2, 0.8, size=(p, cfg.res, k)) * cfg.margin
    planes = Planes(
        c=jnp.asarray(c), d=jnp.asarray(d0),
        mask=jnp.asarray(rng.random((p, cfg.res, k)) < 0.8),
    )
    dists = np.einsum("prjd,prkd->prkj", np.asarray(hull), c) + d0[..., None]
    assert ((dists > 0) & (dists < cfg.margin)).sum() > 20, "barrier inactive"

    args = (state.spline, state.piece_time, planes,
            state.p_slack, state.t_slack, state.p_lambda, state.t_lambda)
    ga, ha = gr.piece_grads_and_hessians(
        consts, dataclasses.replace(cfg, grad_mode="analytic"), *args, repair=False
    )
    gb, hb = gr.piece_grads_and_hessians(
        consts, dataclasses.replace(cfg, grad_mode="autodiff"), *args, repair=False
    )
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-8, atol=1e-9)


def test_trial_energy_matches_dense():
    """The affine line-search tables (en.build_trial_tables/trial_energy)
    must reproduce `spline_energy` at spline + s*direction for every rung —
    same values and the same infeasibility semantics."""
    import jax

    from trajopt_tpu.ops import energies as en2
    from trajopt_tpu.solver import admm as admm_mod

    cfg = TrajOptConfig(res=2, max_planes=4, max_ccd_candidates=4, ks=1e-3)
    rng = np.random.default_rng(3)
    n_pieces = 3
    wp = np.cumsum(rng.normal(size=(n_pieces + 1, 3)), axis=0) * 2.0
    ops = sp.build_spline_ops(n_pieces, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(
        np.asarray(wp[1] + rng.normal(scale=0.4, size=(64, 3)))
    )
    state = tt.init_state(ops, wp, cfg.init_piece_time)
    planes, _ = admm_mod.separate_planes(consts, cfg, state.spline, scene)

    direction = jnp.asarray(rng.normal(scale=0.05, size=state.spline.shape))
    dt = jnp.asarray(-0.7)

    # fleet-of-one layout for the tables
    state_u = jax.tree.map(lambda x: x[None], state)
    planes_u = jax.tree.map(lambda x: x[None], planes)
    ttab = en2.build_trial_tables(
        consts, cfg, state_u, planes_u, direction[None], dt[None]
    )
    for s in [0.0, 1e-3, 0.04, 0.21, 0.8, 1.0]:
        ev = en2.spline_energy(
            consts, cfg, state, planes,
            spline=state.spline + s * direction,
            piece_time=state.piece_time + s * dt,
        )
        dense = float(np.where(ev.infeasible, np.inf, float(ev.value)))
        fast = float(en2.trial_energy(consts, cfg, ttab, jnp.asarray([s]))[0])
        if np.isinf(dense) or np.isinf(fast):
            assert np.isinf(dense) == np.isinf(fast), (s, dense, fast)
        else:
            np.testing.assert_allclose(fast, dense, rtol=1e-9, atol=1e-10)
