"""Probe the frozen 64-robot state: which CCD predicate blocks, why planes=0."""
import sys
sys.path.insert(0, ".")
from trajopt_tpu.runtime import cache as _cache
_cache.enable()
import functools
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as multi_mod, admm
from trajopt_tpu.ops import ccd as ccd_ops, geometry as geo, energies as en, kkt

cfg, consts, scene, state = _build_problem(
    uav_num=64, n_pieces=4, res=8, n_points=4000,
    max_planes=16, max_self=4, max_ccd=16,
)
for it in range(20):
    state, diag = multi_mod.multi_admm_step_jit(consts, cfg, state, scene, True)
print("after 20 iters: gnorm", float(diag.gnorm), "step", float(diag.step),
      "ccd", float(diag.ccd_step), "planes", int(diag.n_planes), flush=True)


@functools.partial(jax.jit, static_argnames=())
def analyze(state, scene):
    splines = state.spline
    u = splines.shape[0]
    hulls = jax.vmap(lambda s: en.seg_cps(consts, s))(splines)  # [U,P,R,n,3]

    planes = multi_mod._all_planes(consts, cfg, state, scene, None)
    ls, red = multi_mod._directions(consts, cfg, state, planes)
    s_tot = jnp.sum(ls.schur_s); r_tot = jnp.sum(ls.schur_r)
    ds, dt = kkt.finish_direction(ls, s_tot, r_tot)
    directions = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
    obs_tabs, pair_tabs = multi_mod._build_ccd(consts, cfg, splines, directions, scene, None)

    outs = {}
    for name, step in [("1.0", 1.0), ("0.8^40", 0.8**40), ("0.8^63", 0.8**63), ("0", 0.0)]:
        steps = jnp.full((u,), step, splines.dtype)
        ob = ccd_ops.obstacle_bad(obs_tabs, steps, cfg.offset, cfg.gjk_iters,
                                  geo.use_pallas_gjk(cfg, splines.dtype))
        pb = ccd_ops.pair_bad(pair_tabs, steps, steps, cfg.offset, cfg.gjk_iters,
                              geo.use_pallas_gjk(cfg, splines.dtype))
        outs[f"ob@{name}"] = jnp.sum(ob)
        outs[f"pb@{name}"] = jnp.sum(pb)

    # nearest robot pair (AABB robot level)
    lo, hi = hulls.min(axis=3), hulls.max(axis=3)
    rlo = lo.reshape(u, -1, 3).min(axis=1); rhi = hi.reshape(u, -1, 3).max(axis=1)
    gap = jnp.maximum(rlo[:, None] - rhi[None], jnp.maximum(rlo[None] - rhi[:, None], 0.0))
    d2 = jnp.sum(gap**2, -1) + jnp.where(jnp.eye(u, dtype=bool), jnp.inf, 0.0)
    outs["min_pair_aabb"] = jnp.sqrt(d2.min())
    ij = jnp.argmin(d2)
    i, j = ij // u, ij % u
    outs["pair_i"], outs["pair_j"] = i, j

    # exact-ish hull-hull distance for that pair
    n = hulls.shape[3]
    ha = hulls[i].reshape(-1, n, 3)
    hb = hulls[j].reshape(-1, n, 3)
    diff = (ha[:, None, :, None, :] - hb[None, :, None, :, :]).reshape(-1, n * n, 3)
    hd = geo.batched_origin_dist(diff, 128, False)
    outs["pair_min_dist"] = hd.dist.min()
    outs["pair_min_lb"] = hd.lb.min()

    # min obstacle distance per the k-DOP gap (lower bound) at step 0, full cloud
    ax = ccd_ops._axes(splines.dtype)
    hp = hulls @ ax.T
    lo0, hi0 = ccd_ops._interval(hp)
    g0 = ccd_ops._gap_point(lo0, hi0, scene.points @ ax.T)  # [U,P,R,N]
    g0 = jnp.where(scene.mask, g0, jnp.inf)
    outs["min_obs_kdop_gap"] = g0.min()

    slf = multi_mod.self_planes(consts, cfg, splines, None)
    outs["self_planes"] = slf.mask.sum()
    obs_p = jax.vmap(lambda s: admm.separate_planes(consts, cfg, s, scene))(splines)
    outs["obs_planes"] = obs_p.mask.sum()
    outs["wolfe"] = -(jnp.sum(ds * red.gs) + dt[0] * jnp.sum(red.gt))
    return outs


outs = analyze(state, scene)
for k, v in outs.items():
    print(k, np.asarray(v), flush=True)
np.savez("/root/repo/.frozen64.npz", spline=np.asarray(state.spline), pt=np.asarray(state.piece_time))
