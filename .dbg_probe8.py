import numpy as np, jax
import jax.numpy as jnp
from trajopt_tpu.runtime import cache as _c; _c.enable()
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm
from trajopt_tpu.ops import gradients as gr, kkt
from trajopt_tpu.types import SolverState

cfg, consts, scene, _ = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
d = np.load("/root/repo/.nan8.npz")
state = SolverState(**{k: jnp.asarray(d[k]) for k in d.files})
print("piece_time", np.asarray(state.piece_time))
print("spline absmax", float(jnp.abs(state.spline).max()), "t_slack", np.asarray(state.t_slack).min())

@jax.jit
def probe(state):
    planes = mm._all_planes(consts, cfg, state, scene, None)
    def gh(st, pl):
        return gr.piece_grads_and_hessians(
            consts, cfg, st.spline, st.piece_time, pl,
            st.p_slack, st.t_slack, st.p_lambda, st.t_lambda, repair=False)
    g, h = jax.vmap(gh)(state, planes)
    w = jnp.linalg.eigvalsh(h)
    hr = gr.psd_repair(h.reshape(-1, 19, 19)).reshape(h.shape)
    def asm(gg, hh):
        red = kkt.assemble_reduced(consts, gg, hh)
        return red, kkt.local_solve(red)
    red, ls = jax.vmap(asm)(g, hr)
    return dict(
        g_nan=jnp.any(jnp.isnan(g)), h_nan=jnp.any(jnp.isnan(h)),
        g_max=jnp.abs(g).max(), h_max=jnp.abs(h).max(),
        eig_nan=jnp.any(jnp.isnan(w)), eig_min=w.min(), eig_max=w.max(),
        hr_nan=jnp.any(jnp.isnan(hr)),
        chol_nan=jnp.any(jnp.isnan(ls.chol)),
        ainv_nan=jnp.any(jnp.isnan(ls.ainv_gs)),
        schur_s=ls.schur_s, schur_r=ls.schur_r,
        planes_n=planes.mask.sum(), planes_nan=jnp.any(jnp.isnan(planes.c)),
    )
for k, v in probe(state).items():
    print(k, np.asarray(v))
