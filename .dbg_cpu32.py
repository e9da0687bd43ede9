import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm

cfg, consts, scene, state = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
print("dtype", state.spline.dtype)
step = jax.jit(lambda s: mm.multi_admm_step(consts, cfg, s, scene, coupled=True, axis_name=None))
g = np.inf
for it in range(150):
    state, diag = step(state)
    g = float(diag.gnorm)
    if np.isnan(g) or any(bool(jnp.any(jnp.isnan(x))) for x in state):
        print("NAN at", it); break
    if it > 1 and g < cfg.stop:
        print("converged at", it, round(g,5)); break
else:
    print("no conv, g", g)
print("piece_time", float(state.piece_time[0]))
