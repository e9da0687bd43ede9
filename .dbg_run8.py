import numpy as np, jax, time
from trajopt_tpu.runtime import cache as _c; _c.enable()
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm

cfg, consts, scene, state = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
step = jax.jit(lambda s: mm.multi_admm_step(consts, cfg, s, scene, coupled=True, axis_name=None))
g = np.inf
times = []
import jax.numpy as jnp
for it in range(150):
    t0=time.perf_counter(); state, diag = step(state); jax.block_until_ready(state)
    times.append(time.perf_counter()-t0)
    g = float(diag.gnorm)
    if np.isnan(g):
        print("NAN at", it); break
    if it > 1 and g < cfg.stop:
        print("converged at", it, "gnorm", round(g,5)); break
else:
    print("no conv in 150, gnorm", g)
print("median iter ms:", round(1e3*np.median(times[2:]),1), "piece_time", float(state.piece_time[0]))
