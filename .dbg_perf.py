import time, numpy as np, jax
from trajopt_tpu.runtime import cache as _c; _c.enable()
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm

cfg, consts, scene, state = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
step = jax.jit(lambda s: mm.multi_admm_step(consts, cfg, s, scene, coupled=True, axis_name=None))
state, diag = step(state); jax.block_until_ready(state)
for i in range(6):
    t0=time.perf_counter(); state, diag = step(state); jax.block_until_ready(state)
    print(f"iter {i}: {1e3*(time.perf_counter()-t0):.0f} ms  gnorm {float(diag.gnorm):.3f} "
          f"step {float(diag.step):.4g} ccd {float(diag.ccd_step):.4g} planes {int(diag.n_planes)} "
          f"infeas {bool(diag.infeasible)}")
