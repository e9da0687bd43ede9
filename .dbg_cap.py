import numpy as np, jax
import jax.numpy as jnp
from trajopt_tpu.runtime import cache as _c; _c.enable()
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm

cfg, consts, scene, state = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
step = jax.jit(lambda s: mm.multi_admm_step(consts, cfg, s, scene, coupled=True, axis_name=None))
prev = state
for it in range(40):
    state, diag = step(state)
    if any(bool(jnp.any(jnp.isnan(x))) for x in state):
        print("NAN at", it)
        np.savez("/root/repo/.nan8.npz", **{f: np.asarray(x) for f, x in zip(prev._fields, prev)})
        nf = [f for f, x in zip(state._fields, state) if bool(jnp.any(jnp.isnan(x)))]
        print("nan fields:", nf)
        print("diag gnorm", float(diag.gnorm), "step", float(diag.step), "ccd", float(diag.ccd_step),
              "energy", float(diag.energy), "infeas", bool(diag.infeasible))
        break
    prev = state
else:
    print("no nan in 40")
