import time, jax, numpy as np
from trajopt_tpu.runtime import cache as _c; _c.enable()
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as mm

cfg, consts, scene, state = _build_problem(
    uav_num=8, n_pieces=4, res=8, n_points=4000, max_planes=16, max_self=4, max_ccd=16)
step = jax.jit(lambda s: mm.multi_admm_step(consts, cfg, s, scene, coupled=True, axis_name=None))
state, _ = step(state); jax.block_until_ready(state)
import time as _t
t0=_t.perf_counter()
for _ in range(5): state, _d = step(state)
jax.block_until_ready(state); print("full step", f"{1e3*(_t.perf_counter()-t0)/5:.1f} ms")

# time individual phases jitted separately
planes_fn = jax.jit(lambda s: mm._all_planes(consts, cfg, s, scene, None))
def timeit(name, fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(3): out = fn(*a); jax.block_until_ready(out)
    print(name, f"{1e3*(time.perf_counter()-t0)/3:.1f} ms")
    return out

planes = timeit("planes", planes_fn, state)
dir_fn = jax.jit(lambda s, p: mm._directions(consts, cfg, s, p))
ls, red = timeit("directions", dir_fn, state, planes)
import jax.numpy as jnp
from trajopt_tpu.ops import kkt
ds, dt = jax.vmap(lambda l: kkt.finish_direction(l, l.schur_s, l.schur_r))(ls)
dirs = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
ccd_fn = jax.jit(lambda s, d: mm.coupled_ccd_step(consts, cfg, s, d, scene, None))
timeit("ccd", ccd_fn, state.spline, dirs)
from trajopt_tpu.solver import admm as _admm
slack_fn = jax.jit(lambda s: jax.vmap(lambda st: _admm.slack_update(consts, cfg, st))(s))
timeit("slack", slack_fn, state)
