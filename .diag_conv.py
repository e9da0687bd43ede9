"""Diagnose 64-robot coupled convergence regression (not committed)."""
import sys, time
sys.path.insert(0, ".")
from trajopt_tpu.runtime import cache as _cache
_cache.enable()
import jax, jax.numpy as jnp
from __graft_entry__ import _build_problem
from trajopt_tpu.solver import multi as multi_mod

UAVS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
PSD = sys.argv[2] if len(sys.argv) > 2 else "gmw"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 80

cfg, consts, scene, state = _build_problem(
    uav_num=UAVS, n_pieces=4, res=8, n_points=4000,
    max_planes=16, max_self=4, max_ccd=16,
)
cfg = cfg._replace(psd_method=PSD) if hasattr(cfg, "_replace") else cfg
import dataclasses
cfg = dataclasses.replace(cfg, psd_method=PSD)

for it in range(N):
    state, diag = multi_mod.multi_admm_step_jit(consts, cfg, state, scene, True)
    if it % 2 == 0 or it == N - 1 or it < 8:
        print(f"it={it:3d} gnorm={float(diag.gnorm):.5f} E={float(diag.energy):.4f} "
              f"step={float(diag.step):.4f} ccd={float(diag.ccd_step):.4f} "
              f"planes={int(diag.n_planes)} res={float(diag.consensus_residual):.5f}")
    if it > 1 and float(diag.gnorm) < cfg.stop:
        print(f"CONVERGED at it={it}")
        break
