"""Benchmark: ADMM iterations/s on the flagship coupled multi-robot scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Scene: 8-robot antipodal cross swap (the reference's multiPathPlanning3D
scenario class, start/goal pattern per Main/multiPathPlanning3D.cpp:251-267),
res=8, quintic/jerk, reference 3D.json parameters with the multi-main's
ks=1e-3 — the fixed protocol of BASELINE.md.

``vs_baseline`` divides by a provisional estimate of the single-threaded C++
reference's coupled-iteration throughput on an equivalent scene
(REF_ITERS_PER_S below).  The repository publishes no numbers and its
benchmark data is out-of-band (BASELINE.md); replace the estimate with a
measured value when the reference can be run.
"""

from __future__ import annotations

import json
import time

REF_ITERS_PER_S = 10.0  # provisional C++ single-thread estimate; see docstring

N_WARMUP = 3
N_TIMED = 15


def main() -> None:
    import jax

    from trajopt_tpu.runtime import cache as _cache

    _cache.enable()

    from __graft_entry__ import _build_problem
    from trajopt_tpu.solver import multi as multi_mod

    cfg, consts, scene, state = _build_problem(
        uav_num=8, n_pieces=4, res=8, n_points=4000,
        max_planes=16, max_self=4, max_ccd=16,
    )

    step = jax.jit(
        lambda s: multi_mod.multi_admm_step(
            consts, cfg, s, scene, coupled=True, axis_name=None
        )
    )

    for _ in range(N_WARMUP):
        state, diag = step(state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        state, diag = step(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    iters_per_s = N_TIMED / dt
    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_8robot_coupled_cross",
                "value": round(iters_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_s / REF_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
