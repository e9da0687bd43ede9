"""Benchmark: ADMM iterations/s on the north-star 64-robot coupled scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Scene: 64-robot antipodal cross swap (the reference's multiPathPlanning3D
scenario class, start/goal pattern per Main/multiPathPlanning3D.cpp:251-267),
res=8, quintic/jerk, reference 3D.json parameters with the multi-main's
ks=1e-3 — the fixed protocol of BASELINE.md.  This is BASELINE.json's
north-star configuration (≥10x the C++ solver on 64-robot cross, coupled).

Measures the production serving path: the whole iteration loop fused on
device (`driver.solve_fused_multi`, one `lax.while_loop`, zero host
round-trips), exactly how the reference's `while` loop around
`Optimization3D_multi::optimization` runs — but on TPU.

``vs_baseline`` divides by the MEASURED single-threaded C++ reference
throughput on the same scene class at the same robot count, recorded by
`tools/ref_baseline/run_matrix.py` into `tools/ref_baseline/results.json`
(the harness drives the actual reference headers; see BASELINE.md for the
full measured matrix and protocol).
"""

from __future__ import annotations


import json
import os
import time

# Measured fallback (tools/ref_baseline/results.json @ x86_64, 64 uavs coupled)
_REF_FALLBACK_ITERS_PER_S = 21.5

MAX_ITERS = 500
N_TIMED_CALLS = 3
UAVS = 64


def ref_iters_per_s(uavs: int = UAVS, mode: str = "coupled") -> float:
    """Measured C++ baseline iterations/s for the matching case."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools", "ref_baseline", "results.json",
    )
    try:
        with open(path) as f:
            data = json.load(f)
        for case in data["cases"]:
            if case.get("uavs") == uavs and case.get("mode") == mode:
                return float(case["iters_per_s"])
    except (OSError, KeyError, ValueError):
        pass
    return _REF_FALLBACK_ITERS_PER_S


def main() -> None:
    import jax

    from trajopt_tpu.runtime import cache as _cache

    _cache.enable()

    from __graft_entry__ import _build_problem
    from trajopt_tpu.solver import driver

    cfg, consts, scene, state0 = _build_problem(
        uav_num=UAVS, n_pieces=4, res=8, n_points=4000,
        max_planes=16, max_self=4, max_ccd=16,
    )

    def run():
        # the reference's own protocol: full solve until gnorm < stop,
        # iters/s = iter / running time (BASELINE.md)
        return driver.solve_fused_multi(
            consts, cfg, state0, scene, coupled=True, max_iters=MAX_ITERS
        )

    state, it, gnorm = run()   # compile + warm up
    jax.block_until_ready(state)
    assert int(it) < MAX_ITERS, "did not converge within MAX_ITERS"

    t0 = time.perf_counter()
    total_iters = 0
    for _ in range(N_TIMED_CALLS):
        state, it, gnorm = run()
        total_iters += int(it)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    iters_per_s = total_iters / dt
    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_64robot_coupled_cross",
                "value": round(iters_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_s / ref_iters_per_s(), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
