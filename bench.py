"""Benchmark: ADMM iterations/s on the north-star 64-robot coupled scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

Scene: 64-robot antipodal cross swap (the reference's multiPathPlanning3D
scenario class, start/goal pattern per Main/multiPathPlanning3D.cpp:251-267),
res=8, quintic/jerk, reference 3D.json parameters with the multi-main's
ks=1e-3 — the fixed protocol of BASELINE.md.  This is BASELINE.json's
north-star configuration (≥10x the C++ solver on 64-robot cross, coupled).

Measures the production serving path: the whole iteration loop fused on
device (`driver.solve_fused_multi`, one `lax.while_loop`, zero host
round-trips), exactly how the reference's `while` loop around
`Optimization3D_multi::optimization` runs — but on TPU.

Failure-proof: if the solve does not converge within MAX_ITERS the JSON line
is still emitted with ``converged: false`` and the measured per-iteration
throughput (a convergence regression must never erase the perf record).

Extra keys (the reference's own per-phase printout, Optimization3D_admm.h:
63-65,480,518, plus a chip-utilization estimate):
  ``phase_ms``: {separate, spline_dir, ccd, slack} jitted separately at the
                bench shapes (sum > fused step: fusion across phases is lost)
  ``mfu``:      XLA-counted FLOPs of one fused step / measured step time /
                f32 peak of the chip (the solver is VPU/HBM-bound by design —
                this contextualizes, not flatters, the number)

``vs_baseline`` divides by the MEASURED single-threaded C++ reference
throughput on the same scene class at the same robot count, recorded by
`tools/ref_baseline/run_matrix.py` into `tools/ref_baseline/results.json`
(the harness drives the actual reference headers; see BASELINE.md).
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

# Per-chip f32 peak by device kind (public spec sheets); fallback: v5e.
_F32_PEAKS = {
    "TPU v2": 11.5e12,
    "TPU v3": 61.4e12 / 2,      # per chip (2 cores)
    "TPU v4": 137.5e12 / 2,     # bf16 peak/2 ~ f32
    "TPU v5 lite": 49.2e12,
    "TPU v5e": 49.2e12,
    "TPU v5": 229.1e12 / 2,
    "TPU v5p": 229.1e12 / 2,
    "TPU v6 lite": 91.8e12,
    "TPU v6e": 91.8e12,
}


def f32_peak_flops() -> float:
    """f32 peak of the attached chip, keyed on jax device_kind."""
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _F32_PEAKS.items():
        if kind.startswith(k):
            return v
    return 49.2e12


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


def phase_split_ms(cfg, consts, scene, state, reps: int = 10) -> dict:
    """Per-phase timings at the bench shapes (separately jitted)."""
    import functools

    import jax

    from trajopt_tpu.solver import admm, multi as multi_mod
    from trajopt_tpu.ops import kkt

    mp = functools.partial(jax.default_matmul_precision, "highest")

    @jax.jit
    def p_separate(st):
        with mp():
            return multi_mod._all_planes(consts, cfg, st, scene, None)[0]

    @jax.jit
    def p_dir(st, pl):
        with mp():
            return multi_mod._directions(consts, cfg, st, pl)

    @jax.jit
    def p_ccd(st, dirs):
        with mp():
            return multi_mod.coupled_ccd_step(
                consts, cfg, st.spline, dirs, scene, None
            )

    @jax.jit
    def p_slack(st):
        with mp():
            return jax.vmap(lambda s: admm.slack_update(consts, cfg, s))(st)

    def timeit(fn, args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    import jax.numpy as jnp

    planes = p_separate(state)
    ls, _ = p_dir(state, planes)
    ds, _ = kkt.finish_direction(ls, jnp.sum(ls.schur_s), jnp.sum(ls.schur_r))
    dirs = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
    return {
        "separate": round(timeit(p_separate, (state,)), 3),
        "spline_dir": round(timeit(p_dir, (state, planes)), 3),
        "ccd": round(timeit(p_ccd, (state, dirs)), 3),
        "slack": round(timeit(p_slack, (state,)), 3),
    }


def step_flops(cfg, consts, scene, state) -> float | None:
    """XLA's FLOP count for one fused coupled step (None if unavailable)."""
    import jax

    from trajopt_tpu.solver import multi as multi_mod

    try:
        def step(st, sc):
            return multi_mod.multi_admm_step(
                consts, cfg, st, sc, coupled=True, axis_name=None
            )

        compiled = jax.jit(step).lower(state, scene).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


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

    def run(max_iters, s0=None):
        # the reference's own protocol: full solve until gnorm < stop,
        # iters/s = iter / running time (BASELINE.md)
        return driver.solve_fused_multi(
            consts, cfg, s0 if s0 is not None else state0, scene,
            coupled=True, max_iters=max_iters
        )

    state, it, gnorm = run(MAX_ITERS)   # compile + warm up
    jax.block_until_ready(state)
    converged = int(it) < MAX_ITERS
    solve_iters = int(it)

    # timed runs: the converged solve, or a fixed 60-iteration window if the
    # solve regressed (still record throughput — never erase the perf record).
    # Each timed call gets an eps-perturbed initial state: the runtime DEDUPES
    # byte-identical repeat executions (observed on the tunneled TPU backend),
    # so identical repeats would time as ~0.
    timed_iters = MAX_ITERS if converged else 60
    starts = [
        state0._replace(spline=state0.spline + 1e-7 * (i + 1))
        for i in range(N_TIMED_CALLS)
    ]
    warm0 = state0._replace(spline=state0.spline - 1e-7)
    state, it, gnorm = run(timed_iters, warm0)
    jax.block_until_ready(state)
    jax.block_until_ready(starts)
    t0 = time.perf_counter()
    total_iters = 0
    for s0 in starts:
        state, it, gnorm = run(timed_iters, s0)
        total_iters += int(it)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    iters_per_s = total_iters / dt
    step_ms = dt / total_iters * 1e3

    phases = phase_split_ms(cfg, consts, scene, state0)
    flops = step_flops(cfg, consts, scene, state0)
    mfu = (
        round(flops / (step_ms * 1e-3) / f32_peak_flops(), 6)
        if flops
        else None
    )

    print(
        json.dumps(
            {
                "metric": "admm_iterations_per_s_64robot_coupled_cross",
                "value": round(iters_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_s / ref_iters_per_s(), 3),
                "converged": converged,
                "solve_iters": solve_iters,
                "final_gnorm": round(float(gnorm), 5),
                "step_ms": round(step_ms, 3),
                # separately-jitted per-phase timings: their SUM exceeds the
                # fused step_ms (each isolated phase pays its own dispatch +
                # loses cross-phase fusion) — use for ranking only; op-level
                # truth comes from a jax.profiler trace of the fused loop
                "phase_ms_isolated": phases,
                "step_flops": flops,
                "mfu": mfu,
            }
        )
    )


if __name__ == "__main__":
    main()
