"""Per-phase timing of one coupled multi-robot ADMM iteration.

The reference prints per-iteration phase timers (separate / spline / slack,
Optimization3D_admm.h:63-65).  The TPU build's fused step has no host-visible
phase boundaries, so this tool jits each phase SEPARATELY at the bench shapes
and times it — the sum slightly exceeds the fused step (lost fusion across
boundaries) but the ranking tells us which kernels dominate.

Usage: python tools/profile_phases.py [--uavs 64] [--reps 20] [--trace DIR]
With --trace, additionally writes a jax.profiler trace of the fused step.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, args, reps):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uavs", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    from trajopt_tpu.runtime import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem
    from trajopt_tpu.solver import admm, multi as multi_mod
    from trajopt_tpu.ops import energies as en, gradients as gr, kkt
    from trajopt_tpu.types import concat_planes

    cfg, consts, scene, state = _build_problem(
        uav_num=args.uavs, n_pieces=4, res=8, n_points=4000,
        max_planes=16, max_self=4, max_ccd=16,
    )

    # Warm the state a few iterations so plane/CCD occupancy is realistic.
    warm = jax.jit(functools.partial(
        multi_mod.multi_admm_step, consts, cfg, coupled=True, axis_name=None
    ))
    for _ in range(5):
        state, diag = warm(state, scene)
    jax.block_until_ready(state)

    mp = functools.partial(jax.default_matmul_precision, "highest")

    @jax.jit
    def phase_obstacle_planes(st):
        with mp():
            return admm.separate_planes_batch(consts, cfg, st.spline, scene)[0]

    @jax.jit
    def phase_self_planes(st):
        with mp():
            return multi_mod.self_planes(consts, cfg, st.spline, None)[0]

    @jax.jit
    def phase_all_planes(st):
        with mp():
            return multi_mod._all_planes(consts, cfg, st, scene, None)[0]

    planes = phase_all_planes(state)

    @jax.jit
    def phase_gh(st, pl):
        with mp():
            def gh(s, p):
                return gr.piece_grads_and_hessians(
                    consts, cfg, s.spline, s.piece_time, p,
                    s.p_slack, s.t_slack, s.p_lambda, s.t_lambda, repair=False,
                )
            return jax.vmap(gh)(st, pl)

    @jax.jit
    def phase_directions(st, pl):
        with mp():
            return multi_mod._directions(consts, cfg, st, pl)

    ls, red = phase_directions(state, planes)

    @jax.jit
    def phase_ccd_build(st, dirs):
        with mp():
            return multi_mod._build_ccd(consts, cfg, st.spline, dirs, scene, None)

    @jax.jit
    def phase_ccd_step(st, dirs):
        with mp():
            return multi_mod.coupled_ccd_step(
                consts, cfg, st.spline, dirs, scene, None
            )

    ds, dt = kkt.finish_direction(ls, jnp.sum(ls.schur_s), jnp.sum(ls.schur_r))
    dirs = jax.vmap(lambda d: kkt.spread_direction(consts, d))(ds)
    dirs = jax.block_until_ready(dirs)

    @jax.jit
    def phase_energy(st, pl):
        with mp():
            ev = jax.vmap(
                lambda s, p: en.spline_energy(consts, cfg, s, p)
            )(st, pl)
            return jnp.sum(ev.value)

    @jax.jit
    def phase_slack(st):
        with mp():
            return jax.vmap(lambda s: admm.slack_update(consts, cfg, s))(st)

    @jax.jit
    def full_step(st):
        return multi_mod.multi_admm_step(
            consts, cfg, st, scene, coupled=True, axis_name=None
        )

    r = args.reps
    rows = {
        "full_step": timeit(full_step, (state,), r),
        "obstacle_planes": timeit(phase_obstacle_planes, (state,), r),
        "self_planes": timeit(phase_self_planes, (state,), r),
        "grads_hessians": timeit(phase_gh, (state, planes), r),
        "directions(gh+psd+chol)": timeit(phase_directions, (state, planes), r),
        "ccd_build_tables": timeit(phase_ccd_build, (state, dirs), r),
        "ccd_step(build+bisect)": timeit(phase_ccd_step, (state, dirs), r),
        "one_armijo_energy": timeit(phase_energy, (state, planes), r),
        "slack_update": timeit(phase_slack, (state,), r),
    }
    for k, v in rows.items():
        print(f"{k:28s} {v:9.3f} ms")
    print(json.dumps({k: round(v, 3) for k, v in rows.items()}))

    if args.trace:
        with jax.profiler.trace(args.trace):
            st, _ = full_step(state)
            jax.block_until_ready(st)
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
