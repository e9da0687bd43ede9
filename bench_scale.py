"""Scaling benchmarks: robots x mode x scenario-batch, full-solve protocol.

Measures the reference's own metric (ADMM iterations / wall-clock second,
BASELINE.md) across the scale axes the TPU build is designed for:

* robot count 8..64 on the cross-swap scene class (coupled + decoupled)
* scenario batching (vmap over independent problems)

Writes one JSON line per configuration to stdout and (with --out) a JSON file
used to fill BASELINE.md's results table.  `bench.py` remains the driver's
single-line headline benchmark; this file is the full matrix.
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def _timed_median(run, state0, n=3):
    """Median wall time of ``n`` distinct-start solves.

    The runtime dedupes byte-identical repeat executions (~0 s) and the first
    timed call of a process is sporadically inflated — the median of three
    eps-distinct solves is stable.  Returns (dt_seconds, iters)."""
    import time as _time

    import jax

    times, iters = [], None
    for i in range(n):
        s0 = state0._replace(spline=state0.spline + 1e-7 * (i + 3))
        jax.block_until_ready(s0)
        t0 = _time.perf_counter()
        state, it, gnorm = run(s0)
        jax.block_until_ready(state)
        times.append(_time.perf_counter() - t0)
        iters = int(it)
    times.sort()
    return times[len(times) // 2], iters, gnorm


def run_case(uav_num: int, coupled: bool, n_points: int = 4000,
             n_pieces: int = 4, max_iters: int = 600) -> dict:
    import jax
    from __graft_entry__ import _build_problem
    from trajopt_tpu.solver import driver

    cfg, consts, scene, state0 = _build_problem(
        uav_num=uav_num, n_pieces=n_pieces, res=8, n_points=n_points,
        max_planes=16, max_self=4, max_ccd=16,
    )

    def run(s0):
        return driver.solve_fused_multi(
            consts, cfg, s0, scene, coupled=coupled, max_iters=max_iters
        )

    state, it, gnorm = run(state0)
    jax.block_until_ready(state)
    dt, iters, gnorm = _timed_median(run, state0)
    return {
        "case": f"{uav_num}robot_{'coupled' if coupled else 'decoupled'}_cross",
        "uav_num": uav_num,
        "mode": "coupled" if coupled else "decoupled",
        "iters": iters,
        "wall_ms": round(dt * 1e3, 1),
        "iters_per_s": round(iters / dt, 2),
        "converged": iters < max_iters,
        "gnorm": float(gnorm),
        "n_points": n_points,
    }


def run_single(pieces: int, n_points: int = 20000, max_iters: int = 2000) -> dict:
    """Single-UAV bridge-class corridor, the admmPathPlanning3D protocol
    (ks=1e-8, kt=1 — BASELINE.md single-UAV rows, measured C++ at P=4/8/16)."""
    import jax

    from trajopt_tpu.config import TrajOptConfig
    from trajopt_tpu import types as tt
    from trajopt_tpu.ops import splines as sp
    from trajopt_tpu.scenes import generators as gen
    from trajopt_tpu.solver import driver

    cfg = TrajOptConfig(ks=1e-8, max_planes=16, max_ccd_candidates=16)
    cloud, wp = gen.bridge_scene(n_points=n_points, seed=0, n_pieces=pieces)
    ops = sp.build_spline_ops(pieces, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state0 = tt.init_state(ops, wp, cfg.init_piece_time)

    def run(s0):
        return driver.solve_fused(consts, cfg, s0, scene, max_iters=max_iters)

    state, it, gnorm = run(state0)
    jax.block_until_ready(state)
    dt, iters, gnorm = _timed_median(run, state0)
    return {
        "case": f"single_bridge_p{pieces}",
        "pieces": pieces,
        "mode": "single",
        "iters": iters,
        "wall_ms": round(dt * 1e3, 1),
        "iters_per_s": round(iters / dt, 2),
        "converged": iters < max_iters,
        "gnorm": float(gnorm),
        "n_points": n_points,
    }


def run_batched_single(batch: int, pieces: int = 4, n_points: int = 2000,
                       iters: int = 50) -> dict:
    """Scenario batching of SINGLE-UAV solves — the TPU's throughput story
    vs the C++ single-thread 2,580 it/s single-UAV number (BASELINE.md):
    one chip amortizes its latency across ``batch`` independent scenarios."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trajopt_tpu.config import TrajOptConfig
    from trajopt_tpu import types as tt
    from trajopt_tpu.ops import splines as sp
    from trajopt_tpu.scenes import generators as gen
    from trajopt_tpu.solver import driver

    cfg = TrajOptConfig(ks=1e-8, max_planes=16, max_ccd_candidates=16,
                        stop=0.0)                      # fixed-iter throughput
    cloud, wp = gen.bridge_scene(n_points=n_points, seed=0, n_pieces=pieces)
    ops = sp.build_spline_ops(pieces, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state0 = tt.init_state(ops, wp, cfg.init_piece_time)
    rng = np.random.default_rng(0)
    deltas = jnp.asarray(
        rng.normal(scale=1e-3, size=(batch,) + state0.spline.shape),
        state0.spline.dtype,
    )
    states = jax.vmap(lambda d: state0._replace(spline=state0.spline + d))(deltas)

    # batch-aware fused driver, NOT vmap(solve_fused): vmap turns the
    # step's lax.conds into both-sides selects (round-4 plateau; see
    # driver.solve_fused_batch)
    fn = jax.jit(functools.partial(
        driver.solve_fused_batch, consts, cfg, scene=scene, max_iters=iters
    ))
    out = fn(states)
    jax.block_until_ready(out[0])
    states2 = jax.tree.map(
        lambda x: x + 1e-7 if jnp.issubdtype(x.dtype, jnp.floating) else x,
        states,
    )                                                   # dedup guard
    jax.block_until_ready(states2)
    t0 = time.perf_counter()
    out = fn(states2)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    total = batch * iters
    return {
        "case": f"batch{batch}_single_p{pieces}",
        "batch": batch,
        "mode": "batched_single",
        "pieces": pieces,
        "iters_per_s": round(total / dt, 2),
        "solve_iters_per_s_per_scenario": round(iters / dt, 2),
        "wall_ms": round(dt * 1e3, 1),
    }


def run_batched(batch: int, uav_num: int = 4, n_points: int = 2000,
                iters: int = 50) -> dict:
    """Scenario batching: vmap the coupled step over independent problems."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_problem
    from trajopt_tpu.solver import driver

    cfg, consts, scene, state0 = _build_problem(
        uav_num=uav_num, n_pieces=4, res=8, n_points=n_points,
        max_planes=16, max_self=4, max_ccd=16,
    )
    cfg = dataclasses.replace(cfg, stop=0.0)   # fixed-iteration throughput
    # independent scenarios: jitter the initial splines
    rng = np.random.default_rng(0)
    deltas = jnp.asarray(
        rng.normal(scale=1e-3, size=(batch,) + state0.spline.shape),
        state0.spline.dtype,
    )
    states = jax.vmap(lambda d: state0._replace(spline=state0.spline + d))(deltas)

    # grouped fleet batching (driver.solve_fused_batch_multi): B independent
    # coupled fleets in one fused loop — scenario-block pair masks, per-group
    # Schur/CCD/Armijo reductions, real (non-vmapped) cond staging
    fn = jax.jit(functools.partial(
        driver.solve_fused_batch_multi, consts, cfg, scene=scene,
        coupled=True, max_iters=iters,
    ))
    out = fn(states)
    jax.block_until_ready(out[0])
    states2 = jax.tree.map(
        lambda x: x + 1e-7 if jnp.issubdtype(x.dtype, jnp.floating) else x,
        states,
    )                                                   # dedup guard, see bench.py
    jax.block_until_ready(states2)
    t0 = time.perf_counter()
    out = fn(states2)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    total = batch * iters
    return {
        "case": f"batch{batch}_{uav_num}robot_coupled",
        "batch": batch,
        "uav_num": uav_num,
        "iters_per_s": round(total / dt, 2),
        "solve_iters_per_s_per_scenario": round(iters / dt, 2),
        "wall_ms": round(dt * 1e3, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true", help="8/16 robots only")
    args = ap.parse_args()

    from trajopt_tpu.runtime import cache as _cache

    _cache.enable()

    import os

    ref = {}
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools", "ref_baseline", "results.json",
    )
    try:
        with open(ref_path) as f:
            for case in json.load(f)["cases"]:
                key = (case.get("uavs"), case.get("mode"), case.get("pieces"))
                ref[key] = float(case["iters_per_s"])
    except (OSError, KeyError, ValueError):
        pass

    def with_ref(r):
        key = (
            (r["uav_num"], r["mode"], None)
            if "uav_num" in r
            else (None, "single", r["pieces"])
        )
        if key in ref:
            r["ref_iters_per_s"] = ref[key]
            r["vs_baseline"] = round(r["iters_per_s"] / ref[key], 3)
        return r

    results = []
    robots = [8, 16] if args.quick else [8, 16, 32, 64]
    for u in robots:
        for coupled in (True, False):
            r = with_ref(run_case(u, coupled))
            results.append(r)
            print(json.dumps(r), flush=True)
    for pieces in ([4] if args.quick else [4, 8, 16]):
        r = with_ref(run_single(pieces))
        results.append(r)
        print(json.dumps(r), flush=True)
    for b in ([4] if args.quick else [4, 16]):
        r = run_batched(b)
        # AGGREGATE semantics: iters_per_s sums ADMM iterations across all
        # `batch` independent fleet problems advancing in lockstep on one
        # chip; the denominator is the C++ single-thread 4-robot coupled
        # row (816.1 it/s) solving ONE problem — i.e. chip-vs-core
        # throughput, not per-problem latency.
        key = (r["uav_num"], "coupled", None)
        if key in ref:
            r["ref_iters_per_s"] = ref[key]
            r["vs_baseline"] = round(r["iters_per_s"] / ref[key], 3)
        r["aggregate_semantics"] = (
            f"sum of iters across {b} independent {r['uav_num']}-robot "
            "coupled problems per second vs one C++ thread solving one"
        )
        results.append(r)
        print(json.dumps(r), flush=True)
    for b in ([16] if args.quick else [16, 64, 256, 1024]):
        r = run_batched_single(b)
        # aggregate-throughput comparison vs the C++ single-UAV p4 row
        key = (None, "single", r["pieces"])
        if key in ref:
            r["ref_iters_per_s"] = ref[key]
            r["vs_baseline"] = round(r["iters_per_s"] / ref[key], 3)
        r["aggregate_semantics"] = (
            f"sum of iters across {b} independent single-UAV p{r['pieces']} "
            "problems per second vs one C++ thread solving one"
        )
        results.append(r)
        print(json.dumps(r), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
