"""Trajectory-quality parity gate vs the measured C++ reference.

Solves every case of ``tools/ref_baseline/results.json`` (the actual reference
headers driven by harness.cpp / harness_single.cpp on byte-identical exported
scenes — see BASELINE.md) with the TPU build, computes the reference's own
quality metrics (``ccd_time`` = sum of time_weight*piece_time, ``ccd_len`` =
resampled arc length, ``min_clearance`` — Main/admmPathPlanning3D.cpp:33-77),
and writes PARITY.md + tools/parity.json.

Parity definition (SURVEY §7.3): the two implementations do not match
iterate-for-iterate; they must converge to the same trajectory QUALITY —
ccd_time / ccd_len within tolerance at matched stop, clearance >= offset.

Usage: python tools/parity_report.py [--tol 0.02] [--out PARITY.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOL = 0.02


def solve_multi_case(uavs: int, coupled: bool, n_points=4000, n_pieces=4):
    import numpy as np

    from trajopt_tpu.solver import driver
    from trajopt_tpu import metrics as mt
    from trajopt_tpu.ops import splines as sp
    from __graft_entry__ import _build_problem

    cfg, consts, scene, state0 = _build_problem(
        uav_num=uavs, n_pieces=n_pieces, res=8, n_points=n_points,
        max_planes=16, max_self=4, max_ccd=16,
    )
    import jax

    state, it, gnorm = driver.solve_fused_multi(
        consts, cfg, state0, scene, coupled=coupled, max_iters=600
    )
    jax.block_until_ready(state)
    ops = sp.build_spline_ops(n_pieces, cfg.res)
    from trajopt_tpu.scenes import generators as gen

    cloud = gen.cross_scene(n_points=n_points, seed=0)
    ccd_time = ccd_len = 0.0
    clearance = np.inf
    for i in range(uavs):
        st = mt.trajectory_stats(
            ops, np.asarray(state.spline[i]), float(state.piece_time[i])
        )
        ccd_time += st["ccd_time"]
        ccd_len += st["ccd_len"]
        clearance = min(clearance, float(mt.min_curve_clearance(
            ops, np.asarray(state.spline[i]), cloud, float(state.piece_time[i])
        )))
    return {
        "iters": int(it), "gnorm": float(gnorm),
        "converged": int(it) < 600,
        "ccd_time": round(ccd_time, 3), "ccd_len": round(ccd_len, 3),
        "min_clearance": round(clearance, 4), "offset": cfg.offset,
    }


def solve_single_case(pieces: int, n_points=20000):
    import numpy as np

    from trajopt_tpu.config import TrajOptConfig
    from trajopt_tpu import types as tt
    from trajopt_tpu import metrics as mt
    from trajopt_tpu.ops import splines as sp
    from trajopt_tpu.scenes import generators as gen
    from trajopt_tpu.solver import driver
    import jax

    cfg = TrajOptConfig(ks=1e-8, max_planes=16, max_ccd_candidates=16)
    cloud, wp = gen.bridge_scene(n_points=n_points, seed=0, n_pieces=pieces)
    ops = sp.build_spline_ops(pieces, cfg.res)
    consts = tt.device_consts(ops)
    scene = tt.make_scene(cloud)
    state0 = tt.init_state(ops, wp, cfg.init_piece_time)
    state, it, gnorm = driver.solve_fused(
        consts, cfg, state0, scene, max_iters=2000
    )
    jax.block_until_ready(state)
    st = mt.trajectory_stats(ops, np.asarray(state.spline), float(state.piece_time))
    clearance = float(mt.min_curve_clearance(
        ops, np.asarray(state.spline), cloud, float(state.piece_time)
    ))
    return {
        "iters": int(it), "gnorm": float(gnorm),
        "converged": int(it) < 2000,
        "ccd_time": round(st["ccd_time"], 3), "ccd_len": round(st["ccd_len"], 3),
        "min_clearance": round(clearance, 4), "offset": cfg.offset,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=TOL)
    # NOTE: default deliberately NOT PARITY.md — that file is the committed
    # component-mapping document; the measured table gets its own file.
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PARITY_MEASURED.md"))
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(__file__), "parity.json"))
    ap.add_argument("--quick", action="store_true",
                    help="u2/u4 + single p4 only")
    args = ap.parse_args()

    from trajopt_tpu.runtime import cache as _cache

    _cache.enable()

    ref_path = os.path.join(os.path.dirname(__file__), "ref_baseline",
                            "results.json")
    with open(ref_path) as f:
        ref = json.load(f)["cases"]

    rows = []
    for case in ref:
        uavs = case.get("uavs")
        if args.quick and (
            (uavs is not None and uavs > 4)
            or (case["mode"] == "single" and case["pieces"] > 4)
        ):
            continue
        t0 = time.perf_counter()
        if case["mode"] == "single":
            got = solve_single_case(case["pieces"])
            label = f"single p{case['pieces']}"
        else:
            got = solve_multi_case(uavs, coupled=case["mode"] == "coupled")
            label = f"{uavs} uav {case['mode']}"
        dtime = abs(got["ccd_time"] - case["ccd_time"]) / case["ccd_time"]
        dlen = abs(got["ccd_len"] - case["ccd_len"]) / case["ccd_len"]
        ok = (
            got["converged"]
            and dtime <= args.tol
            and dlen <= args.tol
            and got["min_clearance"] >= got["offset"]
        )
        rows.append({
            "case": label, "ref": case, "tpu": got,
            "dtime_rel": round(dtime, 4), "dlen_rel": round(dlen, 4),
            "pass": bool(ok),
        })
        print(f"{label:22s} ccd_time {got['ccd_time']:9.3f} vs "
              f"{case['ccd_time']:9.3f} ({dtime * 100:5.2f}%)  "
              f"ccd_len {got['ccd_len']:9.3f} vs {case['ccd_len']:9.3f} "
              f"({dlen * 100:5.2f}%)  clr {got['min_clearance']:6.3f}  "
              f"{'PASS' if ok else 'FAIL'}  [{time.perf_counter()-t0:5.1f}s]",
              flush=True)

    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1)

    with open(args.out, "w") as f:
        f.write(
            "# PARITY (measured) — trajectory quality vs the measured C++ reference\n\n"
            "Protocol (SURVEY §6 / BASELINE.md): both solvers consume the\n"
            "byte-identical exported scenes (`tools/ref_baseline/`), run to the\n"
            "same `gnorm < 1e-2` stop, and report the reference's own quality\n"
            "metrics — `ccd_time` (converged total trajectory time), `ccd_len`\n"
            "(densely resampled arc length), and min point-cloud clearance\n"
            "(Main/admmPathPlanning3D.cpp:33-77).  Parity = ccd_time/ccd_len\n"
            f"within {args.tol * 100:.0f}% and clearance >= offset (0.1); the\n"
            "solvers are not expected to match iterate-for-iterate.\n\n"
            "Generated by `python tools/parity_report.py` "
            f"(backend: {_backend()}).\n\n"
            "| case | iters (C++ / TPU) | ccd_time (C++ / TPU / Δ) | "
            "ccd_len (C++ / TPU / Δ) | min clearance (C++ / TPU) | pass |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            c, g = r["ref"], r["tpu"]
            f.write(
                f"| {r['case']} | {c['iters']} / {g['iters']} "
                f"| {c['ccd_time']:.2f} / {g['ccd_time']:.2f} / "
                f"{r['dtime_rel'] * 100:.2f}% "
                f"| {c['ccd_len']:.2f} / {g['ccd_len']:.2f} / "
                f"{r['dlen_rel'] * 100:.2f}% "
                f"| {c['min_clearance']:.3f} / {g['min_clearance']:.3f} "
                f"| {'PASS' if r['pass'] else 'FAIL'} |\n"
            )
        n_pass = sum(r["pass"] for r in rows)
        f.write(f"\n**{n_pass}/{len(rows)} cases at parity.**\n")
    print(f"wrote {args.out} and {args.json}")


def _backend() -> str:
    import jax

    return f"{jax.default_backend()}: {jax.devices()[0].device_kind}"


if __name__ == "__main__":
    main()
