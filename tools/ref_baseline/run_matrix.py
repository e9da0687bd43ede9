"""Run the full C++ reference baseline matrix and record measured numbers.

Builds the two harnesses (multi + single) against the read-only reference
headers, exports the exact scenes the TPU benchmarks solve, runs every
configuration of BASELINE.md's table on the host CPU, and writes one JSON
file with the parsed RESULT lines — the measured baseline that bench.py and
BASELINE.md cite.

Usage:
    python tools/ref_baseline/run_matrix.py [--work /tmp/ref_bench] \
        [--out tools/ref_baseline/results.json] [--uavs 2 4 8 16 32 64]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import re
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
REF = os.environ.get("REF", "/root/reference")


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, **kw)


def build(work: str) -> None:
    common = [
        f"{REF}/HighOrderCCD/Utils/CCDUtils.cpp",
        f"{REF}/HighOrderCCD/BVH/BVH.cpp",
        f"{REF}/HighOrderCCD/BVH/src/AABB.cc",
        "-x", "c", f"{REF}/lib/opengjk/src/openGJK.c", "-x", "none",
        f"-I{REF}", f"-I{REF}/lib/eigen3", f"-I{REF}/lib/opengjk/include",
    ]
    for src, exe in [
        (f"{REPO}/tools/ref_baseline/harness.cpp", f"{work}/ref_harness"),
        (f"{REPO}/tools/ref_baseline/harness_single.cpp",
         f"{work}/ref_harness_single"),
    ]:
        sh(["g++", "-O3", "-fopenmp", "-std=c++14", "-w", src, *common,
            "-o", exe])


def parse_result(stdout: str) -> dict:
    m = re.search(r"^RESULT (.*)$", stdout, re.M)
    if not m:
        raise RuntimeError(f"no RESULT line in output:\n{stdout[-2000:]}")
    rec = {}
    for kv in m.group(1).split():
        k, v = kv.split("=", 1)
        try:
            rec[k] = int(v) if re.fullmatch(r"-?\d+", v) else float(v)
        except ValueError:
            rec[k] = v
    return rec


def run_case(work: str, exe: str, args: list[str], timeout: int = 3600) -> dict:
    p = subprocess.run(
        [exe, *args], cwd=work, capture_output=True, text=True, timeout=timeout
    )
    rec = parse_result(p.stdout)
    rec["converged"] = p.returncode == 0
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ref_bench")
    ap.add_argument("--out", default=os.path.join(
        REPO, "tools", "ref_baseline", "results.json"))
    ap.add_argument("--uavs", type=int, nargs="+",
                    default=[2, 4, 8, 16, 32, 64])
    ap.add_argument("--max-iters", type=int, default=2000)
    ap.add_argument("--bridge-points", type=int, default=20000)
    ap.add_argument("--bridge-pieces", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    build(args.work)

    results = {"hardware": platform.processor() or platform.machine(),
               "cases": []}

    for u in args.uavs:
        name = f"cross_synth_u{u}"
        sh([sys.executable, f"{REPO}/tools/ref_baseline/export_scene.py",
            "--out", args.work, "--name", name, "--uavs", str(u)],
           env={**os.environ, "PYTHONPATH": REPO})
        for decouple in (1, 0):
            rec = run_case(args.work, f"{args.work}/ref_harness",
                           [name, str(decouple), str(args.max_iters)])
            rec["uavs"] = u
            results["cases"].append(rec)
            print(json.dumps(rec), flush=True)

    if not args.skip_single:
        for pieces in args.bridge_pieces:
            name = f"bridge_synth_p{pieces}"
            sh([sys.executable, f"{REPO}/tools/ref_baseline/export_scene.py",
                "--out", args.work, "--name", name, "--single",
                "--points", str(args.bridge_points), "--pieces", str(pieces)],
               env={**os.environ, "PYTHONPATH": REPO})
            rec = run_case(args.work, f"{args.work}/ref_harness_single",
                           [name, str(args.max_iters)])
            rec["pieces"] = pieces
            results["cases"].append(rec)
            print(json.dumps(rec), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out} ({len(results['cases'])} cases)")


if __name__ == "__main__":
    main()
