"""Export the bench scene to the reference's input formats.

Writes ``model/multiple/<name>.obj`` (point cloud, pre-divided by 5 since the
reference multiplies V by 5 after reading, Main/multiPathPlanning3D.cpp:536)
and ``init/<name>_init_file.txt`` (one line per waypoint, ``x y z`` columns
per robot, also pre-divided by 5, reader at Main/multiPathPlanning3D.cpp:78-115)
so the C++ reference solves EXACTLY the scene bench.py solves — filling
BASELINE.md's measured-baseline table.

Usage: python tools/ref_baseline/export_scene.py --out /tmp/ref_bench [--uavs 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--name", default="cross_synth")
    ap.add_argument("--uavs", type=int, default=8)
    ap.add_argument("--pieces", type=int, default=4)
    ap.add_argument("--points", type=int, default=4000)
    ap.add_argument("--single", action="store_true",
                    help="export the single-UAV bridge scene instead "
                         "(model/single/, unscaled, single-column init)")
    args = ap.parse_args()

    from trajopt_tpu.scenes import generators as gen

    if args.single:
        cloud, wp = gen.bridge_scene(n_points=args.points, seed=0,
                                     n_pieces=args.pieces)
        os.makedirs(os.path.join(args.out, "model", "single"), exist_ok=True)
        os.makedirs(os.path.join(args.out, "init"), exist_ok=True)
        os.makedirs(os.path.join(args.out, "result"), exist_ok=True)
        obj = os.path.join(args.out, "model", "single", f"{args.name}.obj")
        with open(obj, "w") as f:
            for p in cloud:
                f.write(f"v {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        init = os.path.join(args.out, "init", f"{args.name}_init_file.txt")
        with open(init, "w") as f:
            for p in wp:
                f.write(f"{p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        print(f"wrote {obj} ({len(cloud)} pts) and {init} "
              f"({len(wp) - 1} pieces)")
        return

    cloud = gen.cross_scene(n_points=args.points, seed=0)
    wps = gen.assign_lanes(
        gen.cross_waypoints(args.uavs, args.pieces), cloud
    )  # [U, W, 3]

    os.makedirs(os.path.join(args.out, "model", "multiple"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "init"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "result"), exist_ok=True)

    obj = os.path.join(args.out, "model", "multiple", f"{args.name}.obj")
    with open(obj, "w") as f:
        for p in cloud / 5.0:
            f.write(f"v {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")

    init = os.path.join(args.out, "init", f"{args.name}_init_file.txt")
    with open(init, "w") as f:
        for w in range(wps.shape[1]):
            row = (wps[:, w, :] / 5.0).reshape(-1)
            f.write(" ".join(f"{x:.17g}" for x in row) + "\n")

    print(f"wrote {obj} ({len(cloud)} pts) and {init} "
          f"({wps.shape[0]} robots x {wps.shape[1]} waypoints)")


if __name__ == "__main__":
    main()
