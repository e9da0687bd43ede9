"""Offline viewer smoke tests (matplotlib Agg backend)."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from trajopt_tpu import viz
from trajopt_tpu.ops import splines as sp
from trajopt_tpu.scenes import generators as gen


def test_plot_scene_and_history(tmp_path):
    cloud, wps = gen.bridge_scene(n_points=500)
    ops = sp.build_spline_ops(len(wps) - 1, 4)
    n_rows = ops.trajectory_num  # stored rows T = (order+1)+(P-1)*(order-2)
    spline = np.linspace(wps[0], wps[-1], n_rows)

    scene_png = tmp_path / "scene.png"
    viz.plot_scene(ops, cloud, spline, 20.0, str(scene_png), waypoints=wps)
    assert scene_png.stat().st_size > 1000

    multi_png = tmp_path / "multi.png"
    viz.plot_scene(
        ops, cloud, np.stack([spline, spline + 0.5]), np.array([20.0, 18.0]),
        str(multi_png),
    )
    assert multi_png.stat().st_size > 1000

    hist = [
        {"iter": i, "gnorm": 10.0 / (i + 1), "consensus_residual": 5.0 / (i + 1),
         "energy": 100.0 - i, "step": 1.0, "ccd_step": 0.8, "n_planes": 12 + i}
        for i in range(10)
    ]
    hist_png = tmp_path / "hist.png"
    viz.plot_history(hist, str(hist_png))
    assert hist_png.stat().st_size > 1000
