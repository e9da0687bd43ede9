"""CLI smoke tests: both drivers end-to-end on tiny problems in a tmpdir.

Covers the argument plumbing the integration tests skip: config loading,
scene/mesh selection (including the multi CLI's RRT init branch), result-file
output, metrics JSONL, and the --mesh-devices sharded loop.
"""

import json
import os

import numpy as np
import pytest

from trajopt_tpu.cli import multi as cli_multi
from trajopt_tpu.cli import single as cli_single


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


@pytest.mark.slow
def test_single_cli_smoke(workdir):
    rc = cli_single.main([
        "--scene", "sphere", "--n-points", "300", "--max-iters", "3",
        "--result-dir", str(workdir / "result"),
        "--metrics", str(workdir / "m.jsonl"),
    ])
    assert rc == 0
    out = workdir / "result" / "sphere_synthetic_result_file_admm.txt"
    text = out.read_text()
    assert "iter:" in text and "point cloud size: 300" in text
    recs = [json.loads(l) for l in (workdir / "m.jsonl").read_text().splitlines()]
    assert len(recs) == 3 and "gnorm" in recs[0]


@pytest.mark.slow
def test_multi_cli_smoke_synthetic(workdir):
    rc = cli_multi.main([
        "--scene", "cross", "--uav-num", "2", "--n-pieces", "2",
        "--n-points", "300", "--max-iters", "3",
        "--result-dir", str(workdir / "result"),
        "--metrics", str(workdir / "m.jsonl"),
    ])
    assert rc == 0
    out = workdir / "result" / "cross_synthetic_result_file_admm.txt"
    assert "iter: 3" in out.read_text()


@pytest.mark.slow
def test_multi_cli_rrt_branch(workdir):
    """Mesh path with no init file => sequential RRT planning branch."""
    from trajopt_tpu.scenes import generators as gen

    cloud = gen.cross_scene(n_points=200, seed=3) / 5.0  # CLI rescales x5
    os.makedirs("model/multiple")
    with open("model/multiple/tiny.obj", "w") as f:
        for p in cloud:
            f.write(f"v {p[0]} {p[1]} {p[2]}\n")
    rc = cli_multi.main([
        "tiny.obj", "--uav-num", "2", "--max-iters", "2",
        "--result-dir", str(workdir / "result"),
    ])
    assert rc == 0
    assert (workdir / "result" / "tiny.obj_result_file_admm.txt").exists()


@pytest.mark.slow
def test_multi_cli_mesh_devices(workdir):
    rc = cli_multi.main([
        "--scene", "cross", "--uav-num", "4", "--n-pieces", "2",
        "--n-points", "200", "--max-iters", "2", "--mesh-devices", "2",
        "--result-dir", str(workdir / "result"),
    ])
    assert rc == 0
    out = workdir / "result" / "cross_synthetic_result_file_admm.txt"
    assert "iter: 2" in out.read_text()
