"""Trajectory-quality parity gate vs the measured C++ reference.

The harness `tools/ref_baseline/` drove the ACTUAL reference headers on
byte-identical exported scenes and recorded the reference's own quality
metrics per case into results.json (BASELINE.md).  These tests solve the same
scenes with the TPU build and assert the §6-protocol parity definition:
``ccd_time`` / ``ccd_len`` within ~2% and min point-cloud clearance >= offset
at the same ``gnorm < 1e-2`` stop.  (`tools/parity_report.py` runs the FULL
case matrix and writes PARITY.md; these tests pin the representative rows in
CI.)
"""

import json
import os

import pytest

TOL = 0.02

_REF_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tools", "ref_baseline", "results.json"
)


def _ref_case(**want):
    with open(_REF_PATH) as f:
        for c in json.load(f)["cases"]:
            if all(c.get(k) == v for k, v in want.items()):
                return c
    raise AssertionError(f"no reference case {want}")


def _assert_parity(got, ref):
    assert got["converged"], f"no convergence: {got}"
    dtime = abs(got["ccd_time"] - ref["ccd_time"]) / ref["ccd_time"]
    dlen = abs(got["ccd_len"] - ref["ccd_len"]) / ref["ccd_len"]
    assert dtime <= TOL, (
        f"ccd_time off by {dtime * 100:.2f}%: "
        f"{got['ccd_time']} vs C++ {ref['ccd_time']}"
    )
    assert dlen <= TOL, (
        f"ccd_len off by {dlen * 100:.2f}%: "
        f"{got['ccd_len']} vs C++ {ref['ccd_len']}"
    )
    assert got["min_clearance"] >= got["offset"], (
        f"clearance {got['min_clearance']} < offset {got['offset']}"
    )


@pytest.mark.parametrize("mode", ["decoupled", "coupled"])
@pytest.mark.slow
def test_parity_4uav_cross(mode):
    from tools.parity_report import solve_multi_case

    ref = _ref_case(uavs=4, mode=mode)
    got = solve_multi_case(4, coupled=mode == "coupled")
    _assert_parity(got, ref)


@pytest.mark.slow
def test_parity_single_bridge_p4():
    from tools.parity_report import solve_single_case

    ref = _ref_case(mode="single", pieces=4)
    got = solve_single_case(4)
    _assert_parity(got, ref)


@pytest.mark.slow
def test_parity_16uav_coupled():
    from tools.parity_report import solve_multi_case

    ref = _ref_case(uavs=16, mode="coupled")
    got = solve_multi_case(16, coupled=True)
    _assert_parity(got, ref)
