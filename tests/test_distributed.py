"""Multi-process (multi-host analog) equivalence: 2 CPU processes x 2 virtual
devices, consensus collectives crossing the process boundary over Gloo.

This is the DCN-path test of SURVEY.md §2.3/§5: the same `multi_admm_step`
math, with `jax.distributed.initialize` wiring (`parallel/sharded.py::
init_distributed`) and a global 4-device robot mesh spanning both processes.
Each worker prints its locally-computed single-process gnorm and the
distributed gnorm; the parent asserts both processes agree with the reference.
"""

import json
import os
import subprocess
import sys

import pytest
import numpy as np

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


@pytest.mark.slow
def test_two_process_coupled_step_matches_single_process():
    port = 29300 + os.getpid() % 500
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
    for out, _ in outs:
        rec = json.loads(out.strip().splitlines()[-1])
        np.testing.assert_allclose(
            rec["got_gnorm"], rec["ref_gnorm"], rtol=1e-10,
            err_msg=f"process {rec['pid']} diverged from single-process",
        )
