"""Subprocess worker for the 2-process distributed equivalence test.

Run as: python tests/_dist_worker.py <coordinator_port> <process_id> <n_procs>

Each process owns 2 virtual CPU devices; the coupled multi-robot step runs on
the global (n_procs*2)-device robot mesh with the consensus collectives
crossing the process boundary (Gloo transport — the multi-host/DCN analog).
Prints one JSON line with the resulting gnorm and the single-process reference
gnorm computed locally, so the parent can assert equivalence.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    port, pid, n_procs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    from trajopt_tpu.parallel import sharded

    sharded.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=pid,
    )
    assert jax.process_count() == n_procs
    n_global = len(jax.devices())

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from test_sharded import make_problem
    from trajopt_tpu.solver import multi as multi_mod

    uavs = n_global
    cfg, consts, scene, state = make_problem(uav_num=uavs)

    # single-process reference on this process's first device
    ref_state, ref_diag = multi_mod.multi_admm_step_jit(
        consts, cfg, state, scene, True
    )
    ref_gnorm = float(ref_diag.gnorm)

    mesh = sharded.make_mesh(n_global)
    rsh = NamedSharding(mesh, P(sharded.ROBOT_AXIS))
    rep = NamedSharding(mesh, P())

    def globalize(sharding):
        def put(x):
            x = np.asarray(x)
            sh = sharding if x.ndim else rep
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return put

    gstate = jax.tree.map(globalize(rsh), state)
    gscene = jax.tree.map(globalize(rep), scene)
    step = sharded.sharded_multi_step(consts, cfg, mesh, coupled=True)
    new_state, diag = step(gstate, gscene)
    jax.block_until_ready(new_state)
    got_gnorm = float(np.asarray(diag.gnorm))   # diag replicated

    print(json.dumps({"pid": pid, "ref_gnorm": ref_gnorm, "got_gnorm": got_gnorm}))


if __name__ == "__main__":
    main()
