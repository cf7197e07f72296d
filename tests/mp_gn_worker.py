"""Worker process for test_multiprocess.py — real multi-process
jax.distributed (Gloo over localhost, 2 processes x 4 virtual CPU
devices) running the sharded Gauss-Newton solve.

This exercises the TRUE multi-host code path (global mesh spanning
non-addressable devices, device_put of global arrays, cross-process
psum) that the single-process 8-device tests cannot: the reference has
no distribution at all (SURVEY.md §2.3), and the north star requires
multi-host scaling. Run via `python tests/mp_gn_worker.py PID NPROC
PORT`, one invocation per process.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh

    from occlusionfusion_tpu.parallel.distributed_gn import solve_distributed
    from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, solve
    from test_gauss_newton import build_problem

    devs = jax.devices()
    assert len(devs) == nproc * jax.local_device_count(), (
        len(devs), jax.local_device_count(),
    )
    mesh = Mesh(np.asarray(devs), ("data",))

    problem, target, target_nodes = build_problem(n_pts=320, n_nodes=24)
    cfg = GNConfig(iters=4, cg_iters=20)
    single = solve(problem, cfg)  # process-local reference
    dist = solve_distributed(mesh, problem, cfg)

    def replicated_value(arr):
        return np.asarray(arr.addressable_shards[0].data)

    np.testing.assert_allclose(
        replicated_value(dist.translations),
        np.asarray(single.translations),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        replicated_value(dist.rotations),
        np.asarray(single.rotations),
        atol=1e-4,
    )
    hist_s = np.asarray(single.residual_history)
    np.testing.assert_allclose(
        replicated_value(dist.residual_history),
        hist_s,
        rtol=1e-2,
        atol=1e-6 * hist_s[0],
    )
    # point-sharded output: every locally-addressable shard must match
    # the corresponding slice of the single-device solution
    warped_s = np.asarray(single.warped_points)
    checked = 0
    for shard in dist.warped_points.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), warped_s[shard.index], atol=1e-4
        )
        checked += 1
    assert checked == jax.local_device_count(), checked
    print(f"MP_GN_OK pid={pid} shards={checked}", flush=True)


if __name__ == "__main__":
    main()
