"""Distributed GN must equal the single-device solve on an 8-device
virtual CPU mesh (the reference has no distribution at all; this is the
sharded == single-device contract from SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.parallel.mesh import make_fusion_mesh
from occlusionfusion_tpu.parallel.distributed_gn import solve_distributed
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, solve
from test_gauss_newton import build_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return make_fusion_mesh(8)


class TestDistributedGN:
    def test_matches_single_device(self, mesh):
        problem, target, target_nodes = build_problem(n_pts=320, n_nodes=24)
        cfg = GNConfig(iters=6, cg_iters=30)
        single = solve(problem, cfg)
        dist = solve_distributed(mesh, problem, cfg)
        np.testing.assert_allclose(
            np.asarray(dist.translations),
            np.asarray(single.translations),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(dist.rotations), np.asarray(single.rotations), atol=1e-4
        )
        # residual histories agree up to reduction-order float noise
        hist_d = np.asarray(dist.residual_history)
        hist_s = np.asarray(single.residual_history)
        np.testing.assert_allclose(
            hist_d, hist_s, rtol=1e-2, atol=1e-6 * hist_s[0]
        )

    def test_recovers_rigid(self, mesh):
        problem, target, target_nodes = build_problem(n_pts=320, n_nodes=24)
        res = solve_distributed(mesh, problem, GNConfig(iters=10, cg_iters=40))
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 5e-3
