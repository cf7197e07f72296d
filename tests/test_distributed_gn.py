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


class TestDistributedDenseGN:
    """The PRODUCTION solver (dense block assembly) sharded: point-term
    assembly on each device's shard, one psum per GN iteration, exact
    ARAP/motion via weight rescaling (VERDICT round-1 item 5)."""

    def test_matches_single_device(self, mesh):
        from occlusionfusion_tpu.parallel.distributed_gn import (
            solve_dense_distributed,
        )
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

        problem, _, target_nodes = build_problem(n_pts=320, n_nodes=24)
        cfg = GNConfig(iters=5, assembly="blocks")
        single = solve_dense(problem, cfg)
        dist = solve_dense_distributed(mesh, problem, cfg)
        np.testing.assert_allclose(
            np.asarray(dist.translations),
            np.asarray(single.translations),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dist.rotations),
            np.asarray(single.rotations),
            atol=1e-5,
        )
        # converged tail values sit at ~1e-13 where reduction order
        # dominates; compare with an absolute floor relative to r0
        hist_s = np.asarray(single.residual_history)
        np.testing.assert_allclose(
            np.asarray(dist.residual_history),
            hist_s,
            rtol=1e-4,
            atol=1e-9 * hist_s[0],
        )

    def test_motion_term_exact_under_sharding(self, mesh):
        from occlusionfusion_tpu.parallel.distributed_gn import (
            solve_dense_distributed,
        )
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense
        import jax.numpy as jnp

        problem, _, target_nodes = build_problem(n_pts=320, n_nodes=24)
        problem = problem._replace(
            motion_targets=target_nodes,
            motion_confidence=jnp.ones(24),
        )
        cfg = GNConfig(iters=4, w_motion=2.0, assembly="blocks")
        single = solve_dense(problem, cfg)
        dist = solve_dense_distributed(mesh, problem, cfg)
        np.testing.assert_allclose(
            np.asarray(dist.translations),
            np.asarray(single.translations),
            atol=1e-5,
        )

    def test_realistic_caps(self, mesh):
        """512-node / 8192-point caps — the production envelope shapes
        (the round-1 dryrun only exercised 32-node toys)."""
        from occlusionfusion_tpu.parallel.distributed_gn import (
            solve_dense_distributed,
        )
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

        problem, _, target_nodes = build_problem(n_pts=8192, n_nodes=512)
        cfg = GNConfig(iters=2, assembly="blocks")
        single = solve_dense(problem, cfg)
        dist = solve_dense_distributed(mesh, problem, cfg)
        np.testing.assert_allclose(
            np.asarray(dist.translations),
            np.asarray(single.translations),
            atol=5e-5,
        )
        assert bool(dist.valid)
