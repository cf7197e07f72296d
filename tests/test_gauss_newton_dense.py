"""Dense-assembly GN must agree with the matrix-free GN-CG solver (the
two independent implementations cross-validate the jacobian math)."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, solve
from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense
from test_gauss_newton import build_problem


class TestDenseGN:
    def test_matches_matrix_free(self):
        problem, target, target_nodes = build_problem(n_pts=300, n_nodes=30)
        cfg = GNConfig(iters=8, cg_iters=80, lm_damping=1e-5)
        mf = solve(problem, cfg)
        de = solve_dense(problem, cfg)
        # both must land on the same solution
        np.testing.assert_allclose(
            np.asarray(de.translations), np.asarray(mf.translations), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(de.rotations), np.asarray(mf.rotations), atol=2e-4
        )
        # and identical initial residuals (same objective)
        np.testing.assert_allclose(
            float(de.residual_history[0]),
            float(mf.residual_history[0]),
            rtol=1e-5,
        )

    def test_rigid_recovery(self):
        problem, target, target_nodes = build_problem()
        res = solve_dense(problem, GNConfig(iters=8))
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3

    def test_frozen_nodes(self):
        problem, _, _ = build_problem()
        freeze = np.ones(problem.nodes.shape[0], bool)
        freeze[:8] = False
        problem = problem._replace(solve_node_mask=jnp.asarray(freeze))
        res = solve_dense(problem, GNConfig(iters=5))
        np.testing.assert_allclose(np.asarray(res.translations[:8]), 0.0, atol=1e-7)
        assert float(jnp.abs(res.translations[8:]).max()) > 1e-3

    def test_motion_term(self):
        problem, _, target_nodes = build_problem(hide_frac=1.0)
        problem = problem._replace(
            motion_targets=target_nodes,
            motion_confidence=jnp.ones(problem.nodes.shape[0]),
        )
        res = solve_dense(problem, GNConfig(iters=8, w_motion=5.0))
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 1e-2

    def test_converges_in_few_iterations(self):
        problem, target, _ = build_problem()
        res = solve_dense(problem, GNConfig(iters=5, lm_damping=1e-6))
        hist = np.asarray(res.residual_history)
        assert hist[-1] < hist[0] * 1e-4

    def test_cg_linear_solver_matches_cholesky(self):
        problem, target, _ = build_problem()
        res_chol = solve_dense(problem, GNConfig(iters=6))
        res_cg = solve_dense(
            problem,
            GNConfig(iters=6, linear_solver="cg", dense_cg_iters=48),
        )
        np.testing.assert_allclose(
            np.asarray(res_cg.translations),
            np.asarray(res_chol.translations),
            atol=2e-4,
        )
        err = jnp.linalg.norm(res_cg.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3

    def test_cg_default_iters_converges(self):
        problem, target, _ = build_problem()
        res = solve_dense(problem, GNConfig(iters=6, linear_solver="cg"))
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1.5e-3

    def test_bf16_normal_matrix_still_converges(self):
        """A in bf16 ('default' MXU precision) only perturbs the step
        direction; damped GN still reaches the solution."""
        problem, target, _ = build_problem()
        res = solve_dense(
            problem,
            GNConfig(iters=8, normal_matrix_precision="default"),
        )
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3
        hist = np.asarray(res.residual_history)
        assert hist[-1] < hist[0] * 1e-3

    def test_schur_linear_solver_matches_cholesky(self):
        problem, target, _ = build_problem()
        res_chol = solve_dense(problem, GNConfig(iters=6))
        res_s = solve_dense(
            problem, GNConfig(iters=6, linear_solver="schur", schur_leaf=48)
        )
        np.testing.assert_allclose(
            np.asarray(res_s.translations),
            np.asarray(res_chol.translations),
            atol=2e-4,
        )
        err = jnp.linalg.norm(res_s.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3


class TestSchurInverse:
    def test_inverse_of_random_spd(self):
        from occlusionfusion_tpu.ops.blocksolve import spd_schur_inverse

        rng = np.random.RandomState(0)
        for n, leaf in ((60, 24), (300, 96), (768, 96)):
            J = rng.randn(2 * n, n).astype(np.float32)
            M = J.T @ J / n + 0.1 * np.eye(n, dtype=np.float32)
            Minv = np.asarray(spd_schur_inverse(jnp.asarray(M), leaf=leaf))
            err = np.abs(Minv @ M - np.eye(n)).max()
            assert err < 5e-3, (n, err)

    def test_nonpower_of_two_and_leaf_passthrough(self):
        from occlusionfusion_tpu.ops.blocksolve import spd_schur_inverse

        rng = np.random.RandomState(1)
        n = 90  # not a multiple of the 6-dof split rounding
        J = rng.randn(2 * n, n).astype(np.float32)
        M = J.T @ J / n + 0.1 * np.eye(n, dtype=np.float32)
        Minv = np.asarray(spd_schur_inverse(jnp.asarray(M), leaf=13))
        assert np.abs(Minv @ M - np.eye(n)).max() < 5e-3

    def test_newton_schulz_inverse_of_random_spd(self):
        from occlusionfusion_tpu.ops.blocksolve import newton_schulz_inverse

        rng = np.random.RandomState(2)
        for n, block in ((60, 24), (768, 96), (90, 96)):
            J = rng.randn(2 * n, n).astype(np.float32)
            M = J.T @ J / n + 0.1 * np.eye(n, dtype=np.float32)
            X = np.asarray(
                newton_schulz_inverse(jnp.asarray(M), block=block, iters=14)
            )
            err = np.abs(X @ M - np.eye(n)).max()
            assert err < 5e-3, (n, err)


class TestNewtonSchulzGN:
    def test_ns_linear_solver_matches_cholesky(self):
        problem, target, _ = build_problem()
        res_chol = solve_dense(problem, GNConfig(iters=6))
        res_ns = solve_dense(
            problem, GNConfig(iters=6, linear_solver="ns", ns_block=48)
        )
        np.testing.assert_allclose(
            np.asarray(res_ns.translations),
            np.asarray(res_chol.translations),
            atol=5e-4,
        )
        err = jnp.linalg.norm(res_ns.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3

    def test_ns_with_motion_term_and_frozen(self):
        # exercise the stacked motion rows + frozen-node masking together
        problem, target, _ = build_problem()
        n = problem.nodes.shape[0]
        mask = np.ones(n, bool)
        mask[: n // 4] = False
        problem = problem._replace(
            motion_targets=problem.nodes + 0.01,
            motion_confidence=jnp.ones(n) * 0.5,
            solve_node_mask=jnp.asarray(mask),
        )
        cfg = GNConfig(iters=6, w_motion=0.5, linear_solver="ns")
        res = solve_dense(problem, cfg)
        res_c = solve_dense(problem, cfg._replace(linear_solver="cholesky"))
        np.testing.assert_allclose(
            np.asarray(res.translations),
            np.asarray(res_c.translations),
            atol=5e-4,
        )
        # frozen nodes stay at their initial (identity) transform
        assert np.abs(np.asarray(res.translations)[~mask]).max() < 1e-7


class TestBlockAssembly:
    def test_blocks_match_dense_j(self):
        """The two assembly backends build the identical normal system."""
        from occlusionfusion_tpu.solvers.gauss_newton_dense import (
            _assemble,
            _assemble_blocks,
        )
        import jax

        problem, _, _ = build_problem(n_pts=300, n_nodes=30)
        n = problem.nodes.shape[0]
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        rng = np.random.RandomState(3)
        # perturb away from identity so cross terms are non-trivial
        from occlusionfusion_tpu.geometry.so3 import so3_exp

        R = so3_exp(jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.2))
        t = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.03)
        for wm in (0.0, 2.0):
            cfg = GNConfig(iters=1, w_point=1.3, w_arap=2.7, w_motion=wm)
            M1, b1, sq1 = _assemble(problem, cfg, R, t)
            M2, b2, sq2 = _assemble_blocks(problem, cfg, R, t)
            scale = float(jnp.max(jnp.abs(M1))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(M2), np.asarray(M1), atol=3e-5 * scale
            )
            np.testing.assert_allclose(
                np.asarray(b2), np.asarray(b1),
                atol=3e-5 * (float(jnp.max(jnp.abs(b1))) + 1e-12),
            )
            np.testing.assert_allclose(float(sq2), float(sq1), rtol=1e-5)

    def test_blocks_solver_converges(self):
        problem, target, target_nodes = build_problem(n_pts=300, n_nodes=30)
        cfg = GNConfig(iters=6, assembly="blocks", lm_damping=1e-5)
        res = solve_dense(problem, cfg)
        err = np.linalg.norm(
            np.asarray(res.warped_points) - np.asarray(target), axis=1
        )
        valid = np.asarray(problem.point_valid) > 0
        assert np.median(err[valid]) < 1e-3
