"""Block-Jacobi PCG: same solution, far fewer CG iterations."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, solve
from test_gauss_newton import build_problem


class TestPreconditioner:
    def test_pcg_matches_cg(self):
        problem, target, _ = build_problem()
        plain = solve(problem, GNConfig(iters=6, cg_iters=80))
        pcg = solve(
            problem, GNConfig(iters=6, cg_iters=80, precondition=True)
        )
        np.testing.assert_allclose(
            np.asarray(pcg.translations), np.asarray(plain.translations),
            atol=3e-4,
        )

    def test_pcg_converges_with_few_iterations(self):
        problem, target, _ = build_problem()
        # 8 PCG iterations must do what ~40 plain CG iterations do
        res = solve(
            problem, GNConfig(iters=8, cg_iters=8, precondition=True)
        )
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 2e-3, float(jnp.mean(err))
        plain = solve(problem, GNConfig(iters=8, cg_iters=8))
        err_plain = jnp.linalg.norm(plain.warped_points - target, axis=1)
        assert float(jnp.mean(err)) <= float(jnp.mean(err_plain)) * 1.1
