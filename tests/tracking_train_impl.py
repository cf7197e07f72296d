"""End-to-end differentiable tracking training (the reference's
LinearSolverLU trick, ``model/model.py:59-86,865-1537``): gradients of
graph/warp losses must flow THROUGH the Gauss-Newton solve into the flow
net and MaskNet, and a few optimizer steps must reduce the combined
DeformLoss."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from occlusionfusion_tpu.models.deform_loss import DeformLossWeights
from occlusionfusion_tpu.models.pwcnet import (
    init_masknet_params,
    init_pwcnet_params,
)
from occlusionfusion_tpu.models.tracking_train import (
    epe3d,
    make_tracking_train_step,
    stack_samples,
    synthetic_tracking_sample,
    tracking_forward,
    tracking_loss,
)
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig

GN = GNConfig(iters=3, w_arap=1.0, w_point=1.0, lm_damping=1e-4)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    sample = synthetic_tracking_sample(
        rng, H=64, W=64, n_nodes=24, n_matches=256
    )
    key = jax.random.PRNGKey(0)
    pwc = init_pwcnet_params(key)
    mask = init_masknet_params(jax.random.PRNGKey(1))
    return sample, pwc, mask


class TestDifferentiableTracking:
    def test_forward_shapes(self, setup):
        sample, pwc, mask = setup
        flow, weights, point_valid, result = tracking_forward(
            pwc, mask, sample, GN
        )
        assert flow.shape == (64, 64, 2)
        assert weights.shape == (64, 64)
        assert point_valid.shape == (256,)
        assert bool(result.valid)

    def test_solver_losses_reach_flow_net(self, setup):
        """grad of (graph + warp) loss alone w.r.t. PWC params must be
        nonzero — the only path is through the GN solve."""
        sample, pwc, mask = setup
        w = DeformLossWeights(
            lambda_flow=0.0, lambda_graph=1.0, lambda_warp=1.0,
            lambda_mask=0.0,
        )

        def loss(p):
            total, _ = tracking_loss(p, None, sample, GN, w)
            return total

        g = jax.grad(loss)(pwc)
        norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
        assert max(norms) > 0.0
        assert all(np.isfinite(n) for n in norms)

    def test_solver_losses_reach_masknet(self, setup):
        """MaskNet weights enter the solve as continuous point_valid;
        the graph loss gradient must reach them WITHOUT the BCE term."""
        sample, pwc, mask = setup
        w = DeformLossWeights(
            lambda_flow=0.0, lambda_graph=1.0, lambda_warp=1.0,
            lambda_mask=0.0,
        )

        def loss(m):
            total, _ = tracking_loss(pwc, m, sample, GN, w)
            return total

        g = jax.grad(loss)(mask)
        norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
        assert max(norms) > 0.0

    def test_gradient_through_solve_matches_finite_difference(self, setup):
        """Differentiate the warped-point loss w.r.t. a scalar shift of
        the lifted targets and check against central differences — pins
        the reverse-mode path through the GN scan + Cholesky."""
        sample, pwc, mask = setup

        from occlusionfusion_tpu.solvers.gauss_newton import GNProblem
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

        base_targets = sample.gt_warped + 0.01

        def loss(shift):
            problem = GNProblem(
                source_points=sample.source_points,
                point_anchors=sample.anchors,
                point_weights=sample.skin_weights,
                target_points=base_targets + shift,
                point_valid=sample.match_valid.astype(jnp.float32),
                nodes=sample.nodes,
                node_valid=sample.node_valid,
                edges=sample.edges,
                edge_weights=sample.edge_weights,
                motion_targets=jnp.zeros_like(sample.nodes),
                motion_confidence=jnp.zeros(sample.nodes.shape[0]),
                solve_node_mask=sample.node_valid,
                intrinsics=sample.intrinsics,
            )
            res = solve_dense(problem, GNConfig(iters=2, assembly="blocks"))
            return jnp.sum((res.warped_points - sample.gt_warped) ** 2)

        g = float(jax.grad(loss)(jnp.float32(0.0)))
        eps = 1e-3
        fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (
            2 * eps
        )
        assert abs(g - fd) < 3e-2 * max(abs(fd), 1.0), (g, fd)

    def test_train_steps_reduce_loss(self, setup):
        sample, pwc, mask = setup
        rng = np.random.RandomState(1)
        batch = stack_samples(
            [
                synthetic_tracking_sample(
                    rng, H=64, W=64, n_nodes=24, n_matches=256
                )
                for _ in range(2)
            ]
        )
        params = {"pwc": pwc, "mask": mask}
        opt = optax.adam(2e-4)
        step = make_tracking_train_step(opt, GN)
        state = opt.init(params)
        losses = []
        for _ in range(6):
            params, state, loss, terms = step(params, state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_epe3d_metric(self, setup):
        sample, pwc, mask = setup
        e = float(epe3d(pwc, mask, sample, GN))
        assert np.isfinite(e) and e > 0
