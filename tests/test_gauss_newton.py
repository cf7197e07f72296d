"""Gauss-Newton solver tests — the reference optimization_tests.py
scenario re-derived: sphere with ground-truth correspondences; GN must
recover node transforms in the 10-iteration budget, propagate to hidden
nodes via ARAP, and respect frozen-node masks (the DeformNet.arap path)."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.geometry import so3_exp, skinning_weights
from occlusionfusion_tpu.ops.knn import knn_lax
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem, solve


def build_problem(n_pts=300, n_nodes=30, seed=0, hide_frac=0.0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n_pts, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.5).astype(np.float32)
    nodes = pts[rng.choice(n_pts, n_nodes, replace=False)]
    coverage = 0.25

    anchors, weights, valid = skinning_weights(
        jnp.asarray(pts), jnp.asarray(nodes), None, coverage, k=4
    )
    d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=7)
    edges = idx[:, 1:]
    w = jnp.exp(-d2[:, 1:] / (2 * coverage**2))
    w = w / jnp.sum(w, axis=1, keepdims=True)

    R_gt = so3_exp(jnp.asarray([0.2, -0.1, 0.25]))
    t_gt = jnp.asarray([0.04, -0.02, 0.06])
    pts_j = jnp.asarray(pts)
    nodes_j = jnp.asarray(nodes)
    target = pts_j @ R_gt.T + t_gt
    target_nodes = nodes_j @ R_gt.T + t_gt

    pvalid = jnp.asarray(
        (rng.rand(n_pts) >= hide_frac).astype(np.float32)
    ) * valid.astype(jnp.float32)

    problem = GNProblem(
        source_points=pts_j,
        point_anchors=anchors,
        point_weights=weights,
        target_points=target,
        point_valid=pvalid,
        nodes=nodes_j,
        node_valid=jnp.ones(n_nodes, bool),
        edges=edges,
        edge_weights=w,
        motion_targets=jnp.zeros((n_nodes, 3)),
        motion_confidence=jnp.zeros(n_nodes),
        solve_node_mask=jnp.ones(n_nodes, bool),
    )
    return problem, target, target_nodes


class TestGaussNewton:
    def test_rigid_recovery(self):
        problem, target, target_nodes = build_problem()
        res = solve(problem, GNConfig(iters=10, cg_iters=40))
        assert bool(res.valid)
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 1e-3, float(jnp.mean(err))
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 5e-3

    def test_residual_decreases_fast(self):
        problem, _, _ = build_problem()
        res = solve(problem, GNConfig(iters=6, cg_iters=40))
        hist = np.asarray(res.residual_history)
        assert hist[-1] < hist[0] * 1e-3

    def test_hidden_points_recovered_via_arap(self):
        problem, target, target_nodes = build_problem(hide_frac=0.6)
        res = solve(problem, GNConfig(iters=10, cg_iters=60))
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 1e-2, float(jnp.mean(node_err))

    def test_frozen_nodes_stay(self):
        problem, _, _ = build_problem()
        freeze = np.ones(problem.nodes.shape[0], bool)
        freeze[:10] = False  # first 10 frozen
        problem = problem._replace(solve_node_mask=jnp.asarray(freeze))
        res = solve(problem, GNConfig(iters=5, cg_iters=30))
        np.testing.assert_allclose(
            np.asarray(res.translations[:10]), 0.0, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(res.rotations[:10]),
            np.broadcast_to(np.eye(3), (10, 3, 3)),
            atol=1e-6,
        )
        # free nodes did move
        assert float(jnp.abs(res.translations[10:]).max()) > 1e-3

    def test_motion_term_pulls_occluded_nodes(self):
        problem, _, target_nodes = build_problem(hide_frac=1.0)
        problem = problem._replace(
            motion_targets=target_nodes,
            motion_confidence=jnp.ones(problem.nodes.shape[0]),
        )
        res = solve(problem, GNConfig(iters=10, cg_iters=40, w_motion=5.0))
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 1e-2
