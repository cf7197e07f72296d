"""N-ICP solver tests — the reference arap_tests.py scenario re-derived:
sphere under a known rigid motion, a fraction of nodes hidden; the solver
must recover hidden node transforms through ARAP propagation (and through
the motion prior when landmarks are absent)."""

import numpy as np
import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry import so3_exp, skinning_weights
from occlusionfusion_tpu.ops.knn import knn_lax
from occlusionfusion_tpu.solvers.nicp import NICPConfig, NICPProblem, solve
from occlusionfusion_tpu.ops.rasterize import render_depth
from occlusionfusion_tpu.geometry.camera import Intrinsics


def sphere_points(n, r=0.5, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def build_problem(n_pts=400, n_nodes=40, hide_frac=0.5, seed=0):
    rng = np.random.RandomState(seed)
    pts = sphere_points(n_pts, seed=seed)
    nodes = pts[rng.choice(n_pts, n_nodes, replace=False)]
    coverage = 0.25

    anchors, weights, valid = skinning_weights(
        jnp.asarray(pts), jnp.asarray(nodes), None, coverage, k=4
    )
    # euclidean 6-NN graph edges
    d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=7)
    edges = idx[:, 1:]  # drop self
    w = jnp.exp(-d2[:, 1:] / (2 * coverage**2))
    w = w / jnp.sum(w, axis=1, keepdims=True)

    # ground-truth rigid motion
    R_gt = so3_exp(jnp.asarray([0.25, -0.15, 0.3]))
    t_gt = jnp.asarray([0.05, -0.02, 0.08])
    pts_j = jnp.asarray(pts)
    nodes_j = jnp.asarray(nodes)
    target = pts_j @ R_gt.T + t_gt
    target_nodes = nodes_j @ R_gt.T + t_gt

    visible = rng.rand(n_pts) >= hide_frac
    src_idx = jnp.arange(n_pts)
    problem = NICPProblem(
        source_points=pts_j,
        point_anchors=anchors,
        point_weights=weights,
        point_valid=valid,
        nodes=nodes_j,
        node_valid=jnp.ones(n_nodes, bool),
        edges=edges,
        edge_weights=w,
        target_points=target,
        landmark_src=src_idx,
        landmark_tgt=src_idx,
        landmark_valid=jnp.asarray(visible),
        motion_targets=jnp.zeros((n_nodes, 3)),
        motion_confidence=jnp.zeros(n_nodes),
    )
    return problem, target, target_nodes, (R_gt, t_gt)


class TestNICP:
    def test_rigid_recovery_with_hidden_points(self):
        problem, target, target_nodes, _ = build_problem(hide_frac=0.5)
        cfg = NICPConfig(iters=200, w_motion=0.0)
        res = solve(problem, cfg)
        err = jnp.linalg.norm(res.warped_points - target, axis=1)
        assert float(jnp.mean(err)) < 5e-3, float(jnp.mean(err))
        # node positions (g + t) land on their rigid images
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 1e-2

    def test_loss_decreases(self):
        problem, _, _, _ = build_problem(hide_frac=0.3)
        cfg = NICPConfig(iters=100, w_motion=0.0)
        res = solve(problem, cfg)
        hist = np.asarray(res.loss_history)
        assert hist[-1] < hist[0] * 0.05

    def test_motion_prior_alone_moves_nodes(self):
        problem, _, target_nodes, _ = build_problem(hide_frac=1.0)
        # no landmarks at all; motion prior carries the full signal
        problem = problem._replace(
            landmark_valid=jnp.zeros_like(problem.landmark_valid),
            motion_targets=target_nodes,
            motion_confidence=jnp.ones(problem.nodes.shape[0]),
        )
        cfg = NICPConfig(iters=300, w_motion=100.0)
        res = solve(problem, cfg)
        node_err = jnp.linalg.norm(
            problem.nodes + res.translations - target_nodes, axis=1
        )
        assert float(jnp.mean(node_err)) < 2e-2, float(jnp.mean(node_err))

    def test_warm_start_converges_faster(self):
        problem, target, _, (R_gt, t_gt) = build_problem(hide_frac=0.2)
        cfg = NICPConfig(iters=30, w_motion=0.0)
        cold = solve(problem, cfg)
        n = problem.nodes.shape[0]
        # warm start at ground truth (pivoted): t = R g + t - g
        t_init = (
            problem.nodes @ R_gt.T + t_gt - problem.nodes
        )
        warm = solve(
            problem,
            cfg,
            init_rotations=jnp.broadcast_to(R_gt, (n, 3, 3)),
            init_translations=t_init,
        )
        assert float(warm.final_loss) < float(cold.final_loss)


class TestRasterizer:
    def test_depth_map_basic(self):
        intr = Intrinsics(
            jnp.float32(50.0), jnp.float32(50.0), jnp.float32(16.0), jnp.float32(16.0)
        )
        pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])  # same pixel
        depth, mask = render_depth(pts, intr, (32, 32), splat_radius=0)
        assert bool(mask[16, 16])
        np.testing.assert_allclose(depth[16, 16], 1.0)  # nearest wins

    def test_splat_radius_fills(self):
        intr = Intrinsics(
            jnp.float32(50.0), jnp.float32(50.0), jnp.float32(16.0), jnp.float32(16.0)
        )
        pts = jnp.array([[0.0, 0.0, 1.0]])
        depth, mask = render_depth(pts, intr, (32, 32), splat_radius=1)
        assert int(mask.sum()) == 9

    def test_invalid_points_skipped(self):
        intr = Intrinsics(
            jnp.float32(50.0), jnp.float32(50.0), jnp.float32(16.0), jnp.float32(16.0)
        )
        pts = jnp.array([[0.0, 0.0, -1.0]])
        depth, mask = render_depth(pts, intr, (32, 32))
        assert not bool(mask.any())


class TestRenderedCosts:
    def test_depth_cost_pulls_forward(self):
        """With ONLY the projective-depth term (plus weak ARAP), points
        rendered at the wrong depth must move toward the observed depth."""
        problem, _, _, _ = build_problem(n_pts=300, n_nodes=30)
        intr = jnp.asarray([60.0, 60.0, 32.0, 32.0])
        # target: the sphere pushed +2 cm in z, rendered to a depth map
        from occlusionfusion_tpu.geometry.camera import Intrinsics
        from occlusionfusion_tpu.ops.rasterize import render_depth

        shifted = problem.source_points + jnp.asarray([0.0, 0.0, 0.02])
        cam_off = jnp.asarray([0.0, 0.0, 1.5])
        tgt_depth, _ = render_depth(
            shifted + cam_off, Intrinsics(*intr), (64, 64), splat_radius=1
        )
        problem = problem._replace(
            source_points=problem.source_points + cam_off,
            nodes=problem.nodes + cam_off,
            landmark_valid=jnp.zeros_like(problem.landmark_valid),
            render_intrinsics=intr,
            target_depth=tgt_depth,
        )
        # depth alone can degenerately escape the overlap region; pair it
        # with the silhouette term as the reference does. The hard-splat
        # objective is pixel-discretization-noisy, so a small lr and a
        # short horizon (the stable descent regime) are required.
        cfg = NICPConfig(
            iters=40, w_motion=0.0, w_arap=1.0, w_depth=5.0, w_silh=2.0,
            render_hw=(64, 64), lr=0.001,
        )
        res = solve(problem, cfg)
        hist = np.asarray(res.loss_history)
        assert hist[-1] < hist[0], (hist[0], hist[-1])
        dz = float(jnp.mean(res.translations[:, 2]))
        # net motion is toward the (farther) target surface: +2 cm shift,
        # ~1.3 cm recovered in 40 iterations
        assert dz > 0.008, dz
