"""The 2D-pixel + depth data term (reference ``model/model.py:1306-1378``)
and continuous correspondence weighting.

The reference's GN solver stacks x-pixel/y-pixel rows (weight
lambda_data_flow) and a camera-depth row (lambda_data_depth) per match
instead of an isotropic 3D point residual, and multiplies both the
jacobian and the residual by the MaskNet correspondence weight
(``weights_k = source_weights * correspondence_weights``,
``model/model.py:1338``). These tests pin:

  * dense analytic assembly == matrix-free autodiff under 2d_depth
    (the jacobian derivation cross-check),
  * the anisotropic term beats point3d under depth-dominant sensor
    noise with maximum-likelihood per-row weights,
  * continuous point_valid weights down-weight corrupted matches
    instead of gating them.
"""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.geometry import so3_exp, skinning_weights
from occlusionfusion_tpu.ops.knn import knn_lax
from occlusionfusion_tpu.solvers.gauss_newton import (
    GNConfig,
    GNProblem,
    solve,
)
from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

FX, FY, CX, CY = 200.0, 200.0, 64.0, 64.0
INTR = jnp.asarray([FX, FY, CX, CY], jnp.float32)


def build_problem(n_pts=512, n_nodes=24, seed=0, z_offset=1.0,
                  noise_px=0.0, noise_z=0.0):
    """Sphere in front of the camera (z ~ z_offset +- 0.35) under a
    ground-truth rigid motion, with optional SENSOR-space target noise:
    pixel jitter (flow error, sigma noise_px) and depth jitter
    (sigma noise_z). Backprojection couples them the way a real RGB-D
    target does — lateral 3D coordinates inherit depth noise along the
    viewing ray, which is precisely the structure the anisotropic
    2d_depth term exploits and the isotropic 3D term cannot."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n_pts, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.35).astype(np.float32)
    pts[:, 2] += z_offset
    nodes = pts[rng.choice(n_pts, n_nodes, replace=False)]
    coverage = 0.3

    anchors, weights, valid = skinning_weights(
        jnp.asarray(pts), jnp.asarray(nodes), None, coverage, k=4
    )
    d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=7)
    edges = idx[:, 1:]
    w = jnp.exp(-d2[:, 1:] / (2 * coverage**2))
    w = w / jnp.sum(w, axis=1, keepdims=True)

    R_gt = so3_exp(jnp.asarray([0.08, -0.05, 0.1]))
    t_gt = jnp.asarray([0.02, -0.01, 0.03])
    pts_j = jnp.asarray(pts)
    nodes_j = jnp.asarray(nodes)
    center = jnp.asarray([0.0, 0.0, z_offset])
    target = (pts_j - center) @ R_gt.T + center + t_gt
    target_nodes = (nodes_j - center) @ R_gt.T + center + t_gt

    if noise_px or noise_z:
        t_np = np.asarray(target)
        u = FX * t_np[:, 0] / t_np[:, 2] + rng.randn(n_pts) * noise_px
        v = FY * t_np[:, 1] / t_np[:, 2] + rng.randn(n_pts) * noise_px
        z = t_np[:, 2] + rng.randn(n_pts) * noise_z
        target = jnp.asarray(
            np.stack([u / FX * z, v / FY * z, z], axis=-1).astype(
                np.float32
            )
        )

    problem = GNProblem(
        source_points=pts_j,
        point_anchors=anchors,
        point_weights=weights,
        target_points=target,
        point_valid=valid.astype(jnp.float32),
        nodes=nodes_j,
        node_valid=jnp.ones(n_nodes, bool),
        edges=edges,
        edge_weights=w,
        motion_targets=jnp.zeros((n_nodes, 3)),
        motion_confidence=jnp.zeros(n_nodes),
        solve_node_mask=jnp.ones(n_nodes, bool),
        intrinsics=INTR,
    )
    return problem, target, target_nodes


def node_error(problem, res, target_nodes):
    return float(
        jnp.mean(
            jnp.linalg.norm(
                problem.nodes + res.translations - target_nodes, axis=1
            )
        )
    )


class TestTwoDDepthTerm:
    def test_recovers_rigid_motion(self):
        problem, target, target_nodes = build_problem()
        cfg = GNConfig(
            iters=8, data_term="2d_depth", w_flow=1.0, w_depth=1.0,
            w_arap=0.5,
        )
        res = solve_dense(problem, cfg)
        assert bool(res.valid)
        assert node_error(problem, res, target_nodes) < 2e-3

    def test_dense_matches_matrix_free(self):
        """Analytic projection-jacobian assembly vs autodiff through the
        same residual: one GN iteration must produce the same step."""
        problem, _, _ = build_problem(n_pts=256, n_nodes=16)
        cfg_d = GNConfig(
            iters=3, data_term="2d_depth", w_flow=0.5, w_depth=2.0,
            w_arap=1.0, assembly="blocks",
        )
        cfg_mf = cfg_d._replace(cg_iters=120)
        res_d = solve_dense(problem, cfg_d)
        res_mf = solve(problem, cfg_mf)
        np.testing.assert_allclose(
            np.asarray(res_d.translations),
            np.asarray(res_mf.translations),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_d.rotations),
            np.asarray(res_mf.rotations),
            atol=2e-4,
        )

    def test_dense_j_twin_matches_blocks(self):
        problem, _, _ = build_problem(n_pts=256, n_nodes=16)
        base = GNConfig(
            iters=3, data_term="2d_depth", w_flow=0.5, w_depth=2.0,
            w_arap=1.0,
        )
        res_b = solve_dense(problem, base._replace(assembly="blocks"))
        res_j = solve_dense(problem, base._replace(assembly="dense_j"))
        np.testing.assert_allclose(
            np.asarray(res_b.translations),
            np.asarray(res_j.translations),
            atol=1e-5,
        )

    def test_beats_point3d_under_depth_noise(self):
        """Depth-dominant sensor noise (sigma_z 25 mm, pixel 0.1 px):
        ML per-row weighting (w ~ 1/sigma^2 in each row's units) must
        recover node motion better than the isotropic 3D term."""
        noise_px, noise_z = 0.1, 0.025
        problem, _, target_nodes = build_problem(
            n_pts=2048, n_nodes=24, noise_px=noise_px, noise_z=noise_z
        )
        iso = solve_dense(
            problem, GNConfig(iters=8, w_arap=0.5)
        )
        cfg = GNConfig(
            iters=8, data_term="2d_depth", w_arap=0.5,
            w_flow=1.0 / noise_px**2, w_depth=1.0 / noise_z**2,
            # scale the data term down so ARAP keeps its regularizing
            # role against the ~1e4x larger row weights
            w_point=1e-4,
        )
        aniso = solve_dense(problem, cfg)
        e_iso = node_error(problem, iso, target_nodes)
        e_aniso = node_error(problem, aniso, target_nodes)
        assert e_aniso < 0.6 * e_iso, (e_aniso, e_iso)

    def test_continuous_weights_downweight_corrupted(self):
        """Half the targets get a 5 cm constant bias. Continuous
        point_valid weights (0.05 on the biased half) must land near the
        clean-only solve, far better than weighting everything 1.0 —
        the MaskNet-as-weights (not gate) semantic."""
        problem, _, target_nodes = build_problem(n_pts=1024, n_nodes=24)
        n = problem.source_points.shape[0]
        bias = np.zeros((n, 3), np.float32)
        bias[: n // 2] = np.asarray([0.05, -0.05, 0.05], np.float32)
        corrupted = problem._replace(
            target_points=problem.target_points + jnp.asarray(bias)
        )
        cfg = GNConfig(iters=8, w_arap=0.5)

        flat = solve_dense(corrupted, cfg)
        weights = np.asarray(corrupted.point_valid).copy()
        weights[: n // 2] *= 0.05
        weighted = solve_dense(
            corrupted._replace(point_valid=jnp.asarray(weights)), cfg
        )
        gated = np.asarray(corrupted.point_valid).copy()
        gated[: n // 2] = 0.0
        clean = solve_dense(
            corrupted._replace(point_valid=jnp.asarray(gated)), cfg
        )
        e_flat = node_error(corrupted, flat, target_nodes)
        e_weighted = node_error(corrupted, weighted, target_nodes)
        e_clean = node_error(corrupted, clean, target_nodes)
        assert e_weighted < 0.25 * e_flat, (e_weighted, e_flat)
        assert e_weighted < e_clean + 2e-3, (e_weighted, e_clean)
