"""Geometry core tests: closed-form fixtures, reference-free.

Follows the reference's synthetic-fixture test style
(fusion_tests/deformation_test.py's cube / elbow scenes) without porting
any code: every assertion is against analytically known transforms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occlusionfusion_tpu.geometry import (
    so3_exp,
    so3_log,
    se3_exp,
    hat,
    quaternion_to_matrix,
    matrix_to_quaternion,
    kabsch,
    weighted_kabsch,
    Intrinsics,
    backproject_depth,
    project_points,
    ed_warp,
    ed_warp_normals,
    skinning_weights,
)
from occlusionfusion_tpu.geometry.camera import bilinear_sample


def rand_rotation(key):
    w = jax.random.normal(key, (3,))
    return so3_exp(w)


class TestSO3:
    def test_exp_identity(self):
        R = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)

    def test_exp_known_axis(self):
        # 90 deg about z
        R = so3_exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
        expected = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        # |w| must stay below pi for log(exp(w)) == w
        direction = jax.random.normal(k1, (64, 3))
        direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        mag = jax.random.uniform(k2, (64, 1), minval=0.0, maxval=3.0)
        w = direction * mag
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-3)

    def test_exp_orthonormal(self):
        key = jax.random.PRNGKey(1)
        w = jax.random.normal(key, (32, 3)) * 2.0
        R = so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle_grad_finite(self):
        g = jax.grad(lambda w: jnp.sum(so3_exp(w)))(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))

    def test_quaternion_roundtrip(self):
        key = jax.random.PRNGKey(2)
        R = so3_exp(jax.random.normal(key, (64, 3)) * 2.0)
        q = matrix_to_quaternion(R)
        R2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_se3_exp_pure_translation(self):
        R, t = se3_exp(jnp.array([0.0, 0, 0, 1.0, 2.0, 3.0]))
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, jnp.array([1.0, 2.0, 3.0]), atol=1e-6)

    def test_hat_antisymmetric(self):
        W = hat(jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(W, -W.T, atol=1e-7)


class TestKabsch:
    def test_recovers_random_rigid(self):
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        src = jax.random.normal(k1, (100, 3))
        R_gt = rand_rotation(k2)
        t_gt = jax.random.normal(k3, (3,))
        dst = src @ R_gt.T + t_gt
        R, t = kabsch(src, dst)
        np.testing.assert_allclose(R, R_gt, atol=1e-5)
        np.testing.assert_allclose(t, t_gt, atol=1e-5)

    def test_weighted_ignores_zero_weight_outliers(self):
        key = jax.random.PRNGKey(4)
        k1, k2 = jax.random.split(key)
        src = jax.random.normal(k1, (50, 3))
        R_gt = rand_rotation(k2)
        t_gt = jnp.array([0.1, -0.2, 0.3])
        dst = src @ R_gt.T + t_gt
        # corrupt half the points, then zero their weights (padding pattern)
        dst = dst.at[25:].add(100.0)
        w = jnp.concatenate([jnp.ones(25), jnp.zeros(25)])
        R, t = weighted_kabsch(src, dst, w)
        np.testing.assert_allclose(R, R_gt, atol=1e-5)
        np.testing.assert_allclose(t, t_gt, atol=1e-5)

    def test_reflection_guard(self):
        # coplanar points that could produce det=-1 without the guard
        src = jnp.array([[1.0, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]])
        dst = src.at[:, 0].multiply(-1.0)  # mirror
        R, _ = kabsch(src, dst)
        assert jnp.linalg.det(R) > 0.99


class TestCamera:
    def test_backproject_project_roundtrip(self):
        intr = Intrinsics(
            jnp.float32(525.0), jnp.float32(525.0), jnp.float32(319.5), jnp.float32(239.5)
        )
        depth = jnp.full((16, 16), 1.5)
        pts = backproject_depth(depth, intr)
        uv, valid = project_points(pts.reshape(-1, 3), intr)
        assert bool(jnp.all(valid))
        v, u = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0), indexing="ij")
        np.testing.assert_allclose(uv[:, 0], u.reshape(-1), atol=1e-4)
        np.testing.assert_allclose(uv[:, 1], v.reshape(-1), atol=1e-4)

    def test_invalid_depth_zeroed(self):
        intr = Intrinsics(
            jnp.float32(500.0), jnp.float32(500.0), jnp.float32(8.0), jnp.float32(8.0)
        )
        depth = jnp.zeros((4, 4)).at[1, 1].set(2.0)
        pts = backproject_depth(depth, intr)
        assert float(jnp.sum(jnp.abs(pts[0, 0]))) == 0.0
        assert float(pts[1, 1, 2]) == 2.0

    def test_behind_camera_invalid(self):
        intr = Intrinsics(
            jnp.float32(500.0), jnp.float32(500.0), jnp.float32(8.0), jnp.float32(8.0)
        )
        _, valid = project_points(jnp.array([[0.0, 0.0, -1.0]]), intr)
        assert not bool(valid[0])

    def test_bilinear_sample_exact_at_grid(self):
        img = jnp.arange(12.0).reshape(3, 4, 1)
        uv = jnp.array([[2.0, 1.0]])  # u=2, v=1 -> img[1,2]
        out = bilinear_sample(img, uv)
        np.testing.assert_allclose(out[0, 0], img[1, 2, 0])

    def test_bilinear_sample_midpoint(self):
        img = jnp.array([[0.0, 2.0], [4.0, 6.0]])[..., None]
        out = bilinear_sample(img, jnp.array([[0.5, 0.5]]))
        np.testing.assert_allclose(out[0, 0], 3.0)


class TestEDWarp:
    """Cube-with-one-node and elbow fixtures, closed-form expectations
    (same scenarios as the reference's deformation_test.py, re-derived)."""

    def test_single_node_rigid(self):
        # one node at origin: warp must equal the node's rigid transform
        pts = jnp.array(
            [[x, y, z] for x in (-1.0, 0, 1) for y in (-1.0, 0, 1) for z in (-1.0, 0, 1)]
        )
        g = jnp.zeros((1, 3))
        R = so3_exp(jnp.array([[0.3, -0.2, 0.5]]))
        t = jnp.array([[0.1, 0.2, -0.3]])
        anchors = jnp.zeros((27, 4), jnp.int32)
        w = jnp.zeros((27, 4)).at[:, 0].set(1.0)
        warped = ed_warp(pts, g, R, t, anchors, w)
        expected = pts @ R[0].T + t[0]
        np.testing.assert_allclose(warped, expected, atol=1e-5)

    def test_identity_transforms_noop(self):
        key = jax.random.PRNGKey(5)
        pts = jax.random.normal(key, (40, 3))
        g = jax.random.normal(jax.random.PRNGKey(6), (8, 3))
        R = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        t = jnp.zeros((8, 3))
        anchors, w, reach = skinning_weights(pts, g, None, node_coverage=2.0)
        warped = ed_warp(pts, g, R, t, anchors, w)
        np.testing.assert_allclose(warped[reach], pts[reach], atol=1e-5)

    def test_pure_translation_all_nodes(self):
        key = jax.random.PRNGKey(7)
        pts = jax.random.normal(key, (40, 3))
        g = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
        R = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        t = jnp.broadcast_to(jnp.array([0.5, -1.0, 2.0]), (8, 3))
        anchors, w, reach = skinning_weights(pts, g, None, node_coverage=2.0)
        warped = ed_warp(pts, g, R, t, anchors, w)
        np.testing.assert_allclose(
            warped[reach], pts[reach] + jnp.array([0.5, -1.0, 2.0]), atol=1e-5
        )

    def test_normals_rotate(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        R = so3_exp(jnp.array([[jnp.pi / 2, 0.0, 0.0]]))  # 90deg about x: z->-y... check
        anchors = jnp.zeros((1, 4), jnp.int32)
        w = jnp.zeros((1, 4)).at[:, 0].set(1.0)
        out = ed_warp_normals(n, R, anchors, w)
        np.testing.assert_allclose(out, (R[0] @ n[0])[None], atol=1e-6)

    def test_elbow_blend_interpolates(self):
        # two nodes: left identity, right rotates; midpoint blends both
        g = jnp.array([[-1.0, 0, 0], [1.0, 0, 0]])
        R = jnp.stack([jnp.eye(3), so3_exp(jnp.array([0.0, 0.0, 0.4]))])
        t = jnp.zeros((2, 3))
        # offset perpendicular to the z rotation axis so rotation moves points
        pts = jnp.array([[-1.0, 0.2, 0.0], [1.0, 0.2, 0.0], [0.0, 0.2, 0.0]])
        anchors, w, _ = skinning_weights(pts, g, None, node_coverage=0.5, k=2)
        warped = ed_warp(pts, g, R, t, anchors, w)
        # endpoints follow their dominant node closely; midpoint in between
        rot_end = R[1] @ (pts[1] - g[1]) + g[1]
        assert jnp.linalg.norm(warped[0] - pts[0]) < 0.05
        assert jnp.linalg.norm(warped[1] - rot_end) < 0.05
        # midpoint blends the two node transforms with its actual weights
        w_mid = np.asarray(w[2])
        a_mid = np.asarray(anchors[2])
        contrib = [
            np.asarray(R[a] @ (pts[2] - g[a]) + g[a] + t[a]) for a in a_mid
        ]
        expected = w_mid[0] * contrib[0] + w_mid[1] * contrib[1]
        np.testing.assert_allclose(warped[2], expected, atol=1e-5)


class TestSkinning:
    def test_weights_normalized_and_cutoff(self):
        pts = jnp.array([[0.0, 0, 0], [100.0, 0, 0]])
        g = jnp.array([[0.1, 0, 0], [0.0, 0.1, 0], [0.2, 0, 0], [0, 0, 0.15]])
        anchors, w, reach = skinning_weights(pts, g, None, node_coverage=0.05)
        np.testing.assert_allclose(jnp.sum(w[0]), 1.0, atol=1e-6)
        assert bool(reach[0])
        assert not bool(reach[1])  # farther than 4 sigma from every node
        np.testing.assert_allclose(jnp.sum(w[1]), 0.0, atol=1e-7)

    def test_invalid_nodes_excluded(self):
        pts = jnp.zeros((1, 3))
        g = jnp.array([[0.01, 0, 0], [0.0, 0.0, 0.0]])  # second is "padding"
        valid = jnp.array([True, False])
        anchors, w, _ = skinning_weights(pts, g, valid, node_coverage=0.05, k=2)
        # all weight must be on node 0
        mass_on_invalid = jnp.sum(jnp.where(anchors == 1, w, 0.0))
        np.testing.assert_allclose(mass_on_invalid, 0.0, atol=1e-7)
