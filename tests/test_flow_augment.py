"""Rotation-composition flow augmentation
(``csrc/cpu/image_proc.cpp:39-349`` compute_augmented_flow_from_rotation):
the N3 parity piece that makes flow training data augmentable."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.ops.image_warp import (
    augmented_flow_from_rotation,
    compose_flows,
    rotate_image,
    rotation_flow,
    warp_image_with_flow,
)

H = W = 48


class TestRotationFlow:
    def test_zero_angle_is_zero_flow(self):
        f = rotation_flow(H, W, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-5)

    def test_rotate_image_matches_numpy_rotation(self):
        rng = np.random.RandomState(0)
        im = rng.rand(H, W, 1).astype(np.float32)
        a = np.float32(np.pi / 2)
        out = np.asarray(rotate_image(jnp.asarray(im), jnp.float32(a)))
        # 90-degree rotation of a square image = transpose+flip family;
        # check a handful of interior pixels against direct resampling
        cx = cy = (W - 1) / 2.0
        for (y, x) in [(10, 20), (24, 24), (30, 15)]:
            xs = np.cos(-a) * (x - cx) - np.sin(-a) * (y - cy) + cx
            ys = np.sin(-a) * (x - cx) + np.cos(-a) * (y - cy) + cy
            np.testing.assert_allclose(
                out[y, x, 0],
                im[int(round(ys)), int(round(xs)), 0],
                atol=1e-4,
            )


class TestComposeFlows:
    def test_identity_composition_preserves_gt(self):
        rng = np.random.RandomState(1)
        gt = rng.randn(H, W, 2).astype(np.float32) * 0.5
        valid = np.ones((H, W), bool)
        zero = jnp.zeros((H, W, 2))
        out, v = augmented_flow_from_rotation(
            zero, jnp.asarray(gt), jnp.asarray(valid), zero
        )
        # interior pixels: integer landing points sample GT exactly
        np.testing.assert_allclose(
            np.asarray(out)[2:-2, 2:-2], gt[2:-2, 2:-2], atol=1e-4
        )
        assert np.asarray(v)[2:-2, 2:-2].all()

    def test_pure_rotations_compose_to_net_rotation(self):
        a_s, a_t = jnp.float32(0.2), jnp.float32(-0.15)
        f1 = rotation_flow(H, W, a_s)
        zero = jnp.zeros((H, W, 2))
        f3 = rotation_flow(H, W, -a_t)
        out, v = augmented_flow_from_rotation(
            f1, zero, jnp.ones((H, W), bool), f3
        )
        expect = rotation_flow(H, W, -(a_t - a_s))
        # boundary pixels legitimately fall back to the nearest valid
        # corner (reference semantics) — compare the bilinear interior
        vv = np.array(np.asarray(v))
        vv[:8] = vv[-8:] = False
        vv[:, :8] = vv[:, -8:] = False
        np.testing.assert_allclose(
            np.asarray(out)[vv], np.asarray(expect)[vv], atol=1e-3
        )

    def test_invalid_region_uses_nearest_valid_corner(self):
        gt = jnp.zeros((H, W, 2))
        valid = np.ones((H, W), bool)
        valid[:, : W // 2] = False  # left half invalid
        # half-pixel shift right makes every sample straddle two columns
        shift = jnp.full((H, W, 2), 0.5).at[..., 1].set(0.0)
        out, v = compose_flows(shift, gt, jnp.asarray(valid))
        v = np.asarray(v)
        # landing in fully-invalid region -> invalid; straddle at the
        # boundary column -> still valid via the nearest valid corner
        assert not v[:, : W // 2 - 2].any()
        assert v[:, W // 2 :].all()

    def test_appearance_consistency_through_augmentation(self):
        """Augmented flow must register the augmented image pair: warp
        im2_aug by the augmented flow and match im1_aug where valid."""
        rng = np.random.RandomState(2)
        # smooth texture (bilinear-resample friendly)
        base = rng.randn(6, 6, 3).astype(np.float32)
        im1 = np.asarray(
            jnp.asarray(base).repeat(8, 0).repeat(8, 1)
        )[:H, :W]
        from scipy.ndimage import gaussian_filter

        im1 = gaussian_filter(im1, (2, 2, 0)).astype(np.float32)
        flow = np.zeros((H, W, 2), np.float32)
        flow[..., 0] = 1.5  # constant shift
        im2 = np.asarray(
            warp_image_with_flow(jnp.asarray(im1), -jnp.asarray(flow))
        )
        # im2(x) = im1(x - flow): check forward consistency
        a_s, a_t = jnp.float32(0.12), jnp.float32(-0.08)
        im1a = np.asarray(rotate_image(jnp.asarray(im1), a_s))
        im2a = np.asarray(rotate_image(jnp.asarray(im2), a_t))
        aug, v = augmented_flow_from_rotation(
            rotation_flow(H, W, a_s),
            jnp.asarray(flow),
            jnp.ones((H, W), bool),
            rotation_flow(H, W, -a_t),
        )
        warped = np.asarray(
            warp_image_with_flow(jnp.asarray(im2a), aug)
        )
        m = np.array(np.asarray(v))
        m[:8] = m[-8:] = False
        m[:, :8] = m[:, -8:] = False
        err = np.abs(warped - im1a)[m]
        assert float(err.mean()) < 0.05, float(err.mean())
