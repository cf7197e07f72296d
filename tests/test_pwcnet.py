"""PWC-Net / correlation / MaskNet tests (random init; no pretrained
weights exist in the reference fork)."""

import numpy as np
import jax
import jax.numpy as jnp

from occlusionfusion_tpu.ops.correlation import correlation_volume
from occlusionfusion_tpu.models.pwcnet import (
    bilinear_warp,
    init_masknet_params,
    init_pwcnet_params,
    masknet_forward,
    pwcnet_forward,
)


class TestCorrelation:
    def test_center_tap_is_self_correlation(self):
        rng = np.random.RandomState(0)
        f = jnp.asarray(rng.randn(8, 8, 4), jnp.float32)
        vol = correlation_volume(f, f, max_displacement=4)
        center = np.asarray(vol[..., 40])  # d = (0, 0)
        np.testing.assert_allclose(
            center, np.mean(np.asarray(f) ** 2, -1), atol=1e-5
        )

    def test_shift_detection(self):
        rng = np.random.RandomState(1)
        f1 = jnp.asarray(rng.randn(16, 16, 64), jnp.float32)
        f2 = jnp.roll(f1, shift=2, axis=1)  # f2(x) = f1(x - 2)
        vol = correlation_volume(f1, f2, max_displacement=4)
        # best displacement for interior pixels should be dx=+2, dy=0
        best = np.asarray(jnp.argmax(vol, axis=-1))
        expected = 4 * 9 + (4 + 2)  # row dy=0, col dx=+2
        interior = best[4:-4, 4:-4]
        assert (interior == expected).mean() > 0.9
        # and the true tap dominates on average regardless of channel count
        v = np.asarray(vol[4:-4, 4:-4])
        others = np.delete(v, expected, axis=-1)
        assert v[..., expected].mean() > others.mean() + 0.5

    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(2)
        f1 = rng.randn(6, 7, 3).astype(np.float32)
        f2 = rng.randn(6, 7, 3).astype(np.float32)
        vol = np.asarray(correlation_volume(jnp.asarray(f1), jnp.asarray(f2), 1))
        # oracle at pixel (2, 3), displacement (dy=1, dx=-1) -> index 1*3+0
        want = np.mean(f1[2, 3] * f2[3, 2])
        np.testing.assert_allclose(vol[2, 3, 5 + 3 - 2], want, atol=1e-6)


class TestWarp:
    def test_zero_flow_identity(self):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
        out = bilinear_warp(img, jnp.zeros((2, 8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_integer_shift(self):
        img = jnp.arange(16.0).reshape(1, 4, 4, 1)
        flow = jnp.ones((1, 4, 4, 2)).at[..., 1].set(0.0)  # u=+1
        out = bilinear_warp(img, flow)
        # out(x) = img(x + 1) for interior columns
        np.testing.assert_allclose(
            np.asarray(out[0, :, :3, 0]), np.asarray(img[0, :, 1:, 0])
        )

    def test_outside_zeroed(self):
        img = jnp.ones((1, 4, 4, 1))
        flow = jnp.full((1, 4, 4, 2), 10.0)
        out = bilinear_warp(img, flow)
        np.testing.assert_allclose(np.asarray(out), 0.0)


class TestPWCNet:
    def test_forward_shapes_and_finite(self):
        params = init_pwcnet_params(jax.random.PRNGKey(0))
        B, H, W = 1, 64, 64
        im1 = jnp.zeros((B, H, W, 3))
        im2 = jnp.zeros((B, H, W, 3))
        flow, feat = pwcnet_forward(params, im1, im2)
        assert flow.shape == (B, H // 4, W // 4, 2)
        assert feat.shape == (B, H // 4, W // 4, 565)
        assert bool(jnp.all(jnp.isfinite(flow)))

    def test_masknet_output_range(self):
        params = init_masknet_params(jax.random.PRNGKey(1))
        feat = jnp.zeros((1, 16, 16, 565))
        src = jnp.zeros((1, 64, 64, 6))
        tgt = jnp.zeros((1, 64, 64, 6))
        mask = masknet_forward(params, feat, src, tgt)
        assert mask.shape == (1, 64, 64, 1)
        m = np.asarray(mask)
        assert (m > 0).all() and (m < 1).all()
