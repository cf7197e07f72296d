"""Flow-stack training: multi-scale supervision plumbing and descent
(the reference ships no flow training loop at all; models/flow_train.py
is the recipe that replaces the absent ``train.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax


class TestMultiscale:
    def test_multiscale_shapes(self):
        from occlusionfusion_tpu.models.pwcnet import (
            init_pwcnet_params,
            pwcnet_forward_multiscale,
        )

        params = init_pwcnet_params(jax.random.PRNGKey(0))
        im = jnp.zeros((1, 64, 64, 3))
        flows, feat = pwcnet_forward_multiscale(params, im, im)
        for lvl in (2, 3, 4, 5, 6):
            s = 64 // 2**lvl
            assert flows[lvl].shape == (1, s, s, 2), (lvl, flows[lvl].shape)
        assert feat.shape[1:3] == (16, 16)

    def test_downsample_keeps_fullres_units(self):
        """A constant pixel flow must stay the same value at every level
        (decoder flows x 20 are full-res pixels at all levels)."""
        from occlusionfusion_tpu.models.flow_train import _downsample_flow

        flow = jnp.full((1, 32, 32, 2), 3.0)
        valid = jnp.ones((1, 32, 32), bool)
        for lvl in (2, 3, 4):
            out, ov = _downsample_flow(flow, valid, lvl)
            assert out.shape[1] == 32 // 2**lvl
            np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)
            assert bool(jnp.all(ov))

    def test_invalid_pixels_excluded(self):
        from occlusionfusion_tpu.models.flow_train import _downsample_flow

        flow = jnp.full((1, 8, 8, 2), 2.0)
        flow = flow.at[0, :4].set(100.0)  # garbage under invalid mask
        valid = jnp.ones((1, 8, 8), bool).at[0, :4].set(False)
        out, ov = _downsample_flow(flow, valid, 2)
        # top cell is fully invalid, bottom cell averages only valid 2.0
        assert not bool(ov[0, 0, 0]) and bool(ov[0, 1, 0])
        np.testing.assert_allclose(float(out[0, 1, 0, 0]), 2.0, atol=1e-5)


class TestFlowTraining:
    def test_loss_descends_on_fixed_pair(self):
        import sys, os

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "scripts")
        )
        from train_flow import make_batch

        from occlusionfusion_tpu.models.flow_train import (
            make_flow_train_step,
        )
        from occlusionfusion_tpu.models.pwcnet import init_pwcnet_params

        rng = np.random.RandomState(0)
        batch = make_batch(rng, 1, 64, 64, with_mask=False)
        params = {"pwc": init_pwcnet_params(jax.random.PRNGKey(0))}
        opt = optax.adam(3e-4)
        st = opt.init(params)
        step = make_flow_train_step(opt)
        first = None
        for _ in range(8):
            params, st, loss = step(params, st, batch)
            if first is None:
                first = float(loss)
        assert np.isfinite(float(loss))
        assert float(loss) < first, (first, float(loss))

    def test_mask_head_trains_too(self):
        import sys, os

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "scripts")
        )
        from train_flow import make_batch

        from occlusionfusion_tpu.models.flow_train import (
            make_flow_train_step,
        )
        from occlusionfusion_tpu.models.pwcnet import (
            init_masknet_params,
            init_pwcnet_params,
        )

        rng = np.random.RandomState(1)
        batch = make_batch(rng, 1, 64, 64, with_mask=True)
        params = {
            "pwc": init_pwcnet_params(jax.random.PRNGKey(0)),
            "mask": init_masknet_params(jax.random.PRNGKey(1)),
        }
        opt = optax.adam(3e-4)
        st = opt.init(params)
        step = make_flow_train_step(opt, with_mask=True)
        mask_before = jax.tree_util.tree_leaves(params["mask"])[0].copy()
        first = None
        for _ in range(4):
            params, st, loss = step(params, st, batch)
            if first is None:
                first = float(loss)
        assert np.isfinite(float(loss)) and float(loss) < first
        # mask params received gradient
        after = jax.tree_util.tree_leaves(params["mask"])[0]
        assert float(jnp.max(jnp.abs(after - mask_before))) > 0


class TestFlowCheckpointRoundtrip:
    def test_npz_roundtrip_reproduces_forward(self, tmp_path):
        """save_pytree/load_params turn lists into digit-key dicts; the
        flow stack must normalize them (run_fusion --flow_weights path)."""
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed
        from occlusionfusion_tpu.models.pwcnet import (
            init_masknet_params,
            init_pwcnet_params,
            masknet_forward,
            pwcnet_forward,
        )
        from occlusionfusion_tpu.utils.snapshot import load_params, save_pytree

        params = {
            "pwc": init_pwcnet_params(jax.random.PRNGKey(0)),
            "mask": init_masknet_params(jax.random.PRNGKey(1)),
        }
        path = str(tmp_path / "flow.npz")
        save_pytree(path, params)
        loaded = load_params(path)
        # loaded lists come back as digit-key dicts...
        assert isinstance(loaded["pwc"]["extractor"], dict)
        # ...and normalize_indexed restores lists / int keys
        norm = normalize_indexed(loaded)
        assert isinstance(norm["pwc"]["extractor"], list)
        assert 2 in norm["pwc"]["decoders"]

        rng = np.random.RandomState(0)
        im = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        f0, feat0 = pwcnet_forward(params["pwc"], im, im)
        f1, feat1 = pwcnet_forward(loaded["pwc"], im, im)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
        src6 = jnp.zeros((1, 64, 64, 6))
        m0 = masknet_forward(params["mask"], feat0, src6, src6)
        m1 = masknet_forward(loaded["mask"], feat1, src6, src6)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)


class TestMaskGatedFlowCorrespondences:
    def test_weights_returned_and_gated(self):
        from occlusionfusion_tpu.fusion.flow_correspondence import (
            flow_correspondences,
        )
        from occlusionfusion_tpu.models.pwcnet import (
            init_masknet_params,
            init_pwcnet_params,
        )

        pwc = init_pwcnet_params(jax.random.PRNGKey(0))
        H = W = 64
        rng = np.random.RandomState(0)
        rgb = rng.rand(3, H, W).astype(np.float32)
        depth = np.full((H, W), 1.0, np.float32)
        v, u = np.meshgrid(np.arange(H, dtype=np.float32),
                           np.arange(W, dtype=np.float32), indexing="ij")
        xyz = np.stack([(u - 32) / 100 * depth, (v - 32) / 100 * depth,
                        depth])
        src = jnp.asarray(np.concatenate([rgb, xyz]))
        # no mask params: weights == valid
        _, _, valid, w = flow_correspondences(pwc, src, src)
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(valid).astype(np.float32)
        )
        # with mask params: weights in (0,1), zero where invalid
        mask = init_masknet_params(jax.random.PRNGKey(1))
        _, _, valid2, w2 = flow_correspondences(pwc, src, src,
                                                mask_params=mask)
        w2 = np.asarray(w2)
        assert (w2[np.asarray(valid2)] > 0).all()
        assert (w2 <= 1).all()
        assert (w2[~np.asarray(valid2)] == 0).all()
