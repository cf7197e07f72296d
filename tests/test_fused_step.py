"""The fused one-dispatch step must match the step-by-step pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from test_fusion_e2e import make_sequence, small_config

from occlusionfusion_tpu.fusion.pipeline import DynamicFusion


class TestFusedStep:
    @pytest.fixture(scope="class")
    def setup(self):
        seq, centers = make_sequence(n_frames=4)
        cfg = small_config()
        stepwise = DynamicFusion(seq, cfg)
        stepwise.initialize(seq.load(0))
        fused = DynamicFusion(seq, cfg)
        fused.initialize(seq.load(0))
        return seq, stepwise, fused

    def test_fused_matches_stepwise(self, setup):
        seq, stepwise, fused = setup
        step_config, state, tables = fused.build_fused()
        for i in range(1, 4):
            frame = seq.load(i)
            stepwise.register_frame(frame)
            state, info = fused.register_frame_fused(
                step_config, state, tables, frame
            )
        np.testing.assert_allclose(
            np.asarray(state.translations),
            np.asarray(stepwise.warp.translations),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(state.rotations),
            np.asarray(stepwise.warp.rotations),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(state.tsdf.tsdf),
            np.asarray(stepwise.tsdf.tsdf),
            atol=1e-4,
        )

    def test_chunked_matches_per_frame(self, setup):
        import jax.numpy as jnp

        from occlusionfusion_tpu.fusion.fused_step import fused_register_chunk

        seq, _, fused = setup
        step_config, state_a, tables = fused.build_fused()
        infos_a = []
        for i in range(1, 4):
            state_a, info = fused.register_frame_fused(
                step_config, state_a, tables, seq.load(i)
            )
            infos_a.append(np.asarray(info))

        _, state_b, _ = fused.build_fused()
        depths = jnp.stack([jnp.asarray(seq.load(i).depth) for i in (1, 2, 3)])
        colors = jnp.stack([jnp.asarray(seq.load(i).color) for i in (1, 2, 3)])
        state_b, infos_b = fused_register_chunk(
            step_config, state_b, tables, None, depths, colors, fused.intr
        )
        np.testing.assert_allclose(
            np.stack(infos_a), np.asarray(infos_b), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(state_a.translations),
            np.asarray(state_b.translations),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(state_a.tsdf.tsdf),
            np.asarray(state_b.tsdf.tsdf),
            atol=1e-5,
        )

    def test_info_vector(self, setup):
        seq, _, fused = setup
        step_config, state, tables = fused.build_fused()
        state, info = fused.register_frame_fused(
            step_config, state, tables, seq.load(1)
        )
        info = np.asarray(info)
        assert info.shape == (5,)
        assert info[1] > 100  # correspondences found
        assert np.isfinite(info).all()
        assert info[4] == 1.0  # solve valid (model.py:1611-1615 parity)


class TestMotionAtNonDefaultCap:
    """Motion completion must work at any node cap, not just the
    demo-scale 512 bucket (the packed pyramid layout, the GNN shapes and
    the carried runner state all derive from level_sizes_for(cap))."""

    @pytest.fixture(scope="class")
    def motion_params(self):
        import jax

        from occlusionfusion_tpu.models.motion_complete import init_params

        return init_params(jax.random.PRNGKey(0))

    def test_stepwise_register_frame(self, motion_params):
        import dataclasses

        seq, _ = make_sequence(n_frames=3)
        cfg = dataclasses.replace(small_config(), use_motion_model=True)
        assert cfg.max_nodes != 512
        fusion = DynamicFusion(seq, cfg, motion_params=motion_params)
        fusion.initialize(seq.load(0))
        assert fusion.motion_runner.level_sizes[0] == cfg.max_nodes
        for i in (1, 2):
            info = fusion.register_frame(seq.load(i))
            assert np.isfinite(info["final_loss"])

    def test_fused_matches_stepwise_with_motion(self, motion_params):
        import dataclasses

        seq, _ = make_sequence(n_frames=3)
        cfg = dataclasses.replace(small_config(), use_motion_model=True)
        stepwise = DynamicFusion(seq, cfg, motion_params=motion_params)
        stepwise.initialize(seq.load(0))
        fused = DynamicFusion(seq, cfg, motion_params=motion_params)
        fused.initialize(seq.load(0))
        step_config, state, tables = fused.build_fused(motion_params)
        assert step_config.motion_levels[0] == cfg.max_nodes
        for i in (1, 2):
            frame = seq.load(i)
            stepwise.register_frame(frame)
            state, info = fused.register_frame_fused(
                step_config, state, tables, frame, motion_params=motion_params
            )
        np.testing.assert_allclose(
            np.asarray(state.translations),
            np.asarray(stepwise.warp.translations),
            atol=1e-4,
        )
