"""Wiring test: the Lepard scene-flow source runs inside the fusion loop
(random-init weights — behavior, not accuracy)."""

import numpy as np
import jax

from test_fusion_e2e import make_sequence, small_config

from occlusionfusion_tpu.fusion.pipeline import DynamicFusion
from occlusionfusion_tpu.models import kpconv as K
from occlusionfusion_tpu.models.lepard import LepardConfig, init_lepard_params


def test_pipeline_with_lepard_source():
    seq, centers = make_sequence(n_frames=3)
    cfg = small_config()
    cfg.use_lepard = True
    cfg.lepard_max_target_points = 1024
    lep_cfg = LepardConfig(
        kpfcn=K.KPFCNConfig(
            pyramid=K.PyramidConfig(
                level_sizes=(512, 128, 64, 32), first_voxel=0.03
            )
        ),
        match_threshold=0.0,  # random init: accept best matches
    )
    params = init_lepard_params(jax.random.PRNGKey(0), lep_cfg)
    fusion = DynamicFusion(
        seq, cfg, lepard_params=params, lepard_config=lep_cfg
    )
    fusion.initialize(seq.load(0))
    info = fusion.register_frame(seq.load(1))
    assert info["n_correspondences"] > 0
    assert np.isfinite(info["final_loss"])


def test_feature_recovery_seed_runs():
    """Wiring test: a track-lost relocalization with the matcher loaded
    RELOC-ONLY (use_lepard False) computes the feature Kabsch seed and
    completes (random-init weights — plumbing, not accuracy)."""
    seq, _ = make_sequence(n_frames=3)
    cfg = small_config()
    cfg.use_lepard = False  # matcher only seeds recovery
    cfg.keyframe_interval = 1
    cfg.lepard_max_target_points = 1024
    cfg.relocalize_feat_min_points = 1
    cfg.relocalize_min_obs_px = 1
    cfg.relocalize_recovery = True  # wide-baseline recovery is opt-in
    lep_cfg = LepardConfig(
        kpfcn=K.KPFCNConfig(
            pyramid=K.PyramidConfig(
                level_sizes=(512, 128, 64, 32), first_voxel=0.03
            )
        ),
        match_threshold=0.0,
        coherence_tau=0.1,  # exercise the filter in the recovery path
    )
    params = init_lepard_params(jax.random.PRNGKey(0), lep_cfg)
    fusion = DynamicFusion(
        seq, cfg, lepard_params=params, lepard_config=lep_cfg
    )
    fusion.initialize(seq.load(0))
    fusion.register_frame(seq.load(1))
    assert fusion.keyframes, "fixture must produce a keyframe"
    fusion.track_lost = True
    mag = fusion._relocalize(fusion.keyframes[-1])
    assert np.isfinite(mag)


def test_pipeline_with_flow_source():
    """Wiring test: the PWC-flow correspondence source runs inside the
    fusion loop (random-init weights)."""
    import jax

    from occlusionfusion_tpu.models.pwcnet import init_pwcnet_params

    seq, _ = make_sequence(n_frames=3)
    cfg = small_config()
    cfg.use_flow = True
    params = init_pwcnet_params(jax.random.PRNGKey(0))
    fusion = DynamicFusion(seq, cfg, flow_params=params)
    fusion.initialize(seq.load(0))
    info = fusion.register_frame(seq.load(1))
    assert info["n_correspondences"] > 0
    assert np.isfinite(info["final_loss"])


class TestLepardCheckpointRoundtrip:
    def test_save_load(self, tmp_path):
        import jax

        from occlusionfusion_tpu.models import kpconv as K
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
            save_lepard_checkpoint,
        )

        cfg = LepardConfig(
            kpfcn=K.KPFCNConfig(
                pyramid=K.PyramidConfig(
                    level_sizes=(256, 96, 48, 24), first_voxel=0.06
                )
            )
        )
        params = init_lepard_params(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "lep.npz")
        save_lepard_checkpoint(path, params, cfg)
        params2, cfg2 = load_lepard_checkpoint(path)
        assert cfg2 == cfg
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(params2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
