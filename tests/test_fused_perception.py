"""Learned perception inside the fused one-dispatch path: PWC flow
(+MaskNet) and Lepard scene flow as in-scan stages of
fused_register_frame (the reference's per-frame loop runs flow + Lepard
+ motion GNN every frame, ``fusion.py:137-148``; round 1 only had them
in the object-style host loop). Also covers the device-side
deterministic target subsampling that replaces host np.random, and the
run_fused chunked driver (the CLI == bench code path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion.frame_loader import ArraySequence
from occlusionfusion_tpu.fusion.fused_step import (
    _deterministic_target_subsample,
    fused_register_chunk,
)
from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.graph.edgraph import GraphConfig
from occlusionfusion_tpu.models import kpconv as K
from occlusionfusion_tpu.models.lepard import LepardConfig, init_lepard_params
from occlusionfusion_tpu.models.pwcnet import (
    init_masknet_params,
    init_pwcnet_params,
)
from occlusionfusion_tpu.solvers.nicp import NICPConfig

H = W = 64
INTR = Intrinsics(
    np.float32(150.0), np.float32(150.0), np.float32(32.0), np.float32(32.0)
)


def sphere_depth(center, r=0.1):
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    dx = (u - INTR.cx) / INTR.fx
    dy = (v - INTR.cy) / INTR.fy
    d = np.stack([dx, dy, np.ones_like(dx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(center, np.float32)
    b = d @ c
    disc = b * b - (c @ c - r * r)
    hit = disc > 0
    t = b - np.sqrt(np.maximum(disc, 0))
    return np.where(hit & (t > 0), t * d[..., 2], 0.0).astype(np.float32)


def make_seq(n=4, step=(0.001, 0.0, 0.003)):
    centers = [
        np.asarray([0.0, 0.0, 0.6]) + np.asarray(step) * i for i in range(n)
    ]
    depths = [sphere_depth(c) for c in centers]
    rng = np.random.RandomState(0)
    tex = rng.rand(H, W, 3).astype(np.float32) * 255.0
    colors = [tex for _ in centers]
    return ArraySequence(colors, depths, INTR)


def tiny_lepard():
    cfg = LepardConfig(
        kpfcn=K.KPFCNConfig(
            pyramid=K.PyramidConfig(
                level_sizes=(128, 48, 24, 12), first_voxel=0.02
            )
        )
    )
    params = init_lepard_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def config(**kw):
    return FusionConfig(
        vol_dim=(32, 32, 32),
        voxel_size=0.01,
        node_coverage=0.04,
        max_nodes=128,
        max_points=1024,
        max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=0.04, min_neighbors=2),
        nicp=NICPConfig(iters=20, w_motion=0.0, lr=0.02),
        use_motion_model=False,
        solver="gn_dense",
        **kw,
    )


class TestDeterministicSubsample:
    def test_static_cap_valid_and_deterministic(self):
        depth = jnp.asarray(sphere_depth([0.0, 0.0, 0.6]))
        pts1, valid1 = _deterministic_target_subsample(depth, INTR, 256)
        pts2, valid2 = _deterministic_target_subsample(depth, INTR, 256)
        assert pts1.shape == (256, 3)
        np.testing.assert_array_equal(np.asarray(pts1), np.asarray(pts2))
        v = np.asarray(valid1)
        # every selected valid point has positive depth
        assert (np.asarray(pts1)[v][:, 2] > 0).all()
        n_pix = int((np.asarray(depth) > 0).sum())
        assert int(v.sum()) == min(n_pix, 256)

    def test_strided_method_stratified_and_deterministic(self):
        depth = jnp.asarray(sphere_depth([0.0, 0.0, 0.6]))
        pts1, v1 = _deterministic_target_subsample(
            depth, INTR, 256, method="strided"
        )
        pts2, v2 = _deterministic_target_subsample(
            depth, INTR, 256, method="strided"
        )
        np.testing.assert_array_equal(np.asarray(pts1), np.asarray(pts2))
        v = np.asarray(v1)
        # every selected valid point has positive depth
        assert (np.asarray(pts1)[v][:, 2] > 0).all()
        # block-stratified: a block with any valid pixel contributes one
        n = H * W
        m = -(-n // 256)
        key = np.asarray(depth).reshape(-1) > 0
        keyp = np.pad(key, (0, 256 * m - n))
        blocks_valid = keyp.reshape(256, m).any(1)
        np.testing.assert_array_equal(v, blocks_valid)

    def test_cap_exceeding_valid_pixels_masks_rest(self):
        depth = np.zeros((H, W), np.float32)
        depth[30:34, 30:34] = 0.5  # 16 valid pixels
        pts, valid = _deterministic_target_subsample(
            jnp.asarray(depth), INTR, 64
        )
        assert int(np.asarray(valid).sum()) == 16


class TestFusedPerception:
    @pytest.fixture(scope="class")
    def setup(self):
        seq = make_seq()
        lep_params, lep_cfg = tiny_lepard()
        fusion = DynamicFusion(
            seq,
            config(use_flow=True, use_lepard=True,
                   lepard_max_target_points=512),
            lepard_params=lep_params,
            lepard_config=lep_cfg,
            flow_params=init_pwcnet_params(jax.random.PRNGKey(1)),
            mask_params=init_masknet_params(jax.random.PRNGKey(2)),
        )
        fusion.initialize(seq.load(0))
        return seq, fusion

    def test_fused_step_with_flow_and_lepard(self, setup):
        seq, fusion = setup
        sc, state, tables = fusion.build_fused(None)
        assert sc.use_flow and sc.use_lepard
        assert state.prev_rgbxyz is not None
        state, info = fusion.register_frame_fused(
            sc, state, tables, seq.load(1), None
        )
        info = np.asarray(info)
        assert np.isfinite(info).all()
        assert info[1] > 0  # correspondences found
        # the flow source advanced to the current frame
        assert state.prev_rgbxyz.shape == (6, H, W)

    def test_chunked_scan_with_perception(self, setup):
        seq, fusion = setup
        sc, state, tables = fusion.build_fused(None)
        depths = jnp.stack(
            [jnp.asarray(seq.load(i).depth) for i in (1, 2, 3)]
        )
        colors = jnp.stack(
            [jnp.asarray(seq.load(i).color) for i in (1, 2, 3)]
        )
        state, infos = fused_register_chunk(
            sc, state, tables, None, depths, colors, fusion.intr,
            fusion.perception,
        )
        infos = np.asarray(infos)
        assert infos.shape == (3, 5)
        assert np.isfinite(infos).all()
        assert (infos[:, 4] == 1.0).all()  # all solves valid


class TestRunFusedDriver:
    def test_run_fused_matches_engine_and_handles_keyframes(self):
        seq = make_seq(n=5)
        fusion = DynamicFusion(seq, config(keyframe_interval=2))
        infos = fusion.run_fused(chunk=2)
        assert len(infos) == 4
        assert all(np.isfinite(i["final_loss"]) for i in infos)
        assert any("pose_correction" in i for i in infos)
        # the model tracked: node transforms moved off identity
        t = np.asarray(fusion.warp.translations)[: fusion.node_count]
        assert np.abs(t).max() > 1e-4

    def test_run_fused_growth_rebuild(self):
        seq = make_seq(n=5)
        fusion = DynamicFusion(seq, config(growth_interval=2))
        infos = fusion.run_fused(chunk=2)
        assert len(infos) == 4
        assert all(np.isfinite(i["final_loss"]) for i in infos)


class TestCameraPath:
    def test_truck_return_leaves_and_returns(self):
        from occlusionfusion_tpu.data.synthetic_shapes import camera_path

        Rs, ts = camera_path("truck_return", 9, amp=0.3)
        np.testing.assert_allclose(Rs, np.eye(3)[None].repeat(9, 0))
        # starts and ends home, peaks at the quarter point
        assert abs(ts[0, 0]) < 1e-6 and abs(ts[-1, 0]) < 1e-6
        assert np.abs(ts[:, 0]).max() > 0.29

    def test_orbit_return_rotates_about_pivot(self):
        from occlusionfusion_tpu.data.synthetic_shapes import camera_path

        piv = np.asarray([0.0, 0.0, 1.5], np.float32)
        Rs, ts = camera_path("orbit_return", 9, orbit_deg=20.0, pivot=piv)
        for R, t in zip(Rs, ts):
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            # the pivot is a fixed point of every pose
            np.testing.assert_allclose(R @ piv + t, piv, atol=1e-5)
        # mid-clip yaw is nonzero
        assert abs(np.arccos(np.clip(Rs[2][0, 0], -1, 1))) > 0.05

    def test_unknown_kind_raises(self):
        from occlusionfusion_tpu.data.synthetic_shapes import camera_path

        with pytest.raises(ValueError):
            camera_path("spiral", 4)


class TestLepardCadence:
    def test_lepard_every_runs_and_counts_frames(self):
        seq = make_seq(n=5)
        lp, lc = tiny_lepard()
        fusion = DynamicFusion(
            seq, config(use_lepard=True, lepard_every=2,
                        lepard_max_target_points=256),
            lepard_params=lp, lepard_config=lc,
        )
        infos = fusion.run_fused(chunk=2)
        assert len(infos) == 4
        assert all(np.isfinite(i["final_loss"]) for i in infos)
        assert all(i["solve_valid"] for i in infos)

    def test_gate_phase_is_absolute_and_survives_rebuild(self):
        """Both engines must run the matcher on identical ABSOLUTE
        frames: the fused counter is seeded with frame_id+1 at build
        time (not 0) and keeps the absolute phase across a mid-sequence
        growth/keyframe table rebuild (round-3 weak #7)."""
        seq = make_seq(n=6)
        lp, lc = tiny_lepard()
        K_every = 2
        fusion = DynamicFusion(
            seq, config(use_lepard=True, lepard_every=K_every,
                        lepard_max_target_points=256),
            lepard_params=lp, lepard_config=lc,
        )
        fusion.initialize(seq.load(0))
        sc, state, tables = fusion.build_fused(None)
        # seeded with the index of the next frame to register (1)
        assert int(state.frame_count) == 1
        fired = []
        for i in (1, 2, 3):
            fired.append(int(state.frame_count) % K_every == 0)
            state, _ = fusion.register_frame_fused(
                sc, state, tables, seq.load(i), None
            )
        # rebuild mid-sequence (what growth/keyframe handling does)
        fusion.adopt_fused_state(
            jax.tree.map(lambda x: jnp.array(x, copy=True), state)
        )
        fusion.frame_id = 3
        sc2, state2, _t2 = fusion.build_fused(None)
        # the counter carries the absolute phase across the rebuild
        assert int(state2.frame_count) == 4
        for i in (4, 5):
            fired.append(int(state2.frame_count) % K_every == 0)
            state2, _ = fusion.register_frame_fused(
                sc2, state2, _t2, seq.load(i), None
            )
        # identical to the stepwise path's absolute gate
        stepwise = [i % K_every == 0 for i in (1, 2, 3, 4, 5)]
        assert fired == stepwise


class TestPatchwiseMaxWeights:
    """Eval-time patchwise-max mask thresholding (model.py:987-993)."""

    def test_keeps_only_patch_maxima(self):
        import jax.numpy as jnp
        import numpy as np

        from occlusionfusion_tpu.fusion.flow_correspondence import (
            patchwise_max_weights,
        )

        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        out = np.asarray(patchwise_max_weights(w, 4))
        for py in range(4):
            for px in range(4):
                patch_in = np.asarray(w)[
                    4 * py : 4 * py + 4, 4 * px : 4 * px + 4
                ]
                patch_out = out[4 * py : 4 * py + 4, 4 * px : 4 * px + 4]
                # exactly the argmax survives with its original weight
                assert (patch_out > 0).sum() == 1
                assert patch_out.max() == patch_in.max()

    def test_non_divisible_shape_pads_safely(self):
        import jax.numpy as jnp
        import numpy as np

        from occlusionfusion_tpu.fusion.flow_correspondence import (
            patchwise_max_weights,
        )

        w = jnp.asarray(np.random.RandomState(1).rand(10, 13).astype(np.float32))
        out = np.asarray(patchwise_max_weights(w, 4))
        assert out.shape == (10, 13)
        # survivors keep their weight; everything else is zeroed
        nz = out > 0
        np.testing.assert_allclose(out[nz], np.asarray(w)[nz])
        assert 0 < nz.sum() <= 4 * 3 + 4  # at most one per (padded) patch

    def test_nms_field_sampled_nearest_not_attenuated(self):
        """The combined patch+threshold+sampling path: after NMS the
        weight field is sampled nearest-neighbor, so a point projecting
        within half a pixel of a survivor reads the survivor's full
        weight. Bilinear sampling of the same NMS'd field attenuates it
        (the bug ADVICE r2 flagged: the threshold became effectively
        stricter than model.py:989-994's pixel-grid selection)."""
        import jax.numpy as jnp

        from occlusionfusion_tpu.fusion.flow_correspondence import (
            patchwise_max_weights,
            sample_weight_field,
        )
        from occlusionfusion_tpu.geometry.camera import bilinear_sample

        rng = np.random.RandomState(2)
        w = jnp.asarray(rng.rand(16, 16).astype(np.float32))
        nms = patchwise_max_weights(w, 4)
        sv, su = np.unravel_index(
            np.argmax(np.asarray(nms)[:4, :4]), (4, 4)
        )
        # sample 0.4 px off the survivor (clipped inside the image)
        u = jnp.asarray([su + 0.4], jnp.float32)
        v = jnp.asarray([sv + 0.4], jnp.float32)
        near = float(sample_weight_field(nms, u, v, nms_active=True)[0])
        assert near == float(np.asarray(nms)[sv, su])
        # the old behavior (bilinear on the NMS'd field) attenuates —
        # its neighbors in the 2x2 footprint are zeroed by NMS
        bil = float(
            bilinear_sample(nms[..., None], jnp.stack([u, v], -1))[0, 0]
        )
        assert bil < 0.5 * near
        # continuous (non-NMS) fields still sample bilinearly
        cont = float(sample_weight_field(w, u, v, nms_active=False)[0])
        ref = float(
            bilinear_sample(w[..., None], jnp.stack([u, v], -1))[0, 0]
        )
        assert cont == ref

    def test_sparse_lift_matches_dense(self):
        """flow_lift="sparse" lifts flow at the model projections only;
        it must agree with the dense-field path to first order on a
        smooth scene (identical gating; targets within a few mm)."""
        seq = make_seq(n=3)
        rng = jax.random.PRNGKey(0)
        flow_params = init_pwcnet_params(rng)
        outs = {}
        for lift in ("dense", "sparse"):
            fusion = DynamicFusion(
                seq, config(use_flow=True, flow_lift=lift),
                flow_params=flow_params,
            )
            infos = fusion.run_fused(chunk=2)
            outs[lift] = (
                np.asarray(fusion.warp.translations),
                [i["n_correspondences"] for i in infos],
            )
        td, ts = outs["dense"][0], outs["sparse"][0]
        # same engine semantics: node translations agree to mm scale
        assert np.abs(td - ts).max() < 5e-3
        # correspondence counts in the same ballpark (gates agree on
        # the smooth interior; boundary pixels may differ)
        for nd, ns in zip(outs["dense"][1], outs["sparse"][1]):
            assert abs(nd - ns) <= max(0.1 * nd, 32)

    def test_bf16_and_lowres_mask_stay_close_to_f32(self):
        """flow_bf16 + mask_downscale are throughput knobs, not
        semantics changes: targets within ~2 mm and weights within ~0.1
        of the f32/full-res sparse lift on a smooth textured pair."""
        import jax.numpy as jnp

        from occlusionfusion_tpu.fusion.flow_correspondence import (
            flow_targets_at_points,
        )
        from occlusionfusion_tpu.fusion.fused_step import _rgbxyz_image

        rng_np = np.random.RandomState(3)
        seq = make_seq(n=2)
        f0, f1 = seq.load(0), seq.load(1)
        src = _rgbxyz_image(
            jnp.asarray(f0.depth), jnp.asarray(f0.color), INTR
        )
        tgt = _rgbxyz_image(
            jnp.asarray(f1.depth), jnp.asarray(f1.color), INTR
        )
        pwc = init_pwcnet_params(jax.random.PRNGKey(0))
        mask = init_masknet_params(jax.random.PRNGKey(1))
        uv = jnp.asarray(
            rng_np.uniform(8, 56, size=(256, 2)).astype(np.float32)
        )
        t32, v32, w32 = flow_targets_at_points(
            pwc, src, tgt, uv, mask_params=mask
        )
        t16, v16, w16 = flow_targets_at_points(
            pwc, src, tgt, uv, mask_params=mask, bf16=True,
            mask_downscale=2,
        )
        both = np.asarray(v32) & np.asarray(v16)
        assert both.sum() > 50
        dt = np.linalg.norm(
            np.asarray(t32)[both] - np.asarray(t16)[both], axis=-1
        )
        assert np.median(dt) < 2e-3  # 2 mm at 0.6 m scene depth
        dw = np.abs(np.asarray(w32)[both] - np.asarray(w16)[both])
        assert np.median(dw) < 0.1

    def test_fused_step_flow_patch_path_runs(self):
        """End-to-end: the fused engine with MaskNet + flow_mask_patch
        compiles and steps (covers the nms_active branch in-dispatch)."""
        seq = make_seq(n=3)
        rng = jax.random.PRNGKey(0)
        flow_params = init_pwcnet_params(rng)
        mask_params = init_masknet_params(jax.random.PRNGKey(1))
        fusion = DynamicFusion(
            seq,
            config(use_flow=True, flow_mask_patch=4,
                   flow_mask_threshold=0.0),
            flow_params=flow_params,
            mask_params=mask_params,
        )
        infos = fusion.run_fused(chunk=2)
        assert len(infos) == 2
        assert all(np.isfinite(i["final_loss"]) for i in infos)
