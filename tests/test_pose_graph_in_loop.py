"""Keyframe pose graph in the fusion loop: loop-closure measurement
(rigid projective ICP against stored keyframe depth) and warp-field
re-anchoring by the optimized correction."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from test_fusion_e2e import make_sequence, small_config

from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.fusion.loop_closure import rigid_depth_alignment
from occlusionfusion_tpu.fusion.pipeline import DynamicFusion


class TestRigidDepthAlignment:
    def test_recovers_translation(self):
        seq, _ = make_sequence(n_frames=1, step=(0.0, 0.0, 0.0))
        frame = seq.load(0)
        depth = jnp.asarray(frame.depth)
        # model points: the observed surface, then rigidly offset
        H, Wd = frame.depth.shape
        v, u = np.nonzero(frame.depth > 0)
        d = frame.depth[v, u]
        fx, fy = float(seq.intrinsics.fx), float(seq.intrinsics.fy)
        cx, cy = float(seq.intrinsics.cx), float(seq.intrinsics.cy)
        pts = np.stack(
            [(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1
        ).astype(np.float32)[::7]
        offset = np.asarray([0.003, -0.002, 0.009], np.float32)
        moved = jnp.asarray(pts + offset)
        align = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05,
        )
        assert float(align.inlier_fraction) > 0.8
        assert float(align.residual) < 2e-3
        # a sphere is rotation-symmetric about its center, so (R, t) are
        # only identifiable as a composition: the recovered transform must
        # map the moved sphere center back onto the true center
        rec_t = np.asarray(align.translation)
        rec_R = np.asarray(align.rotation)
        center = np.asarray([0.0, 0.0, 1.0], np.float32)
        mapped = rec_R @ (center + offset) + rec_t
        np.testing.assert_allclose(mapped, center, atol=2e-3)

    def test_wide_baseline_recovery(self):
        """A LOST pose (offset far outside the association basin, zero
        identity-pose inliers) recovers via the coarse centroid-init
        wide-band stage; without coarse_init the same solve finds
        nothing (the round-3 leave-and-revisit no-op, VERDICT item 6)."""
        seq, _ = make_sequence(n_frames=1, step=(0.0, 0.0, 0.0))
        frame = seq.load(0)
        depth = jnp.asarray(frame.depth)
        v, u = np.nonzero(frame.depth > 0)
        d = frame.depth[v, u]
        fx, fy = float(seq.intrinsics.fx), float(seq.intrinsics.fy)
        cx, cy = float(seq.intrinsics.cx), float(seq.intrinsics.cy)
        pts = np.stack(
            [(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1
        ).astype(np.float32)[::7]
        offset = np.asarray([0.15, -0.08, 0.12], np.float32)  # lost
        moved = jnp.asarray(pts + offset)
        blind = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=False,
        )
        # the old behavior: no overlap at identity, nothing recovered,
        # and the degenerate 0.0 initial residual that used to read as
        # "healthy"
        assert float(blind.initial_inlier_fraction) < 0.05
        assert float(blind.initial_residual) == 0.0
        assert float(blind.inlier_fraction) < 0.2
        align = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=True,
        )
        assert float(align.inlier_fraction) > 0.8
        rec_t = np.asarray(align.translation)
        rec_R = np.asarray(align.rotation)
        center = np.asarray([0.0, 0.0, 1.0], np.float32)
        mapped = rec_R @ (center + offset) + rec_t
        np.testing.assert_allclose(mapped, center, atol=3e-3)

    def test_feat_init_seeds_lost_recovery(self):
        """A feature pose (e.g. Kabsch over matcher flow) passed as
        feat_init replaces the centroid start for a LOST pose — here the
        exact inverse offset, which must recover at least as well as
        centroid init — and is IGNORED for a healthy pose (a garbage
        feature pose must not perturb a fine alignment)."""
        seq, _ = make_sequence(n_frames=1, step=(0.0, 0.0, 0.0))
        frame = seq.load(0)
        depth = jnp.asarray(frame.depth)
        v, u = np.nonzero(frame.depth > 0)
        d = frame.depth[v, u]
        fx, fy = float(seq.intrinsics.fx), float(seq.intrinsics.fy)
        cx, cy = float(seq.intrinsics.cx), float(seq.intrinsics.cy)
        pts = np.stack(
            [(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1
        ).astype(np.float32)[::7]
        offset = np.asarray([0.15, -0.08, 0.12], np.float32)  # lost
        moved = jnp.asarray(pts + offset)
        feat = (jnp.eye(3), jnp.asarray(-offset))
        align = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=True,
            feat_init=feat,
        )
        assert float(align.inlier_fraction) > 0.8
        center = np.asarray([0.0, 0.0, 1.0], np.float32)
        mapped = (
            np.asarray(align.rotation) @ (center + offset)
            + np.asarray(align.translation)
        )
        np.testing.assert_allclose(mapped, center, atol=3e-3)

        # healthy pose: garbage feature rotation must be ignored
        near = jnp.asarray(pts + np.asarray([0.003, 0.0, 0.006], np.float32))
        flip = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32))
        a_ref = rigid_depth_alignment(
            near, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=True,
        )
        a_feat = rigid_depth_alignment(
            near, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=True,
            feat_init=(flip, jnp.zeros(3)),
        )
        np.testing.assert_allclose(
            np.asarray(a_ref.translation), np.asarray(a_feat.translation),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(a_ref.rotation), np.asarray(a_feat.rotation),
            atol=1e-6,
        )

    def test_healthy_pose_unaffected_by_coarse_init(self):
        """coarse_init must be a no-op when the identity pose already
        overlaps (loop-closure measurements between nearby keyframes)."""
        seq, _ = make_sequence(n_frames=1, step=(0.0, 0.0, 0.0))
        frame = seq.load(0)
        depth = jnp.asarray(frame.depth)
        v, u = np.nonzero(frame.depth > 0)
        d = frame.depth[v, u]
        fx, fy = float(seq.intrinsics.fx), float(seq.intrinsics.fy)
        cx, cy = float(seq.intrinsics.cx), float(seq.intrinsics.cy)
        pts = np.stack(
            [(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1
        ).astype(np.float32)[::7]
        moved = jnp.asarray(pts + np.asarray([0.003, 0.0, 0.006], np.float32))
        a1 = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=False,
        )
        a2 = rigid_depth_alignment(
            moved, jnp.ones(len(pts), bool), depth, seq.intrinsics,
            iters=8, max_depth_diff=0.05, coarse_init=True,
        )
        np.testing.assert_allclose(
            np.asarray(a1.translation), np.asarray(a2.translation),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(a1.rotation), np.asarray(a2.rotation), atol=1e-6
        )


class TestPoseGraphInLoop:
    def _fusion(self):
        seq, _ = make_sequence(n_frames=3, step=(0.0, 0.0, 0.0))
        cfg = dataclasses.replace(
            small_config(), keyframe_interval=1, loop_radius=1.0,
            loop_align_iters=16, loop_min_separation=2,
        )
        fusion = DynamicFusion(seq, cfg)
        fusion.initialize(seq.load(0))
        return seq, fusion

    def test_drift_correction(self):
        seq, fusion = self._fusion()
        assert len(fusion.keyframes) == 1  # recorded at initialize
        fusion._record_keyframe(seq.load(1))  # clean keyframe

        # inject rigid drift into the warp (mostly along the ray — well
        # observed by projective association on a sphere)
        t_err = np.asarray([0.005, 0.0, 0.03], np.float32)
        fusion.warp = W.left_compose_rigid(
            fusion.warp, jnp.eye(3), jnp.asarray(t_err)
        )
        canonical = np.asarray(fusion.model_points)
        valid = np.asarray(fusion.model_valid & fusion.point_table.valid)

        def model_error():
            # rigid drift of the model centroid (a sphere is symmetric, so
            # point-identity error is gauge-dependent; the centroid isn't)
            pts = np.asarray(
                W.deform_points(
                    fusion.warp, fusion.model_points, fusion.point_table
                )
            )
            return float(
                np.linalg.norm(
                    pts[valid].mean(0) - canonical[valid].mean(0)
                )
            )

        err_before = model_error()
        assert err_before > 2e-2  # drift injected (beyond the gate)

        fusion._record_keyframe(seq.load(2))  # drifted keyframe
        correction = fusion._relocalize(fusion.keyframes[-1])
        n_loops = fusion._pose_graph_update()
        assert n_loops >= 1
        assert correction > 1e-3
        err_after = model_error()
        # observation-grounded re-localization pulls the model most of
        # the way back onto the current observation (the fixture's
        # nearest-pixel association leaves ~2 mm of the 8 mm drift)
        assert err_after < 0.35 * err_before, (err_before, err_after)

    def test_no_drift_no_correction(self):
        seq, fusion = self._fusion()
        fusion._record_keyframe(seq.load(1))
        fusion._record_keyframe(seq.load(2))
        correction = fusion._relocalize(fusion.keyframes[-1])
        n_loops = fusion._pose_graph_update()
        assert n_loops >= 1
        assert correction < 1e-3  # healthy tracking stays put

    def test_register_frame_reports_pose_fields(self):
        seq, fusion = self._fusion()
        fusion.register_frame(seq.load(1))
        info = fusion.register_frame(seq.load(2))
        assert "loop_closures" in info and "pose_correction" in info
        assert np.isfinite(info["pose_correction"])
