"""End-to-end DynamicFusion on a synthetic deforming scene.

A sphere translates frame to frame; depth maps are ray-cast analytically
(closed form). The pipeline must track the motion: after each frame the
deformed canonical model should lie on the observed sphere surface.
This is the hermetic analog of the reference's fusion_tests suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion.frame_loader import ArraySequence
from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.graph.edgraph import GraphConfig
from occlusionfusion_tpu.solvers.nicp import NICPConfig

H = W = 128
INTR = Intrinsics(
    np.float32(300.0), np.float32(300.0), np.float32(64.0), np.float32(64.0)
)
RADIUS = 0.1


def sphere_depth(center, h=H, w=W, intr=INTR, r=RADIUS):
    """Analytic z-depth of a sphere from the pinhole camera at origin."""
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = (u - intr.cx) / intr.fx
    dy = (v - intr.cy) / intr.fy
    d = np.stack([dx, dy, np.ones_like(dx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(center, np.float32)
    b = d @ c
    disc = b * b - (c @ c - r * r)
    hit = disc > 0
    t = b - np.sqrt(np.maximum(disc, 0))
    depth = np.where(hit & (t > 0), t * d[..., 2], 0.0)
    return depth.astype(np.float32)


def make_sequence(n_frames=4, step=(0.0, 0.0, 0.004)):
    # NOTE: z-dominant motion — projective (line-of-sight) association is
    # blind to tangential sphere motion (the aperture problem); recovering
    # lateral motion is what the learned matcher (Lepard stack) is for.
    centers = [
        np.array([0.0, 0.0, 1.0]) + np.asarray(step) * i for i in range(n_frames)
    ]
    depths = [sphere_depth(c) for c in centers]
    colors = [np.full((H, W, 3), 128.0, np.float32) for _ in centers]
    return ArraySequence(colors, depths, INTR), centers


def small_config():
    return FusionConfig(
        vol_dim=(48, 48, 48),
        voxel_size=0.008,
        node_coverage=0.04,
        max_nodes=256,
        max_points=2048,
        max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=0.04, min_neighbors=2),
        nicp=NICPConfig(iters=60, w_motion=0.0, lr=0.02),
        use_motion_model=False,
    )


class TestFusionE2E:
    @pytest.fixture(scope="class")
    def run(self):
        seq, centers = make_sequence()
        fusion = DynamicFusion(seq, small_config())
        fusion.initialize(seq.load(0))
        infos = [fusion.register_frame(seq.load(i)) for i in range(1, len(seq))]
        return fusion, centers, infos

    def test_initialization_builds_graph(self, run):
        fusion, _, _ = run
        assert fusion.node_count > 5
        assert int(fusion.model_valid.sum()) > 100

    def test_correspondences_found(self, run):
        _, _, infos = run
        for info in infos:
            assert info["n_correspondences"] > 200, info

    def test_tracking_follows_sphere(self, run):
        fusion, centers, _ = run
        # deformed model points must lie on the last observed sphere
        from occlusionfusion_tpu.fusion import warpfield as W

        deformed = W.deform_points(
            fusion.warp, fusion.model_points, fusion.point_table
        )
        valid = np.asarray(fusion.model_valid & fusion.point_table.valid)
        pts = np.asarray(deformed)[valid]
        dist = np.abs(np.linalg.norm(pts - centers[-1], axis=1) - RADIUS)
        # visible hemisphere tracks tightly; allow slack for the back side
        assert np.median(dist) < 0.01, np.median(dist)

    def test_node_translations_match_motion(self, run):
        fusion, centers, _ = run
        total_motion = centers[-1] - centers[0]
        t = np.asarray(fusion.warp.translations)[: fusion.node_count]
        # median node translation approximates the rigid translation
        med = np.median(t, axis=0)
        np.testing.assert_allclose(med, total_motion, atol=4e-3)

    def test_tsdf_accumulates(self, run):
        fusion, _, _ = run
        w = np.asarray(fusion.tsdf.weight)
        assert w.max() >= 3.0  # several frames integrated somewhere
