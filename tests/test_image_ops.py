"""Tests: image warps, flow correspondences, pixel anchors."""

import numpy as np
import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.ops.image_warp import (
    augment_flow,
    warp_3d,
    warp_image_with_flow,
    warp_rigid,
)
from occlusionfusion_tpu.fusion.flow_correspondence import (
    predicted_node_locations,
)
from occlusionfusion_tpu.graph.pixel_anchors import (
    pixel_anchors_euclidean,
    pixel_anchors_geodesic,
)

INTR = Intrinsics(
    jnp.float32(100.0), jnp.float32(100.0), jnp.float32(16.0), jnp.float32(16.0)
)


def plane_points(h=32, w=32, z=1.0):
    v, u = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    x = (u - INTR.cx) / INTR.fx * z
    y = (v - INTR.cy) / INTR.fy * z
    return jnp.stack([x, y, jnp.full((h, w), z)], -1)


class TestImageWarps:
    def test_warp_with_zero_flow(self):
        img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3), jnp.float32)
        out = warp_image_with_flow(img, jnp.zeros((8, 8, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_warp_rigid_translation_x(self):
        pts = plane_points()
        t = jnp.asarray([0.01, 0.0, 0.0])  # 1 cm right at z=1 -> ~1 px
        flow, valid = warp_rigid(pts, jnp.eye(3), t, INTR)
        assert bool(valid.all())
        np.testing.assert_allclose(np.asarray(flow[..., 0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(flow[..., 1]), 0.0, atol=1e-4)

    def test_warp_3d_equals_rigid_for_translation(self):
        pts = plane_points()
        t = jnp.asarray([0.0, 0.02, 0.0])
        sf = jnp.broadcast_to(t, pts.shape)
        f3, _ = warp_3d(pts, sf, INTR)
        fr, _ = warp_rigid(pts, jnp.eye(3), t, INTR)
        np.testing.assert_allclose(np.asarray(f3), np.asarray(fr), atol=1e-4)

    def test_augment_changes_masked_only(self):
        flow = jnp.zeros((6, 6, 2))
        mask = jnp.zeros((6, 6), bool).at[2:4, 2:4].set(True)
        out = augment_flow(jax.random.PRNGKey(0), flow, mask)
        out = np.asarray(out)
        assert (out[~np.asarray(mask)] == 0).all()
        assert np.abs(out[np.asarray(mask)]).max() > 0


class TestPredictedNodeLocations:
    def test_weighted_mean(self):
        H = W = 4
        targets = jnp.ones((H, W, 3)) * 2.0
        valid = jnp.ones((H, W), bool)
        anchors = jnp.zeros((H, W, 2), jnp.int32)  # all pixels -> node 0
        weights = jnp.full((H, W, 2), 0.5)
        loc, obs = predicted_node_locations(targets, valid, anchors, weights, 4)
        assert bool(obs[0]) and not bool(obs[1])
        np.testing.assert_allclose(np.asarray(loc[0]), 2.0, atol=1e-6)

    def test_invalid_anchor_ignored(self):
        targets = jnp.ones((2, 2, 3))
        valid = jnp.ones((2, 2), bool)
        anchors = jnp.full((2, 2, 1), -1, jnp.int32)
        weights = jnp.ones((2, 2, 1))
        loc, obs = predicted_node_locations(targets, valid, anchors, weights, 2)
        assert not bool(obs.any())


class TestPixelAnchors:
    def test_euclidean(self):
        pts = np.asarray(plane_points())
        nodes = pts[8:25:8, 8:25:8].reshape(-1, 3)
        anchors, weights = pixel_anchors_euclidean(
            pts, nodes, None, node_coverage=0.2, k=4
        )
        assert anchors.shape == (32, 32, 4)
        center = anchors[16, 16]
        assert (center >= 0).all()
        np.testing.assert_allclose(weights[16, 16].sum(), 1.0, atol=1e-3)
        # a zero-depth pixel gets no anchors
        pts2 = pts.copy()
        pts2[0, 0, 2] = 0.0
        anchors2, w2 = pixel_anchors_euclidean(
            pts2, nodes, None, node_coverage=0.2, k=4
        )
        assert (anchors2[0, 0] == -1).all()

    def test_geodesic(self):
        pts = np.asarray(plane_points())
        # nodes at a few mesh vertices: use pixel (y*w+x) vertex ids after
        # meshing the full plane (vertex ids == pixel order for full grid)
        node_vertex_ids = np.asarray([0, 500, 1000], np.int32)
        anchors, weights, (verts, faces, vmap) = pixel_anchors_geodesic(
            pts, max_triangle_edge=0.05, node_vertex_ids=node_vertex_ids,
            node_coverage=0.2, k=2,
        )
        assert anchors.shape == (32, 32, 2)
        covered = anchors[..., 0] >= 0
        assert covered.sum() > 100
        s = weights.sum(-1)
        np.testing.assert_allclose(s[covered], 1.0, atol=1e-3)


class TestGTHelpers:
    def test_mask_gt_agreement(self):
        from occlusionfusion_tpu.ops.gt_helpers import deformed_gt_points, mask_gt

        pts = plane_points()
        flow = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.05]), pts.shape)
        target = plane_points(z=1.05)  # exactly where the flow lands
        m = mask_gt(pts, flow, target, INTR)
        assert bool(m[16, 16])
        # wrong target depth -> negative mask
        target_bad = plane_points(z=1.3)
        m2 = mask_gt(pts, flow, target_bad, INTR)
        assert not bool(m2[16, 16])

    def test_deformed_gt_zero_depth_invalid(self):
        from occlusionfusion_tpu.ops.gt_helpers import deformed_gt_points

        pts = plane_points()
        pts = pts.at[0, 0, 2].set(0.0)
        out, valid = deformed_gt_points(pts, jnp.ones_like(pts))
        assert not bool(valid[0, 0])
        np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)
