"""Median depth filter + regular-grid graph parity leftovers."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.ops.image_warp import median_filter_depth
from occlusionfusion_tpu.graph.edgraph import build_regular_graph


class TestMedianFilter:
    def test_removes_spike(self):
        depth = jnp.full((9, 9), 1.0).at[4, 4].set(5.0)
        out = median_filter_depth(depth, size=3, max_deviation=0.1)
        np.testing.assert_allclose(float(out[4, 4]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0)

    def test_keeps_valid_smooth(self):
        rng = np.random.RandomState(0)
        depth = jnp.asarray(1.0 + rng.rand(8, 8).astype(np.float32) * 0.01)
        out = median_filter_depth(depth, size=3, max_deviation=0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(depth))

    def test_zeros_stay_zero(self):
        depth = jnp.zeros((5, 5)).at[2, 2].set(1.0)
        out = median_filter_depth(depth, size=3)
        assert float(out[0, 0]) == 0.0


class TestRegularGraph:
    def _plane(self, h=32, w=32, z=1.0):
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        return np.stack(
            [u * 0.01, v * 0.01, np.full((h, w), z, np.float32)], -1
        )

    def test_full_plane_grid(self):
        pts = self._plane()
        g = build_regular_graph(pts, nodes_x=6, nodes_y=6)
        assert g.nodes.shape[0] == 36
        # interior nodes have 8 neighbors
        degrees = (g.edges >= 0).sum(1)
        assert degrees.max() == 8
        assert len(g.cluster_sizes) == 1

    def test_depth_jump_splits(self):
        pts = self._plane()
        pts[:, 16:, 2] += 1.0  # two planes
        g = build_regular_graph(pts, nodes_x=8, nodes_y=4, max_depth_diff=0.1)
        assert len(g.cluster_sizes) == 2

    def test_invalid_depth_skipped(self):
        pts = self._plane()
        pts[:16, :, 2] = 0.0
        g = build_regular_graph(pts, nodes_x=4, nodes_y=4)
        assert g.nodes.shape[0] == 8


class TestMeshRenderer:
    """Headless shaded renderer (open3d-viewer replacement, P16)."""

    def test_render_mesh_lights_the_surface(self):
        import numpy as np

        from occlusionfusion_tpu.data.synthetic_shapes import shape_clip
        from occlusionfusion_tpu.utils.viz import render_mesh

        v, _, _ = shape_clip("limbs", 4, 3000, seed=0)
        img = render_mesh(v, None, image_hw=(120, 120))
        assert img.shape == (120, 120, 3) and img.dtype == np.uint8
        fg = img.max(-1) > 40
        assert 0.2 < fg.mean() < 0.9  # object occupies the frame
        # lit: foreground clearly brighter than the background floor
        assert img[fg].mean() > 70

    def test_turntable_views_differ(self, tmp_path):
        import numpy as np

        from occlusionfusion_tpu.data.synthetic_shapes import shape_clip
        from occlusionfusion_tpu.utils.viz import save_turntable

        v, _, _ = shape_clip("arms", 4, 3000, seed=1)
        paths = save_turntable(
            str(tmp_path / "t_%d.png"), v, None, n_views=2,
            image_hw=(96, 96),
        )
        assert len(paths) == 2
        import matplotlib.image as mpimg

        a, b = (mpimg.imread(p) for p in paths)
        assert np.abs(a - b).mean() > 1e-3  # the orbit actually orbits
