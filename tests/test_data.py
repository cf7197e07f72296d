"""Data-layer tests: binary format round trips, dataset padding, anime
clips, viz exports, snapshots."""

import os

import numpy as np
import pytest

from occlusionfusion_tpu.data import formats
from occlusionfusion_tpu.data.deformingthings4d import (
    anime_to_depth_sequence,
    frame_vertices,
    load_anime,
    save_anime,
    trajectory_ate,
)
from occlusionfusion_tpu.utils.viz import (
    flow_to_color,
    load_ply,
    save_obj,
    save_ply,
)
from occlusionfusion_tpu.utils.snapshot import (
    SnapshotManager,
    load_params,
    save_pytree,
)


class TestFormats:
    def test_flow_roundtrip(self, tmp_path):
        flow = np.random.RandomState(0).randn(2, 6, 8).astype(np.float32)
        p = str(tmp_path / "a.oflow")
        formats.save_flow(p, flow)
        np.testing.assert_array_equal(formats.load_flow(p), flow)

    def test_graph_roundtrip(self, tmp_path):
        nodes = np.random.RandomState(1).randn(5, 3).astype(np.float32)
        edges = np.random.RandomState(2).randint(-1, 5, (5, 4)).astype(np.int32)
        w = np.random.RandomState(3).rand(5, 4).astype(np.float32)
        formats.save_graph_nodes(str(tmp_path / "n.bin"), nodes)
        formats.save_graph_edges(str(tmp_path / "e.bin"), edges)
        formats.save_graph_edges_weights(str(tmp_path / "w.bin"), w)
        np.testing.assert_array_equal(
            formats.load_graph_nodes(str(tmp_path / "n.bin")), nodes
        )
        np.testing.assert_array_equal(
            formats.load_graph_edges(str(tmp_path / "e.bin")), edges
        )
        np.testing.assert_array_equal(
            formats.load_graph_edges_weights(str(tmp_path / "w.bin")), w
        )

    def test_image_roundtrip(self, tmp_path):
        fi = np.random.RandomState(4).randn(4, 5, 6).astype(np.float32)
        ii = np.random.RandomState(5).randint(0, 9, (4, 5, 6)).astype(np.int32)
        formats.save_float_image(str(tmp_path / "f.bin"), fi)
        formats.save_int_image(str(tmp_path / "i.bin"), ii)
        np.testing.assert_array_equal(
            formats.load_float_image(str(tmp_path / "f.bin")), fi
        )
        np.testing.assert_array_equal(
            formats.load_int_image(str(tmp_path / "i.bin")), ii
        )


class TestAnime:
    def _make_clip(self, tmp_path):
        rng = np.random.RandomState(0)
        verts = rng.randn(50, 3).astype(np.float32) * 0.1
        faces = rng.randint(0, 50, (80, 3)).astype(np.int32)
        offsets = np.cumsum(
            np.full((4, 50, 3), 0.01, np.float32), axis=0
        )
        p = str(tmp_path / "clip.anime")
        save_anime(p, verts, faces, offsets)
        return p, verts, faces, offsets

    def test_roundtrip(self, tmp_path):
        p, verts, faces, offsets = self._make_clip(tmp_path)
        v, f, o = load_anime(p)
        np.testing.assert_array_equal(v, verts)
        np.testing.assert_array_equal(f, faces)
        np.testing.assert_array_equal(o, offsets)
        np.testing.assert_allclose(
            frame_vertices(v, o, 2), verts + offsets[1]
        )

    def test_depth_render(self, tmp_path):
        import jax.numpy as jnp

        from occlusionfusion_tpu.geometry.camera import Intrinsics

        p, *_ = self._make_clip(tmp_path)
        intr = Intrinsics(
            jnp.float32(100.0), jnp.float32(100.0),
            jnp.float32(32.0), jnp.float32(32.0),
        )
        depths, gt = anime_to_depth_sequence(p, intr, image_hw=(64, 64))
        assert depths.shape == (5, 64, 64)
        assert gt.shape == (5, 50, 3)
        assert (depths > 0).any()

    def test_ate(self):
        gt = np.zeros((3, 10, 3))
        pred = gt + 0.01
        np.testing.assert_allclose(
            trajectory_ate(pred, gt), np.sqrt(3) * 0.01, atol=1e-6
        )


class TestVizExport:
    def test_ply_roundtrip(self, tmp_path):
        verts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        p = str(tmp_path / "m.ply")
        save_ply(p, verts, faces)
        v2, f2 = load_ply(p)
        np.testing.assert_allclose(v2, verts, atol=1e-4)
        np.testing.assert_array_equal(f2, faces)

    def test_obj_export(self, tmp_path):
        p = str(tmp_path / "m.obj")
        save_obj(p, np.zeros((3, 3)), np.asarray([[0, 1, 2]]))
        assert os.path.getsize(p) > 0

    def test_flow_colorwheel(self):
        flow = np.zeros((4, 4, 2))
        flow[..., 0] = 1.0
        img = flow_to_color(flow)
        assert img.shape == (4, 4, 3)
        assert img.dtype == np.uint8

    def test_line_mesh_cylinders(self, tmp_path):
        from occlusionfusion_tpu.utils.viz import line_mesh, merge_meshes

        pts = np.asarray([[0, 0, 0], [0, 0, 1.0], [1.0, 0, 0]], np.float32)
        v, f, c = line_mesh(pts, np.asarray([[0, 1], [0, 2]]), radius=0.01,
                            sides=6)
        # two cylinders: 12 verts + 12 tris each
        assert v.shape == (24, 3) and f.shape == (24, 3) and c.shape == (24, 3)
        assert f.min() >= 0 and f.max() < 24
        # first cylinder's verts hug the segment z in [0, 1], r ~= 0.01
        r = np.linalg.norm(v[:12, :2], axis=1)
        np.testing.assert_allclose(r, 0.01, atol=1e-6)
        save_ply(str(tmp_path / "g.ply"), v, f, c)
        v2, f2 = load_ply(str(tmp_path / "g.ply"))
        assert v2.shape == v.shape and f2.shape == f.shape
        # merge_meshes reindexes
        mv, mf, mc = merge_meshes([(v, f, c), (v, f, None)])
        assert mv.shape[0] == 48 and mf.max() == 47

    def test_line_mesh_neighbor_table(self):
        from occlusionfusion_tpu.utils.viz import line_mesh

        pts = np.random.RandomState(0).randn(5, 3).astype(np.float32)
        nbrs = np.asarray(
            [[1, -1, -1], [0, 2, -1], [3, -1, -1], [2, -1, -1], [-1, -1, -1]]
        )
        v, f, _ = line_mesh(pts, nbrs, radius=0.01, sides=4)
        assert v.shape[0] == 5 * 8  # 5 directed edges x 8 verts (4 sides)

    def test_graph_mesh_colored_by_motion(self):
        from occlusionfusion_tpu.utils.viz import graph_mesh

        pts = np.asarray([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]], np.float32)
        motion = np.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 0]], np.float32)
        v, f, c = graph_mesh(pts, np.asarray([[0, 1], [1, 2]]), motion,
                             radius=0.01)
        assert v.shape[0] == 24 and c.shape == (24, 3)
        # edge colors differ (different motion directions)
        assert not np.allclose(c[:12], c[12:])


class TestSnapshot:
    def test_params_roundtrip(self, tmp_path):
        tree = {"a": {"b": np.ones((2, 2)), "c": np.zeros(3)}}
        p = str(tmp_path / "snap.npz")
        save_pytree(p, tree)
        back = load_params(p)
        np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])

    def test_time_gate(self, tmp_path):
        mgr = SnapshotManager(str(tmp_path), min_interval_s=1000)
        assert mgr.maybe_save("x", {"v": np.ones(2)})
        assert not mgr.maybe_save("x", {"v": np.ones(2)})
        assert mgr.maybe_save("x", {"v": np.ones(2)}, force=True)


class TestLoaderPreprocessing:
    """RGBDSequence preprocessing options (median filter, max-depth
    cutoff, boundary mask) and their plumb into the pipeline."""

    def _write_seq(self, tmp_path, depth):
        from PIL import Image

        d = tmp_path / "seq"
        (d / "color").mkdir(parents=True)
        (d / "depth").mkdir()
        np.savetxt(d / "intrinsics.txt", np.array(
            [[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]))
        Image.fromarray(
            np.clip(depth * 1000, 0, 65535).astype(np.uint16)
        ).save(d / "depth" / "000000.png")
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
            d / "color" / "000000.jpg")
        return str(d)

    def _noisy_depth(self):
        depth = np.full((64, 64), 1.0, np.float32)
        depth[10, 10] = 1.8  # speckle outlier (within the depth cutoff)
        depth[:, 40:] = 2.5  # plane at a different depth (a discontinuity)
        return depth

    def test_median_filter_numpy_matches_jax(self):
        import jax

        from occlusionfusion_tpu.fusion.frame_loader import (
            median_filter_depth_np,
        )
        from occlusionfusion_tpu.ops.image_warp import median_filter_depth

        rng = np.random.RandomState(0)
        depth = rng.rand(32, 48).astype(np.float32) + 0.5
        depth[rng.rand(32, 48) < 0.1] = 0.0
        a = median_filter_depth_np(depth, size=5, max_deviation=0.05)
        b = np.asarray(median_filter_depth(depth, size=5, max_deviation=0.05))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_loader_options(self, tmp_path):
        from occlusionfusion_tpu.fusion.frame_loader import RGBDSequence

        path = self._write_seq(tmp_path, self._noisy_depth())
        plain = RGBDSequence(path).load(0)
        assert plain.boundary is None
        assert plain.depth[10, 10] > 1.7

        seq = RGBDSequence(path, max_depth=2.0, depth_filter_size=5,
                           boundary_dist=0.3)
        f = seq.load(0)
        # max_depth zeroed the far plane, median filter removed the speckle
        assert (f.depth[:, 45:] == 0).all()
        assert abs(f.depth[10, 10] - 1.0) < 1e-3
        # boundary mask marks the filtered-plane discontinuity edge
        assert f.boundary is not None and f.boundary.any()
        assert f.boundary[:, 38:42].any()
        # interior away from the discontinuity is clean (image borders are
        # marked, as in the reference's zero-padded shifts)
        assert not f.boundary[1:-1, 1:35].any()

    def test_boundary_excludes_correspondences(self):
        from occlusionfusion_tpu.fusion.correspondence import (
            projective_correspondences,
        )
        from occlusionfusion_tpu.fusion.frame_loader import boundary_mask_np
        from occlusionfusion_tpu.geometry.camera import Intrinsics
        import jax.numpy as jnp

        intr = Intrinsics(np.float32(100.0), np.float32(100.0),
                          np.float32(32.0), np.float32(32.0))
        depth = np.full((64, 64), 1.0, np.float32)
        depth[:, 40:] = 2.0
        boundary = boundary_mask_np(depth, intr, 0.3)
        corr_depth = jnp.where(jnp.asarray(boundary), 0.0, depth)
        # a point projecting exactly onto the discontinuity column
        pts = jnp.asarray([[(39.5 - 32.0) / 100.0, 0.0, 1.0],
                           [(10.0 - 32.0) / 100.0, 0.0, 1.0]], jnp.float32)
        valid = jnp.ones(2, bool)
        _, ok_plain = projective_correspondences(
            pts, valid, jnp.asarray(depth), intr, max_depth_diff=2.0)
        _, ok_masked = projective_correspondences(
            pts, valid, corr_depth, intr, max_depth_diff=2.0)
        assert bool(ok_plain[0]) and bool(ok_plain[1])
        assert not bool(ok_masked[0])  # boundary point excluded
        assert bool(ok_masked[1])  # interior point survives

    def test_pose_trajectory_ate(self):
        from occlusionfusion_tpu.data.deformingthings4d import (
            pose_trajectory_ate,
            rigid_pose_np,
        )

        rng = np.random.RandomState(3)
        pts = rng.randn(200, 3).astype(np.float32)
        # GT: rotate about z by 0.1*f rad and translate by 0.01*f
        gt, R_true, t_true = [pts], [np.eye(3, dtype=np.float32)], [
            np.zeros(3, np.float32)
        ]
        for f in range(1, 5):
            a = 0.1 * f
            R = np.asarray(
                [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                 [0, 0, 1]], np.float32)
            t = np.asarray([0.01 * f, 0.0, 0.0], np.float32)
            gt.append(pts @ R.T + t)
            R_true.append(R)
            t_true.append(t)
        gt = np.stack(gt)
        ids = np.arange(5)
        # exact poses -> zero error
        m = pose_trajectory_ate(ids, np.stack(R_true), np.stack(t_true), gt)
        assert m["pose_ate_m"] < 1e-5 and m["rot_err_deg"] < 0.01
        # rigid_pose_np recovers the GT pose from the trajectories
        Rr, tr = rigid_pose_np(gt[0], gt[3])
        np.testing.assert_allclose(Rr, R_true[3], atol=1e-5)
        np.testing.assert_allclose(tr, t_true[3], atol=1e-5)
        # a 5 mm translation bias on every pose -> 5 mm ATE
        m2 = pose_trajectory_ate(
            ids, np.stack(R_true),
            np.stack(t_true) + np.asarray([0.003, 0.004, 0.0]), gt)
        np.testing.assert_allclose(m2["pose_ate_m"], 0.005, rtol=1e-4)

    def test_bilinear_subpixel_exact_on_sloped_plane(self):
        from occlusionfusion_tpu.fusion.correspondence import (
            projective_correspondences,
        )
        from occlusionfusion_tpu.geometry.camera import Intrinsics
        import jax.numpy as jnp

        intr = Intrinsics(np.float32(100.0), np.float32(100.0),
                          np.float32(32.0), np.float32(32.0))
        # depth varies linearly with the pixel column: bilinear recovery
        # at a fractional u must be exact (nearest is off by the slope/2)
        cols = np.arange(64, dtype=np.float32)
        depth = np.tile(1.0 + 0.002 * cols, (64, 1))
        u_frac, v_frac = 20.25, 31.75
        z = float(1.0 + 0.002 * u_frac)
        pt = jnp.asarray(
            [[(u_frac - 32.0) / 100.0 * z, (v_frac - 32.0) / 100.0 * z, z]],
            jnp.float32)
        valid = jnp.ones(1, bool)
        tgt, ok = projective_correspondences(
            pt, valid, jnp.asarray(depth), intr, max_depth_diff=0.1)
        assert bool(ok[0])
        np.testing.assert_allclose(np.asarray(tgt[0]), np.asarray(pt[0]),
                                   atol=1e-5)
        # nearest-pixel association quantizes to column 20's depth
        tgt_n, ok_n = projective_correspondences(
            pt, valid, jnp.asarray(depth), intr, max_depth_diff=0.1,
            bilinear=False)
        assert bool(ok_n[0])
        assert abs(float(tgt_n[0, 2]) - z) > 1e-4

    def test_bilinear_does_not_blend_across_depth_edge(self):
        from occlusionfusion_tpu.fusion.correspondence import (
            projective_correspondences,
        )
        from occlusionfusion_tpu.geometry.camera import Intrinsics
        import jax.numpy as jnp

        intr = Intrinsics(np.float32(100.0), np.float32(100.0),
                          np.float32(32.0), np.float32(32.0))
        depth = np.full((64, 64), 1.0, np.float32)
        depth[:, 40:] = 2.0
        # point on the near surface projecting halfway between the last
        # near column (39) and the first far column (40)
        u_frac = 39.5
        pt = jnp.asarray([[(u_frac - 32.0) / 100.0, 0.0, 1.0]], jnp.float32)
        valid = jnp.ones(1, bool)
        tgt, ok = projective_correspondences(
            pt, valid, jnp.asarray(depth), intr, max_depth_diff=0.1)
        # only the same-surface corners vote: depth stays exactly 1.0
        assert bool(ok[0])
        np.testing.assert_allclose(float(tgt[0, 2]), 1.0, atol=1e-6)
