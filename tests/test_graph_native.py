"""Native graph-builder tests: closed-form fixtures (sphere / plane /
grid meshes) for mesh-from-depth, erosion, sampling, geodesic edges,
clusters and marching cubes."""

import numpy as np
import pytest

from occlusionfusion_tpu.graph import native


def plane_point_image(h=16, w=16, z=1.0):
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([u * 0.01, v * 0.01, np.full((h, w), z, np.float32)], -1)
    return pts


class TestMeshFromDepth:
    def test_full_plane(self):
        pts = plane_point_image()
        verts, faces, vmap = native.mesh_from_depth(pts, max_edge_len=0.05)
        assert verts.shape[0] == 16 * 16
        assert faces.shape[0] == 2 * 15 * 15
        assert (vmap >= 0).all()

    def test_invalid_pixels_excluded(self):
        pts = plane_point_image()
        pts[5:8, 5:8, 2] = 0.0  # hole
        verts, faces, vmap = native.mesh_from_depth(pts, max_edge_len=0.05)
        assert (vmap[5:8, 5:8] == -1).all()
        assert verts.shape[0] < 16 * 16

    def test_edge_length_cutoff(self):
        pts = plane_point_image()
        pts[:, 8:, 2] += 1.0  # depth jump between columns 7 and 8
        verts, faces, vmap = native.mesh_from_depth(pts, max_edge_len=0.05)
        # no face may span the jump: all faces live entirely left or right
        xs = verts[faces][:, :, 0]  # [F, 3]
        spans = (xs.min(1) < 0.075) & (xs.max(1) > 0.075)
        assert not spans.any()


class TestErodeSample:
    def test_erode_marks_boundary(self):
        pts = plane_point_image()
        verts, faces, _ = native.mesh_from_depth(pts, max_edge_len=0.05)
        keep = native.erode_mesh(verts, faces, iterations=1, min_neighbors=2)
        # border vertices eroded, interior survives
        border = (
            (verts[:, 0] < 0.005)
            | (verts[:, 0] > 0.145)
            | (verts[:, 1] < 0.005)
            | (verts[:, 1] > 0.145)
        )
        assert not keep[border].any()
        assert keep[~border].sum() > 0

    def test_sample_nodes_coverage(self):
        pts = plane_point_image(32, 32)
        verts, faces, _ = native.mesh_from_depth(pts, max_edge_len=0.05)
        ids = native.sample_nodes(verts, None, node_coverage=0.05)
        nodes = verts[ids]
        # pairwise distances all >= coverage
        d = np.linalg.norm(nodes[:, None] - nodes[None, :], axis=-1)
        d += np.eye(len(nodes)) * 1e9
        assert d.min() >= 0.05 - 1e-6
        # every vertex within coverage of some node (greedy guarantee)
        dv = np.linalg.norm(verts[:, None] - nodes[None, :], axis=-1).min(1)
        assert dv.max() < 0.05 + 1e-6


class TestGeodesicEdges:
    def test_line_graph_distances(self):
        # a strip mesh: vertices on a line with degenerate second row
        n = 10
        verts = np.zeros((2 * n, 3), np.float32)
        verts[:n, 0] = np.arange(n)
        verts[n:, 0] = np.arange(n)
        verts[n:, 1] = 1.0
        faces = []
        for i in range(n - 1):
            faces.append([i, i + 1, n + i])
            faces.append([i + 1, n + i + 1, n + i])
        faces = np.asarray(faces, np.int32)
        node_ids = np.asarray([0, 4, 9], np.int32)
        edges, dists = native.geodesic_edges(verts, faces, node_ids, k=2)
        # node 0's nearest node geodesically is node 1 (vertex 4) at dist 4
        assert edges[0, 0] == 1
        np.testing.assert_allclose(dists[0, 0], 4.0, atol=1e-5)
        assert edges[1, 0] in (0, 2)

    def test_disconnected_pad(self):
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [10, 0, 0], [11, 0, 0]], np.float32
        )
        faces = np.array([[0, 1, 0], [2, 3, 2]], np.int32)
        edges, dists = native.geodesic_edges(
            verts, faces, np.array([0, 2], np.int32), k=2
        )
        # components are disconnected: each node finds no other node
        assert (edges[:, 0] == -1).all()
        assert np.isinf(dists[:, 0]).all()


class TestClusters:
    def test_two_components(self):
        edges = np.array(
            [[1, -1], [0, -1], [3, -1], [2, -1]], np.int32
        )
        cluster, sizes = native.compute_clusters(edges)
        assert len(sizes) == 2
        assert cluster[0] == cluster[1]
        assert cluster[2] == cluster[3]
        assert cluster[0] != cluster[2]
        assert sorted(sizes.tolist()) == [2, 2]

    def test_asymmetric_edges_merge(self):
        # 2 -> 0 only (no back edge): still one component with 0,1
        edges = np.array([[1, -1], [0, -1], [0, -1]], np.int32)
        cluster, sizes = native.compute_clusters(edges)
        assert len(sizes) == 1


class TestMarchingCubes:
    def test_sphere_surface(self):
        n = 24
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        center = (n - 1) / 2.0
        r = 8.0
        sdf = (
            np.sqrt(
                (g[0] - center) ** 2 + (g[1] - center) ** 2 + (g[2] - center) ** 2
            )
            - r
        )
        verts, faces = native.marching_cubes(sdf)
        assert verts.shape[0] > 100
        assert faces.shape[0] > 100
        radii = np.linalg.norm(verts - center, axis=1)
        np.testing.assert_allclose(radii, r, atol=0.2)
        # faces index valid vertices
        assert faces.max() < verts.shape[0]
        assert faces.min() >= 0

    def test_mask_restricts(self):
        n = 16
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        sdf = g[2] - 7.5  # plane z=7.5
        mask = np.zeros((n, n, n), np.uint8)
        mask[:8] = 1  # only x < 8 cells
        verts, faces = native.marching_cubes(sdf, mask)
        assert verts.shape[0] > 0
        assert verts[:, 0].max() <= 8.0 + 1e-5
        np.testing.assert_allclose(verts[:, 2], 7.5, atol=1e-5)

    def test_watertight_sphere_euler(self):
        # closed surface: V - E + F == 2 (genus 0)
        n = 20
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        center = (n - 1) / 2.0
        sdf = np.linalg.norm(g - center, axis=0) - 6.0
        verts, faces = native.marching_cubes(sdf)
        edges = set()
        for f in faces:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                e = (min(f[a], f[b]), max(f[a], f[b]))
                edges.add(e)
        euler = verts.shape[0] - len(edges) + faces.shape[0]
        assert euler == 2, f"non-watertight surface, euler={euler}"
