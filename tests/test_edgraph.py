"""EDGraph builder tests: sphere-mesh fixture end to end, pyramid
structure invariants matching the demo npz layout."""

import numpy as np

from occlusionfusion_tpu.graph import native
from occlusionfusion_tpu.graph.edgraph import (
    GraphConfig,
    build_graph_from_mesh,
    build_graph_from_depth,
)


def sphere_mesh(n=32, r=8.0):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    sdf = np.linalg.norm(g - center, axis=0) - r
    verts, faces = native.marching_cubes(sdf)
    return verts * 0.01, faces  # ~16 cm sphere


class TestBuildGraph:
    def test_sphere_graph(self):
        verts, faces = sphere_mesh()
        cfg = GraphConfig(node_coverage=0.02, max_triangle_edge=0.05)
        g = build_graph_from_mesh(verts, faces, cfg)
        n = g.nodes.shape[0]
        assert n > 10
        assert g.edges.shape == (n, 8)
        # edges reference valid node ids
        assert g.edges.max() < n
        # a sphere is one component
        assert len(g.cluster_sizes) == 1
        # edge weights rows normalized where edges exist
        has_edges = (g.edges >= 0).any(1)
        np.testing.assert_allclose(
            g.edge_weights[has_edges].sum(1), 1.0, atol=1e-5
        )

    def test_pyramid_layout(self):
        verts, faces = sphere_mesh()
        cfg = GraphConfig(node_coverage=0.02)
        g = build_graph_from_mesh(verts, faces, cfg)
        pyd = g.pyramid
        n0 = g.nodes.shape[0]
        assert pyd["nn_index_l0"].shape == (n0, 8)
        n1 = pyd["nn_index_l1"].shape[0]
        n2 = pyd["nn_index_l2"].shape[0]
        n3 = pyd["nn_index_l3"].shape[0]
        assert n0 > n1 >= n2 >= n3 >= 1
        assert pyd["down_sample_idx1"].shape == (n1,)
        assert pyd["up_sample_idx1"].shape == (n0,)
        assert pyd["down_sample_idx2"].shape == (n2,)
        assert pyd["up_sample_idx2"].shape == (n1,)
        # up maps index into the next-coarser level
        assert pyd["up_sample_idx1"].max() < n1
        assert pyd["up_sample_idx2"].max() < n2
        assert pyd["up_sample_idx3"].max() < n3
        assert pyd["nn_index_l1"].shape[1] == 6
        assert pyd["nn_index_l2"].shape[1] == 4
        assert pyd["nn_index_l3"].shape[1] == 3

    def test_nodes_respect_coverage(self):
        verts, faces = sphere_mesh()
        cfg = GraphConfig(node_coverage=0.02)
        g = build_graph_from_mesh(verts, faces, cfg)
        d = np.linalg.norm(g.nodes[:, None] - g.nodes[None, :], axis=-1)
        d += np.eye(len(g.nodes)) * 1e9
        assert d.min() >= 0.02 - 1e-6

    def test_from_depth(self):
        h = w = 48
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        pts = np.stack(
            [u * 0.005, v * 0.005, np.full((h, w), 1.0, np.float32)], -1
        )
        cfg = GraphConfig(node_coverage=0.03, max_triangle_edge=0.02)
        g = build_graph_from_depth(pts, cfg)
        assert g.nodes.shape[0] >= 4
        assert (g.clusters >= 0).all()

    def test_feeds_motion_model(self):
        """The freshly built pyramid must be consumable by the GNN."""
        import jax
        import jax.numpy as jnp

        from occlusionfusion_tpu.fusion.motion_runner import pad_pyramid
        from occlusionfusion_tpu.models.motion_complete import (
            init_params,
            motion_complete_forward,
        )

        verts, faces = sphere_mesh()
        g = build_graph_from_mesh(verts, faces, GraphConfig(node_coverage=0.02))
        pyd = g.pyramid
        caps = (256, 64, 32, 16)
        pyr = pad_pyramid(
            [pyd[f"nn_index_l{l}"] for l in range(4)],
            [pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            [pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
            level_sizes=caps,
        )
        n0 = g.nodes.shape[0]
        pos = np.zeros((caps[0], 3), np.float32)
        pos[:n0] = g.nodes
        pred = motion_complete_forward(
            init_params(jax.random.PRNGKey(0)),
            jnp.asarray(pos),
            jnp.zeros((caps[0], 4)),
            jnp.zeros((16, caps[0], 4)),
            jnp.int32(1),
            pyr,
        )
        assert bool(jnp.all(jnp.isfinite(pred[:n0])))
