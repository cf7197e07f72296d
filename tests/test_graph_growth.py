"""Graph growth tests: new surface appears, nodes extend onto it, new
node transforms are ARAP-consistent with their neighbors."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.fusion.graph_growth import find_unreachable, grow_graph
from occlusionfusion_tpu.geometry import so3_exp


def base_setup(cap=64):
    # a small line of nodes along x
    nodes = np.zeros((cap, 3), np.float32)
    nodes[:4, 0] = np.arange(4) * 0.05
    valid = np.zeros(cap, bool)
    valid[:4] = True
    warp = W.create_warpfield(jnp.asarray(nodes), jnp.asarray(valid))
    edges = -np.ones((cap, 8), np.int32)
    ew = np.zeros((cap, 8), np.float32)
    for i in range(4):
        nb = [j for j in (i - 1, i + 1) if 0 <= j < 4]
        edges[i, : len(nb)] = nb
        ew[i, : len(nb)] = 1.0 / len(nb)
    return warp, jnp.asarray(edges), jnp.asarray(ew)


class TestGrowth:
    def test_find_unreachable(self):
        warp, _, _ = base_setup()
        pts = jnp.asarray([[0.02, 0, 0], [1.0, 0, 0]])
        un = find_unreachable(pts, jnp.ones(2, bool), warp, 0.05)
        assert not bool(un[0]) and bool(un[1])

    def test_grow_adds_nodes(self):
        warp, edges, ew = base_setup()
        # new surface: points continuing the line beyond node coverage
        new_pts = np.stack(
            [0.25 + np.arange(5) * 0.05, np.zeros(5), np.zeros(5)], -1
        ).astype(np.float32)
        res = grow_graph(
            warp, 4, edges, ew, new_pts, np.ones(5, bool), node_coverage=0.05
        )
        assert res.n_new >= 3
        assert res.node_count == 4 + res.n_new
        # new nodes have edges and normalized weights
        e = np.asarray(res.edges)[4 : res.node_count]
        w = np.asarray(res.edge_weights)[4 : res.node_count]
        assert (e[:, 0] >= 0).all()
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)

    def test_new_nodes_inherit_motion(self):
        warp, edges, ew = base_setup()
        # old nodes carry a uniform translation
        t = jnp.broadcast_to(jnp.asarray([0.0, 0.02, 0.0]), warp.translations.shape)
        warp = W.update_transforms(warp, warp.rotations, t)
        new_pts = np.stack(
            [0.25 + np.arange(4) * 0.05, np.zeros(4), np.zeros(4)], -1
        ).astype(np.float32)
        res = grow_graph(
            warp, 4, edges, ew, new_pts, np.ones(4, bool), node_coverage=0.05
        )
        t_new = np.asarray(res.warp.translations)[4 : res.node_count]
        # ARAP propagation keeps the uniform translation
        np.testing.assert_allclose(
            t_new, np.broadcast_to([0.0, 0.02, 0.0], t_new.shape), atol=2e-3
        )

    def test_no_growth_when_covered(self):
        warp, edges, ew = base_setup()
        pts = np.asarray([[0.02, 0.0, 0.0]], np.float32)
        res = grow_graph(
            warp, 4, edges, ew, pts, np.ones(1, bool), node_coverage=0.05
        )
        assert res.n_new == 0
        assert res.node_count == 4


class TestPyramidRebuild:
    """Growth keyframes rebuild the motion-model pyramid (euclidean)."""

    def _grown_nodes(self, n=40):
        rng = np.random.RandomState(3)
        return (rng.rand(n, 3) * 0.4).astype(np.float32)

    def test_pyramid_invariants(self):
        from occlusionfusion_tpu.graph.edgraph import (
            PYRAMID_KS,
            build_pyramid_from_nodes,
        )

        nodes = self._grown_nodes()
        pyd = build_pyramid_from_nodes(nodes, node_coverage=0.05)
        sizes = [pyd[f"nn_index_l{l}"].shape[0] for l in range(4)]
        assert sizes[0] == nodes.shape[0]
        assert sizes[0] >= sizes[1] >= sizes[2] >= sizes[3] >= 1
        for l in range(4):
            nn = pyd[f"nn_index_l{l}"]
            assert nn.shape[1] == PYRAMID_KS[l]
            # neighbor ids index into the same level; -1 = missing
            assert nn.max() < sizes[l]
            assert (nn >= -1).all()
            # no self loops
            rows = np.arange(sizes[l])[:, None]
            assert not ((nn == rows) & (nn >= 0)).any()
        for i in (1, 2, 3):
            down = pyd[f"down_sample_idx{i}"]
            up = pyd[f"up_sample_idx{i}"]
            assert down.shape[0] == sizes[i]
            assert up.shape[0] == sizes[i - 1]
            # down indexes the finer level, up indexes the coarser level
            # (up_idx[i] is assigned before i is accepted — edg.py:276-301
            # — so kept nodes need not map to themselves)
            assert down.max() < sizes[i - 1]
            assert up.max() < sizes[i]

    def test_level0_edges_passthrough(self):
        from occlusionfusion_tpu.graph.edgraph import build_pyramid_from_nodes

        nodes = self._grown_nodes(10)
        edges = -np.ones((10, 8), np.int32)
        edges[:, 0] = (np.arange(10) + 1) % 10
        pyd = build_pyramid_from_nodes(nodes, 0.05, edges=edges)
        np.testing.assert_array_equal(pyd["nn_index_l0"], edges.astype(np.int16))

    def test_motion_runner_consumes_rebuilt_pyramid(self):
        import jax

        from occlusionfusion_tpu.fusion.motion_runner import (
            MotionCompletionRunner,
        )
        from occlusionfusion_tpu.graph.edgraph import build_pyramid_from_nodes
        from occlusionfusion_tpu.models.motion_complete import init_params

        nodes = self._grown_nodes(30)
        pyd = build_pyramid_from_nodes(nodes, node_coverage=0.05)
        runner = MotionCompletionRunner(init_params(jax.random.PRNGKey(0)))
        motion, conf = runner.run_frame(
            node_pos=nodes,
            node_motion=np.zeros_like(nodes),
            visible=np.ones(len(nodes), bool),
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )
        assert motion.shape == (30, 3) and conf.shape == (30,)
        assert np.isfinite(motion).all() and np.isfinite(conf).all()
