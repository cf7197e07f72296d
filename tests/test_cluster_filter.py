"""Match-starved cluster freezing (reference
``model/model.py:1143-1221`` gn_remove_clusters_with_few_matches): a
graph component with too little correspondence weight is frozen at its
previous transforms instead of being dragged by its few (garbage)
matches."""

import numpy as np
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion.correspondence import cluster_match_filter
from occlusionfusion_tpu.fusion.frame_loader import ArraySequence
from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.graph.edgraph import GraphConfig
from occlusionfusion_tpu.solvers.nicp import NICPConfig

H, W = 96, 160
INTR = Intrinsics(
    np.float32(220.0), np.float32(220.0), np.float32(80.0), np.float32(48.0)
)


class TestClusterMatchFilter:
    def test_starved_cluster_frozen_and_matches_dropped(self):
        n, p = 8, 16
        clusters = jnp.asarray([0, 0, 0, 0, 1, 1, -1, -1], jnp.int32)
        node_valid = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], bool)
        anchors = jnp.concatenate(
            [
                jnp.tile(jnp.asarray([[0, 1, 2, 3]]), (12, 1)),
                jnp.tile(jnp.asarray([[4, 5, 4, 5]]), (2, 1)),
                jnp.tile(jnp.asarray([[0, 1, 4, 5]]), (2, 1)),  # straddle
            ]
        )
        weights = jnp.full((p, 4), 0.25)
        corr_w = jnp.ones(p)
        mask, w2 = cluster_match_filter(
            anchors, weights, corr_w, clusters, node_valid,
            min_cluster_weight=5.0,
        )
        mask = np.asarray(mask)
        # cluster 0: 12 full + 2 straddling halves = 13 weight -> alive
        assert mask[:4].all()
        # cluster 1: 2 matches + straddle halves = 3 weight -> frozen
        assert not mask[4:6].any()
        # padded nodes never solve
        assert not mask[6:].any()
        w2 = np.asarray(w2)
        assert (w2[:12] == 1.0).all()
        assert (w2[12:] == 0.0).all()  # anchored to frozen nodes

    def test_all_clusters_alive_is_identity(self):
        anchors = jnp.zeros((8, 4), jnp.int32)
        weights = jnp.full((8, 4), 0.25)
        corr_w = jnp.ones(8)
        clusters = jnp.zeros(4, jnp.int32)
        mask, w2 = cluster_match_filter(
            anchors, weights, corr_w, clusters, jnp.ones(4, bool), 1.0
        )
        assert np.asarray(mask).all()
        np.testing.assert_array_equal(np.asarray(w2), np.ones(8))


def two_sphere_depth(ca, cb, r=0.07):
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    dx = (u - INTR.cx) / INTR.fx
    dy = (v - INTR.cy) / INTR.fy
    d = np.stack([dx, dy, np.ones_like(dx)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = np.zeros((H, W), np.float32)
    for c in (ca, cb):
        c = np.asarray(c, np.float32)
        b = d @ c
        disc = b * b - (c @ c - r * r)
        hit = disc > 0
        t = b - np.sqrt(np.maximum(disc, 0))
        z = np.where(hit & (t > 0), t * d[..., 2], np.inf)
        depth = np.where(
            (z < np.where(depth > 0, depth, np.inf)), z, depth
        )
    return np.where(np.isfinite(depth), depth, 0.0).astype(np.float32)


CA = np.asarray([-0.12, 0.0, 0.6])
CB = np.asarray([0.12, 0.0, 0.6])


def make_two_component_seq():
    """Frame 0: both spheres. Frame 1: sphere A moves 4 mm in z; sphere
    B is 90% occluded and its surviving sliver of depth is shifted 2 cm
    (garbage association bait for B's cluster)."""
    d0 = two_sphere_depth(CA, CB)
    d1 = two_sphere_depth(CA + [0, 0, 0.004], CB)
    right = np.zeros((H, W), bool)
    right[:, W // 2 :] = True
    b_pix = (d1 > 0) & right
    # keep only a thin sliver of B, shifted away from the model
    rows, cols = np.nonzero(b_pix)
    keep = np.zeros((H, W), bool)
    if len(rows):
        rmin = rows.min()
        keep[rmin : rmin + max((rows.max() - rmin) // 10, 2)] = True
    d1 = np.where(b_pix & ~keep, 0.0, d1)
    d1 = np.where(b_pix & keep, d1 + 0.02, d1)
    colors = [np.full((H, W, 3), 128.0, np.float32)] * 2
    return ArraySequence(colors, [d0, d1], INTR)


def run_two_component(min_cluster_matches):
    seq = make_two_component_seq()
    cfg = FusionConfig(
        vol_dim=(48, 48, 48),
        voxel_size=0.008,
        node_coverage=0.035,
        max_nodes=256,
        max_points=2048,
        max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=0.035, min_neighbors=2),
        nicp=NICPConfig(iters=40, w_motion=0.0, lr=0.02),
        use_motion_model=False,
        solver="gn_dense",
        min_cluster_matches=min_cluster_matches,
    )
    fusion = DynamicFusion(seq, cfg)
    fusion.initialize(seq.load(0))
    clusters = np.asarray(fusion.node_clusters)[: fusion.node_count]
    assert len(np.unique(clusters)) >= 2, "fixture must build 2 components"
    fusion.register_frame(seq.load(1))
    nodes = np.asarray(fusion.nodes)[: fusion.node_count]
    t = np.asarray(fusion.warp.translations)[: fusion.node_count]
    is_b = nodes[:, 0] > 0.0
    return t, is_b


class TestTwoComponentFreeze:
    def test_starved_component_freezes_instead_of_drifting(self):
        t_off, is_b = run_two_component(0.0)
        t_on, is_b2 = run_two_component(400.0)
        # without the filter, B's sliver of +2 cm garbage association
        # drags its component
        drift_off = float(np.abs(t_off[is_b]).max())
        drift_on = float(np.abs(t_on[is_b2]).max())
        assert drift_off > 5e-3, drift_off
        assert drift_on < 1e-6, drift_on  # frozen exactly
        # sphere A keeps tracking in both runs (its cluster is healthy)
        track_on = float(np.abs(t_on[~is_b2]).max())
        assert track_on > 1e-3, track_on
