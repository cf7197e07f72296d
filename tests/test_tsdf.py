"""TSDF volume tests with closed-form depth fixtures (flat wall / sphere),
in the spirit of the reference's integration_test.py but hermetic."""

import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.fusion import warpfield as W


INTR = Intrinsics(
    jnp.float32(100.0), jnp.float32(100.0), jnp.float32(32.0), jnp.float32(32.0)
)


def make_volume(dim=(32, 32, 32), voxel_size=0.02, origin=(-0.32, -0.32, 0.7)):
    cfg = T.TSDFConfig(vol_dim=dim, voxel_size=voxel_size,
                       trunc_margin=4 * voxel_size, ray_multiplier=False)
    state = T.create_volume(cfg, origin)
    return cfg, state


def wall_depth(h=64, w=64, z=1.0):
    return jnp.full((h, w), z, jnp.float32)


class TestIntegrateWall:
    def test_zero_crossing_at_wall(self):
        cfg, state = make_volume()
        pts = T.voxel_world_points(cfg, state.origin)
        valid = jnp.ones(pts.shape[0], bool)
        depth = wall_depth(z=1.0)
        color = jnp.full((64, 64, 3), 128.0)
        state = T.integrate(cfg, state, pts, valid, depth, color, INTR)

        tsdf = np.asarray(state.tsdf)
        weight = np.asarray(state.weight)
        zs = np.asarray(state.origin)[2] + np.arange(32) * cfg.voxel_size
        # mid column voxels (x=y= center index 16) project near principal point
        col = tsdf[16, 16, :]
        wcol = weight[16, 16, :]
        for i, z in enumerate(zs):
            diff = 1.0 - z
            if diff < -cfg.trunc_margin:
                assert wcol[i] == 0.0, f"voxel behind trunc updated at z={z}"
            else:
                expected = min(1.0, diff / cfg.trunc_margin)
                assert wcol[i] == 1.0
                np.testing.assert_allclose(col[i], expected, atol=1e-5)

    def test_running_average(self):
        cfg, state = make_volume()
        pts = T.voxel_world_points(cfg, state.origin)
        valid = jnp.ones(pts.shape[0], bool)
        color_a = jnp.full((64, 64, 3), 100.0)
        color_b = jnp.full((64, 64, 3), 200.0)
        state = T.integrate(cfg, state, pts, valid, wall_depth(), color_a, INTR)
        state = T.integrate(cfg, state, pts, valid, wall_depth(), color_b, INTR)
        # any observed voxel has weight 2 and color 150
        w = np.asarray(state.weight)
        c = np.asarray(state.color)
        obs = w > 0
        assert obs.any()
        assert (w[obs] == 2.0).all()
        np.testing.assert_allclose(c[obs], 150.0, atol=1.0)

    def test_invalid_warp_points_skipped(self):
        cfg, state = make_volume()
        pts = T.voxel_world_points(cfg, state.origin)
        valid = jnp.zeros(pts.shape[0], bool)
        state = T.integrate(
            cfg, state, pts, valid, wall_depth(), jnp.zeros((64, 64, 3)), INTR
        )
        assert float(jnp.sum(state.weight)) == 0.0

    def test_warped_integration_shifts_surface(self):
        # warping voxels +0.1 z before integrating a wall at 1.0 is the same
        # as integrating a wall at 0.9 without warp
        cfg, state_a = make_volume()
        pts = T.voxel_world_points(cfg, state_a.origin)
        valid = jnp.ones(pts.shape[0], bool)
        shifted = pts + jnp.array([0.0, 0.0, 0.1])
        state_a = T.integrate(
            cfg, state_a, shifted, valid, wall_depth(z=1.0),
            jnp.zeros((64, 64, 3)), INTR,
        )
        _, state_b = make_volume()
        state_b = T.integrate(
            cfg, state_b, pts, valid, wall_depth(z=0.9),
            jnp.zeros((64, 64, 3)), INTR,
        )
        # compare the interior only: edge voxels can fall in/out of the
        # frustum depending on their projected (shifted) position
        np.testing.assert_allclose(
            np.asarray(state_a.tsdf)[8:24, 8:24, :],
            np.asarray(state_b.tsdf)[8:24, 8:24, :],
            atol=1e-5,
        )


class TestVisibility:
    def test_front_visible_behind_invisible(self):
        depth = wall_depth(z=1.0)
        pts = jnp.array(
            [
                [0.0, 0.0, 0.5],   # in front -> visible
                [0.0, 0.0, 1.02],  # just behind within trunc -> visible
                [0.0, 0.0, 1.5],   # far behind -> occluded
                [0.0, 0.0, -1.0],  # behind camera -> not visible
            ]
        )
        vis, diff = T.check_visibility(pts, depth, INTR, trunc_margin=0.08)
        assert bool(vis[0]) and bool(vis[1])
        assert not bool(vis[2])
        assert not bool(vis[3])


class TestTruncatedRegionMask:
    def test_crossing_detected(self):
        tsdf = jnp.ones((8, 8, 8))
        tsdf = tsdf.at[:, :, 4:].set(-1.0)
        weight = jnp.ones((8, 8, 8))
        mask = T.truncated_region_mask(tsdf, weight)
        m = np.asarray(mask)
        assert m[:, :, 3:5].all()  # adjacent to the crossing
        assert not m[:, :, 0].any()  # far from it
        assert not m[:, :, 7].any()

    def test_unobserved_excluded(self):
        tsdf = jnp.ones((4, 4, 4)).at[:, :, 2:].set(-1.0)
        weight = jnp.zeros((4, 4, 4))
        mask = T.truncated_region_mask(tsdf, weight)
        assert not np.asarray(mask).any()


class TestWarpField:
    def test_identity_warpfield_noop(self):
        nodes = jnp.array([[0.0, 0, 1.0], [0.1, 0, 1.0]])
        wf = W.create_warpfield(nodes, jnp.array([True, True]))
        pts = jnp.array([[0.05, 0.0, 1.0], [5.0, 5.0, 5.0]])
        table = W.skin(wf, pts, node_coverage=0.05)
        out = W.deform_points(wf, pts, table)
        np.testing.assert_allclose(out, pts, atol=1e-6)
        # far point is unreachable but passes through
        assert not bool(table.valid[1])

    def test_translation_applied(self):
        nodes = jnp.array([[0.0, 0, 1.0], [0.1, 0, 1.0]])
        wf = W.create_warpfield(nodes, jnp.array([True, True]))
        wf = W.update_transforms(
            wf,
            wf.rotations,
            jnp.broadcast_to(jnp.array([0.0, 0.0, 0.1]), (2, 3)),
        )
        pts = jnp.array([[0.05, 0.0, 1.0]])
        table = W.skin(wf, pts, node_coverage=0.05)
        out = W.deform_points(wf, pts, table)
        np.testing.assert_allclose(out[0], pts[0] + jnp.array([0, 0, 0.1]), atol=1e-5)
        np.testing.assert_allclose(
            wf.deformed_nodes, nodes + jnp.array([0, 0, 0.1]), atol=1e-6
        )

    def test_origin_form_roundtrip(self):
        import jax

        key = jax.random.PRNGKey(0)
        from occlusionfusion_tpu.geometry import so3_exp

        nodes = jax.random.normal(key, (5, 3))
        wf = W.create_warpfield(nodes, jnp.ones(5, bool))
        R = so3_exp(jax.random.normal(jax.random.PRNGKey(1), (5, 3)))
        t = jax.random.normal(jax.random.PRNGKey(2), (5, 3)) * 0.1
        wf = W.update_transforms(wf, R, t)
        R2, t_origin = W.to_origin_form(wf)
        R3, t_back = W.from_origin_form(nodes, R2, t_origin)
        np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), atol=1e-5)

    def test_origin_form_matches_unpivoted_warp(self):
        """y = R x + t_origin must equal the pivoted ED warp — the identity
        the reference's deform_lbs relies on (warpfield.py:225)."""
        import jax

        from occlusionfusion_tpu.geometry import so3_exp

        nodes = jax.random.normal(jax.random.PRNGKey(3), (6, 3))
        wf = W.create_warpfield(nodes, jnp.ones(6, bool))
        R = so3_exp(jax.random.normal(jax.random.PRNGKey(4), (6, 3)) * 0.5)
        t = jax.random.normal(jax.random.PRNGKey(5), (6, 3)) * 0.1
        wf = W.update_transforms(wf, R, t)
        pts = jax.random.normal(jax.random.PRNGKey(6), (20, 3)) * 0.5
        table = W.skin(wf, pts, node_coverage=2.0)
        got = W.deform_points(wf, pts, table)

        _, t_origin = W.to_origin_form(wf)
        Rg = np.einsum("nij,pj->pni", np.asarray(R), np.asarray(pts))
        to = np.asarray(t_origin)
        anch = np.asarray(table.anchors)
        wts = np.asarray(table.weights)
        want = np.zeros((20, 3))
        for p in range(20):
            for k in range(4):
                a = anch[p, k]
                want[p] += wts[p, k] * (Rg[p, a] + to[a])
        valid = np.asarray(table.valid)
        np.testing.assert_allclose(np.asarray(got)[valid], want[valid], atol=1e-4)


class TestShardedIntegrate:
    def test_sharded_equals_single_device(self):
        """TSDF integrate sharded along the x voxel axis must equal the
        unsharded result (the per-voxel math has no cross-voxel term)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if len(jax.devices()) < 2:
            import pytest

            pytest.skip("needs multiple devices")
        from occlusionfusion_tpu.parallel.mesh import make_fusion_mesh

        mesh = make_fusion_mesh(8)
        cfg, state = make_volume()
        pts = T.voxel_world_points(cfg, state.origin)
        valid = jnp.ones(pts.shape[0], bool)
        depth = wall_depth(z=1.0)
        color = jnp.full((64, 64, 3), 90.0)
        plain = T.integrate(cfg, state, pts, valid, depth, color, INTR)

        _, state2 = make_volume()
        vol_s = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state2 = T.TSDFState(
            tsdf=jax.device_put(state2.tsdf, vol_s),
            weight=jax.device_put(state2.weight, vol_s),
            color=jax.device_put(state2.color, vol_s),
            origin=jax.device_put(state2.origin, repl),
        )
        sharded = T.integrate(
            cfg, state2, pts, valid,
            jax.device_put(depth, repl), jax.device_put(color, repl), INTR,
        )
        np.testing.assert_allclose(
            np.asarray(sharded.tsdf), np.asarray(plain.tsdf), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sharded.weight), np.asarray(plain.weight), atol=1e-6
        )
