"""Sparse bricked TSDF (fusion/bricks.py): equivalence vs the dense
volume on the active region, activation coverage, remap persistence,
and the bricked pipeline end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion import bricks as BR
from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.geometry.camera import Intrinsics


INTR = Intrinsics(fx=90.0, fy=90.0, cx=32.0, cy=32.0)


def sphere_depth(h=64, w=64, r=0.08, z0=0.5):
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    x = (u - INTR.cx) / INTR.fx
    y = (v - INTR.cy) / INTR.fy
    # ray through pixel hits sphere centered (0,0,z0)
    a = x * x + y * y + 1.0
    b = -2.0 * z0
    c = z0 * z0 - r * r
    disc = b * b - 4 * a * c
    hit = disc > 0
    z = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a), 0.0)
    return z.astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    depth = sphere_depth()
    color = np.full(depth.shape + (3,), 128.0, np.float32)
    vol_dim = (48, 48, 48)
    voxel_size = 0.006
    trunc = 4 * voxel_size
    origin = T.volume_bounds_from_frame(depth, INTR, vol_dim, voxel_size)
    cfg = T.TSDFConfig(
        vol_dim=vol_dim, voxel_size=voxel_size, trunc_margin=trunc
    )
    grid = BR.BrickGrid(
        vol_dim=vol_dim, voxel_size=voxel_size, brick=8, max_bricks=256
    )
    return depth, color, cfg, grid, origin


def test_activation_covers_truncation_band(setup):
    depth, color, cfg, grid, origin = setup
    ids = BR.active_bricks_from_depth(
        grid, origin, depth, INTR, cfg.trunc_margin, dilate=0
    )
    assert 0 < len(ids) <= grid.max_bricks
    # every voxel the dense integrate updates must lie in an active brick
    dense = T.create_volume(cfg, origin)
    vox = T.voxel_world_points(cfg, dense.origin)
    dense = T.integrate(
        cfg, dense, vox, jnp.ones(vox.shape[0], bool),
        jnp.asarray(depth), jnp.asarray(color), INTR,
    )
    # every SURFACE-influencing voxel (inside the truncation band, i.e.
    # |tsdf| < 1 after observation) must lie in an active brick. Free
    # space voxels (weight > 0 but tsdf == 1) are deliberately not
    # covered: outside bricks they carry no geometric information
    # (voxel-hashing semantics; carving still happens inside active
    # bricks where ghost geometry could exist).
    w = np.asarray(dense.weight)
    tz = np.asarray(dense.tsdf)
    band = (w > 0) & (np.abs(tz) < 1.0 - 1e-6)
    updated = np.argwhere(band)
    b = updated // grid.brick
    GX, GY, GZ = grid.grid_dim
    lin = b[:, 0] * GY * GZ + b[:, 1] * GZ + b[:, 2]
    missing = np.setdiff1d(np.unique(lin), ids)
    assert missing.size == 0, f"{missing.size} band bricks not active"
    # and the active set is a small fraction of the volume
    assert len(ids) < 0.55 * GX * GY * GZ


def test_brick_integrate_matches_dense(setup):
    depth, color, cfg, grid, origin = setup
    # dense
    dense = T.create_volume(cfg, origin)
    vox = T.voxel_world_points(cfg, dense.origin)
    dense = T.integrate(
        cfg, dense, vox, jnp.ones(vox.shape[0], bool),
        jnp.asarray(depth), jnp.asarray(color), INTR,
    )
    # bricked
    ids = BR.active_bricks_from_depth(
        grid, origin, depth, INTR, cfg.trunc_margin, dilate=1
    )
    packed = BR.pack_brick_ids(grid, ids)
    st = BR.create_brick_volume(grid, origin)
    bvox, bvalid = BR.brick_voxel_points(grid, origin, packed)
    st = T.integrate(
        cfg, st, jnp.asarray(bvox), jnp.asarray(bvalid),
        jnp.asarray(depth), jnp.asarray(color), INTR,
    )
    tsdf_d, w_d = BR.scatter_to_dense(
        grid, packed, np.asarray(st.tsdf), np.asarray(st.weight)
    )
    # inside active bricks the two volumes are identical
    GX, GY, GZ = grid.grid_dim
    B = grid.brick
    brick_mask = np.zeros(grid.grid_dim, bool)
    gx = ids // (GY * GZ)
    gy = (ids // GZ) % GY
    gz = ids % GZ
    brick_mask[gx, gy, gz] = True
    vox_mask = np.repeat(
        np.repeat(np.repeat(brick_mask, B, 0), B, 1), B, 2
    )[: cfg.vol_dim[0], : cfg.vol_dim[1], : cfg.vol_dim[2]]
    np.testing.assert_allclose(
        w_d[vox_mask], np.asarray(dense.weight)[vox_mask], atol=1e-6
    )
    np.testing.assert_allclose(
        tsdf_d[vox_mask], np.asarray(dense.tsdf)[vox_mask], atol=1e-6
    )
    # and every surface voxel of the dense volume is covered
    band = (np.asarray(dense.weight) > 0) & (
        np.abs(np.asarray(dense.tsdf)) < 1.0 - 1e-6
    )
    assert np.all(vox_mask[band])


def test_remap_preserves_data(setup):
    depth, color, cfg, grid, origin = setup
    ids = BR.active_bricks_from_depth(
        grid, origin, depth, INTR, cfg.trunc_margin, dilate=0
    )
    packed = BR.pack_brick_ids(grid, ids)
    st = BR.create_brick_volume(grid, origin)
    bvox, bvalid = BR.brick_voxel_points(grid, origin, packed)
    st = T.integrate(
        cfg, st, jnp.asarray(bvox), jnp.asarray(bvalid),
        jnp.asarray(depth), jnp.asarray(color), INTR,
    )
    # add some bricks (dilated set), keep the old ones
    ids2 = BR.active_bricks_from_depth(
        grid, origin, depth, INTR, cfg.trunc_margin, dilate=1
    )
    packed2 = BR.pack_brick_ids(grid, np.union1d(ids, ids2))
    perm = BR.remap_slots(packed, packed2)
    st2 = BR.apply_remap(st, perm)
    d1, w1 = BR.scatter_to_dense(
        grid, packed, np.asarray(st.tsdf), np.asarray(st.weight)
    )
    d2, w2 = BR.scatter_to_dense(
        grid, packed2, np.asarray(st2.tsdf), np.asarray(st2.weight)
    )
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(d1[w1 > 0], d2[w2 > 0])


def test_truncated_region_mask_np_matches_device(setup):
    depth, color, cfg, grid, origin = setup
    dense = T.create_volume(cfg, origin)
    vox = T.voxel_world_points(cfg, dense.origin)
    dense = T.integrate(
        cfg, dense, vox, jnp.ones(vox.shape[0], bool),
        jnp.asarray(depth), jnp.asarray(color), INTR,
    )
    want = np.asarray(
        T.truncated_region_mask(dense.tsdf, dense.weight)
    ).astype(np.uint8)
    got = BR.truncated_region_mask_np(
        np.asarray(dense.tsdf), np.asarray(dense.weight)
    )
    np.testing.assert_array_equal(got, want)


def test_bricked_pipeline_e2e(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_fusion_e2e import make_sequence

    from occlusionfusion_tpu.fusion.pipeline import (
        DynamicFusion,
        FusionConfig,
    )
    from occlusionfusion_tpu.graph.edgraph import GraphConfig
    from occlusionfusion_tpu.solvers.nicp import NICPConfig

    seq, _ = make_sequence(n_frames=6)
    common = dict(
        vol_dim=(48, 48, 48), voxel_size=0.008, node_coverage=0.03,
        max_nodes=128, max_points=2048, max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=0.03, min_neighbors=2),
        nicp=NICPConfig(iters=30, w_motion=0.0, lr=0.02),
        use_motion_model=False,
    )
    dense = DynamicFusion(seq, FusionConfig(**common))
    brick = DynamicFusion(
        seq, FusionConfig(**common, brick_size=8, max_bricks=256)
    )
    dense.initialize(seq.load(0))
    brick.initialize(seq.load(0))
    for i in range(1, 5):
        di = dense.register_frame(seq.load(i))
        bi = brick.register_frame(seq.load(i))
        assert bi["n_correspondences"] > 0.9 * di["n_correspondences"]
        assert np.isfinite(bi["final_loss"])
    # deformed meshes agree (same surface reconstructed)
    vd, _ = dense.get_deformed_mesh()
    vb, _ = brick.get_deformed_mesh()
    # mesh vertex sets match to voxel scale: compare median NN distance
    from occlusionfusion_tpu.ops.knn import knn

    d, _ = knn(jnp.asarray(vb), jnp.asarray(vd), k=1)
    assert float(jnp.median(jnp.sqrt(d))) < 0.008


def test_save_resume_state(tmp_path):
    """Interrupted run + resume must match the uninterrupted run."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_fusion_e2e import make_sequence

    from occlusionfusion_tpu.fusion.pipeline import (
        DynamicFusion,
        FusionConfig,
    )
    from occlusionfusion_tpu.graph.edgraph import GraphConfig
    from occlusionfusion_tpu.solvers.nicp import NICPConfig

    seq, _ = make_sequence(n_frames=6)
    for brick in (0, 8):
        cfg = FusionConfig(
            vol_dim=(48, 48, 48), voxel_size=0.008, node_coverage=0.03,
            max_nodes=128, max_points=2048, max_depth_diff=0.05,
            graph=GraphConfig(node_coverage=0.03, min_neighbors=2),
            nicp=NICPConfig(iters=30, w_motion=0.0, lr=0.02),
            use_motion_model=False, brick_size=brick, max_bricks=256,
        )
        full = DynamicFusion(seq, cfg)
        full.initialize(seq.load(0))
        for i in range(1, 5):
            full.register_frame(seq.load(i))

        first = DynamicFusion(seq, cfg)
        first.initialize(seq.load(0))
        for i in range(1, 3):
            first.register_frame(seq.load(i))
        snap = str(tmp_path / f"state_{brick}.npz")
        first.save_state(snap)

        resumed = DynamicFusion(seq, cfg)
        resumed.load_state(snap)
        assert resumed.frame_id == 2
        for i in range(3, 5):
            resumed.register_frame(seq.load(i))

        np.testing.assert_allclose(
            np.asarray(resumed.warp.translations),
            np.asarray(full.warp.translations),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(resumed.tsdf.tsdf),
            np.asarray(full.tsdf.tsdf),
            atol=1e-5,
        )
