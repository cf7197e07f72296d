"""Sparse bricked TSDF: allocate only bricks near observed surface.

The reference allocates the full dense voxel grid (``tsdf.py:75-129``;
128^3 = 2M voxels at its defaults) and integrates every voxel every
frame. At that scale the per-frame warp+integrate is >90% wasted work —
only voxels within the truncation band of the surface ever change. This
module partitions the virtual volume into B^3-voxel bricks and keeps a
*static-capacity* table of active bricks (TPU-friendly: all shapes are
fixed at ``max_bricks``); the TSDF state pytree simply becomes
``[MB, B, B, B]`` instead of ``[X, Y, Z]``, which the fused integrate /
warp path consumes unchanged (it is shape-agnostic over the voxel set).

Activation is a host-side decision (numpy, cheap: the brick grid is
~16^3) made at initialization and keyframes — the same cadence as graph
rebuilds: a brick is active when its center lies within
``trunc + brick diagonal`` of an observed depth point, dilated by
``dilate`` bricks to cover inter-keyframe motion. Between keyframes the
active set is frozen; observations landing outside it are dropped for
those frames exactly like observations leaving the reference's fixed
volume bounds.

Brick ids are linear indices into the virtual brick grid
(``bx * GY * GZ + by * GZ + bz``); free slots carry id -1, their voxels
are masked invalid, and their dummy positions sit at the volume origin.

Documented deviation from the dense reference volume: free-space voxels
far in front of the surface are not allocated, so they never accumulate
observation weight (the dense path marks them observed with tsdf == 1 —
no geometric information). Space carving still happens wherever it can
matter: any brick that ever held surface stays active, so ghost geometry
inside it is carved back to +1 by later observations, exactly like the
dense path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.fusion.tsdf import TSDFState
from occlusionfusion_tpu.geometry.camera import Intrinsics


class BrickGrid(NamedTuple):
    """Static brick-grid geometry (python ints — jit-safe constants)."""

    vol_dim: tuple  # virtual voxel grid (X, Y, Z)
    voxel_size: float
    brick: int  # voxels per brick edge
    max_bricks: int  # static slot capacity

    @property
    def grid_dim(self):
        b = self.brick
        return tuple(-(-d // b) for d in self.vol_dim)


def _backproject_valid(depth: np.ndarray, intr: Intrinsics):
    H, W = depth.shape
    v, u = np.mgrid[0:H, 0:W]
    d = np.asarray(depth)
    valid = d > 0
    x = (u - float(intr.cx)) / float(intr.fx) * d
    y = (v - float(intr.cy)) / float(intr.fy) * d
    return np.stack([x[valid], y[valid], d[valid]], -1)


def active_bricks_from_points(
    grid: BrickGrid,
    origin: np.ndarray,
    points: np.ndarray,
    trunc: float,
    dilate: int = 1,
) -> np.ndarray:
    """Sorted linear ids of bricks within the truncation band of any of
    the given world points, dilated by ``dilate`` bricks (26-neighborhood
    per step) to absorb inter-keyframe motion."""
    GX, GY, GZ = grid.grid_dim
    bs = grid.brick * grid.voxel_size
    occ = np.zeros((GX, GY, GZ), bool)
    if len(points):
        # bricks whose *box* intersects sphere(p, trunc): conservative
        # via covering the trunc-inflated AABB of each point
        r = trunc
        lo = np.floor((points - origin - r) / bs).astype(np.int64)
        hi = np.floor((points - origin + r) / bs).astype(np.int64)
        lo = np.clip(lo, 0, np.asarray([GX - 1, GY - 1, GZ - 1]))
        hi = np.clip(hi, 0, np.asarray([GX - 1, GY - 1, GZ - 1]))
        span = hi - lo  # per-axis 0..ceil(2r/bs)
        m = int(span.max()) + 1 if len(span) else 1
        for dx in range(m):
            for dy in range(m):
                for dz in range(m):
                    sel = (
                        (dx <= span[:, 0])
                        & (dy <= span[:, 1])
                        & (dz <= span[:, 2])
                    )
                    c = lo[sel] + np.asarray([dx, dy, dz])
                    occ[c[:, 0], c[:, 1], c[:, 2]] = True
    for _ in range(dilate):
        grown = occ.copy()
        grown[1:] |= occ[:-1]
        grown[:-1] |= occ[1:]
        grown[:, 1:] |= occ[:, :-1]
        grown[:, :-1] |= occ[:, 1:]
        grown[:, :, 1:] |= occ[:, :, :-1]
        grown[:, :, :-1] |= occ[:, :, 1:]
        occ = grown
    ids = np.flatnonzero(occ.reshape(-1)).astype(np.int32)
    return ids


def active_bricks_from_depth(
    grid: BrickGrid,
    origin: np.ndarray,
    depth: np.ndarray,
    intr: Intrinsics,
    trunc: float,
    dilate: int = 1,
) -> np.ndarray:
    return active_bricks_from_points(
        grid, origin, _backproject_valid(depth, intr), trunc, dilate
    )


def pack_brick_ids(grid: BrickGrid, ids: np.ndarray) -> np.ndarray:
    """[max_bricks] int32 slot table; -1 marks a free slot."""
    if len(ids) > grid.max_bricks:
        raise ValueError(
            f"{len(ids)} active bricks exceed max_bricks={grid.max_bricks}"
        )
    out = -np.ones(grid.max_bricks, np.int32)
    out[: len(ids)] = np.sort(ids)
    return out


def create_brick_volume(grid: BrickGrid, origin) -> TSDFState:
    B, MB = grid.brick, grid.max_bricks
    return TSDFState(
        tsdf=jnp.ones((MB, B, B, B), jnp.float32),
        weight=jnp.zeros((MB, B, B, B), jnp.float32),
        color=jnp.zeros((MB, B, B, B, 3), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
    )


def brick_voxel_points(
    grid: BrickGrid, origin: np.ndarray, brick_ids: np.ndarray
):
    """([MB*B^3, 3] f32 canonical voxel centers, [MB*B^3] bool valid).

    Free slots get dummy positions at the origin with valid=False; the
    layout matches the [MB, B, B, B] state raveled C-order, so
    ``integrate`` consumes these directly."""
    B = grid.brick
    GX, GY, GZ = grid.grid_dim
    ids = np.asarray(brick_ids, np.int64)
    slot_valid = ids >= 0
    safe = np.where(slot_valid, ids, 0)
    bx = safe // (GY * GZ)
    by = (safe // GZ) % GY
    bz = safe % GZ
    corner = np.stack([bx, by, bz], -1).astype(np.float32) * B  # [MB, 3] vox
    r = np.arange(B, dtype=np.float32)
    local = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    vox = (corner[:, None] + local[None]) * grid.voxel_size + np.asarray(
        origin, np.float32
    )
    vox = np.where(slot_valid[:, None, None], vox, np.asarray(origin))
    valid = np.repeat(slot_valid, B * B * B)
    return (
        vox.reshape(-1, 3).astype(np.float32),
        valid,
    )


def scatter_to_dense(
    grid: BrickGrid,
    brick_ids: np.ndarray,
    tsdf_bricks: np.ndarray,  # [MB, B, B, B]
    weight_bricks: np.ndarray,
    empty_tsdf: float = 1.0,
):
    """Host: expand the brick table to the dense virtual grid (for
    marching cubes / parity checks). Returns (tsdf, weight) dense."""
    B = grid.brick
    GX, GY, GZ = grid.grid_dim
    X, Y, Z = GX * B, GY * B, GZ * B
    tsdf = np.full((X, Y, Z), empty_tsdf, np.float32)
    weight = np.zeros((X, Y, Z), np.float32)
    ids = np.asarray(brick_ids)
    for slot, bid in enumerate(ids):
        if bid < 0:
            continue
        bx = bid // (GY * GZ)
        by = (bid // GZ) % GY
        bz = bid % GZ
        sx, sy, sz = bx * B, by * B, bz * B
        tsdf[sx : sx + B, sy : sy + B, sz : sz + B] = tsdf_bricks[slot]
        weight[sx : sx + B, sy : sy + B, sz : sz + B] = weight_bricks[slot]
    x, y, z = grid.vol_dim
    return tsdf[:x, :y, :z], weight[:x, :y, :z]


def truncated_region_mask_np(tsdf: np.ndarray, weight: np.ndarray):
    """Host twin of ``tsdf.truncated_region_mask`` (3^3 sign-crossing
    stencil over observed voxels) for the bricked mesh-extraction path
    — avoids compiling a dense-volume device program just for viz."""
    observed = weight > 0
    big = np.where(observed, tsdf, np.inf)
    small = np.where(observed, tsdf, -np.inf)
    def _axis_window(arr, ax, fill, op):
        # separable 3-wide window: both shifts taken from the SAME
        # snapshot (shifting the updated array would widen the window)
        up = np.roll(arr, 1, axis=ax)
        dn = np.roll(arr, -1, axis=ax)
        idx = [slice(None)] * 3
        idx[ax] = 0
        up[tuple(idx)] = fill
        idx[ax] = -1
        dn[tuple(idx)] = fill
        return op(op(arr, up), dn)

    nb_min = big
    nb_max = small
    for ax in range(3):
        nb_min = _axis_window(nb_min, ax, np.inf, np.minimum)
        nb_max = _axis_window(nb_max, ax, -np.inf, np.maximum)
    crossing = (nb_min <= 0.0) & (nb_max >= 0.0)
    return (observed & crossing).astype(np.uint8)


def remap_slots(
    old_ids: np.ndarray, new_ids: np.ndarray
) -> np.ndarray:
    """[MB] int32: for each new slot, the old slot holding the same brick
    (or -1 for freshly activated / free). Used to carry integrated data
    across a keyframe active-set refresh with one device gather."""
    lookup = {int(b): i for i, b in enumerate(np.asarray(old_ids)) if b >= 0}
    out = -np.ones(len(new_ids), np.int32)
    for i, b in enumerate(np.asarray(new_ids)):
        if b >= 0 and int(b) in lookup:
            out[i] = lookup[int(b)]
    return out


def apply_remap(state: TSDFState, perm: np.ndarray) -> TSDFState:
    """Device: carry brick data into the new slot layout (fresh slots
    reset to unobserved)."""
    perm_j = jnp.asarray(perm)
    safe = jnp.maximum(perm_j, 0)
    fresh = (perm_j < 0)[:, None, None, None]
    tsdf = jnp.where(fresh, 1.0, state.tsdf[safe])
    weight = jnp.where(fresh, 0.0, state.weight[safe])
    color = jnp.where(fresh[..., None], 0.0, state.color[safe])
    return TSDFState(
        tsdf=tsdf, weight=weight, color=color, origin=state.origin
    )
