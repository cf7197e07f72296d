"""TSDF voxel volume — resident, statically-shaped JAX state.

TPU-native re-design of the reference ``fusion_with_occlusion/tsdf.py``
(``TSDFVolume``): the truncated signed-distance volume, its weighted
running-average integration through the warp field, and visibility
queries. The reference keeps the volume on the GPU behind a hand-written
PyCUDA kernel (``tsdf.py:192-288``) with numba CPU fallbacks
(``tsdf.py:338-376``); here the volume is a pure pytree carried through a
jitted step, integration is one fused elementwise pipeline over all
voxels (XLA maps it onto the VPU; the per-voxel warp gathers ride the
same fusion), and color is stored as 3 f32 channels instead of the
packed b*65536+g*256+r float.

Semantics (kept bit-compatible with the reference kernel unless noted):
  * camera model: world == camera frame (the fusion pipeline uses an
    identity camera pose, ``fusion.py:112``); nearest-pixel depth lookup
    with round() (the reference GPU kernel adds a +0.5 quirk before
    rounding, ``tsdf.py:245-246``, while its CPU path rounds plainly,
    ``tsdf.py:361-363``; we follow the CPU form).
  * ray-length multiplier sqrt(1 + ((px-cx)/fx)^2 + ((py-cy)/fy)^2)
    applied to depth-z difference (``tsdf.py:259-263``), config-gated.
  * voxels update iff: in frustum, depth > 0, diff >= -trunc_margin and
    the warp marked them reachable; dist = min(1, diff/trunc).
  * color: per-channel weighted running average, rounded and clamped to
    255 each step, exactly like ``tsdf.py:276-287``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.geometry.camera import Intrinsics


class TSDFConfig(NamedTuple):
    vol_dim: tuple[int, int, int]
    voxel_size: float
    trunc_margin: float  # reference default: 4 * voxel_size? (tsdf.py:127)
    ray_multiplier: bool = True


class TSDFState(NamedTuple):
    """The volume pytree (all [X, Y, Z] or [X, Y, Z, 3])."""

    tsdf: jnp.ndarray
    weight: jnp.ndarray
    color: jnp.ndarray
    origin: jnp.ndarray  # [3] world position of voxel (0,0,0) center


def create_volume(config: TSDFConfig, origin) -> TSDFState:
    X, Y, Z = config.vol_dim
    return TSDFState(
        tsdf=jnp.ones((X, Y, Z), jnp.float32),
        weight=jnp.zeros((X, Y, Z), jnp.float32),
        color=jnp.zeros((X, Y, Z, 3), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
    )


def volume_bounds_from_frame(
    depth: np.ndarray, intr: Intrinsics, vol_dim, voxel_size: float
):
    """Choose the volume origin so the grid covers the observed points,
    mirroring the view-frustum-derived bounds of ``tsdf.py:75-129``."""
    H, W = depth.shape
    v, u = np.mgrid[0:H, 0:W]
    d = np.asarray(depth)
    valid = d > 0
    x = (u - float(intr.cx)) / float(intr.fx) * d
    y = (v - float(intr.cy)) / float(intr.fy) * d
    pts = np.stack([x[valid], y[valid], d[valid]], -1)
    lo = pts.min(0)
    hi = pts.max(0)
    extent = np.asarray(vol_dim) * voxel_size
    center = (lo + hi) / 2
    return center - extent / 2


def voxel_world_points(config: TSDFConfig, origin: jnp.ndarray) -> jnp.ndarray:
    """[V, 3] canonical world positions of all voxel centers."""
    X, Y, Z = config.vol_dim
    xs = jnp.arange(X, dtype=jnp.float32)
    ys = jnp.arange(Y, dtype=jnp.float32)
    zs = jnp.arange(Z, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    return (origin + grid * config.voxel_size).reshape(-1, 3)


def project_to_depth(
    points: jnp.ndarray,
    depth_im: jnp.ndarray,
    intr: Intrinsics,
):
    """Nearest-pixel depth lookup for [P, 3] camera-frame points.

    Returns (depth_val [P], px [P], py [P], in_frustum [P]).
    Mirrors ``tsdf.py:577-598`` (get_depth_from_image).
    """
    H, W = depth_im.shape
    z = points[:, 2]
    zs = jnp.where(z > 0, z, 1.0)
    px = jnp.round(points[:, 0] / zs * intr.fx + intr.cx).astype(jnp.int32)
    py = jnp.round(points[:, 1] / zs * intr.fy + intr.cy).astype(jnp.int32)
    in_frustum = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)
    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    # flat 1-D gather (measured ~2.6x cheaper than depth_im[pyc, pxc])
    depth_val = jnp.where(
        in_frustum, depth_im.reshape(-1)[pyc * W + pxc], 0.0
    )
    return depth_val, pxc, pyc, in_frustum


def check_visibility(
    points: jnp.ndarray,
    depth_im: jnp.ndarray,
    intr: Intrinsics,
    trunc_margin: float,
):
    """visible = depth > 0 and (depth - z) >= -trunc_margin
    (``tsdf.py:599-612``). Returns (visible [P], depth_diff [P])."""
    depth_val, _, _, _ = project_to_depth(points, depth_im, intr)
    depth_diff = depth_val - points[:, 2]
    visible = (depth_val > 0) & (depth_diff >= -trunc_margin)
    return visible, depth_diff


@functools.partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def integrate(
    config: TSDFConfig,
    state: TSDFState,
    warped_points: jnp.ndarray,  # [V, 3] voxel centers after warp
    warp_valid: jnp.ndarray,  # [V] reachability from the warp field
    depth_im: jnp.ndarray,  # [H, W] meters
    color_im: jnp.ndarray,  # [H, W, 3] 0..255
    intr: Intrinsics,
    obs_weight: float = 1.0,
) -> TSDFState:
    """Fused warp-aware TSDF integration over the whole volume."""
    trunc = config.trunc_margin
    # ONE flat-indexed random-access gather for depth+RGB: the per-voxel
    # pixel gather is the dominant integrate cost on TPU. Measured at
    # 64^3 (262k voxels): two separate [py, px] gathers 5.2 ms; one
    # packed 4-channel [py, px] gather 1.8 ms; one 2-channel gather with
    # a precomputed flat index py*W+px 0.7 ms. Color rides as the
    # reference's own packed float (b*65536 + g*256 + r, exact in f32
    # for u8 channels — tsdf.py:276-287); inputs are rounded to the u8
    # lattice first (identity for real camera data).
    H, W = depth_im.shape
    z = warped_points[:, 2]
    zs = jnp.where(z > 0, z, 1.0)
    px = jnp.round(warped_points[:, 0] / zs * intr.fx + intr.cx).astype(
        jnp.int32
    )
    py = jnp.round(warped_points[:, 1] / zs * intr.fy + intr.cy).astype(
        jnp.int32
    )
    in_frustum = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z > 0)
    px = jnp.clip(px, 0, W - 1)
    py = jnp.clip(py, 0, H - 1)
    cr = jnp.round(color_im)
    packed_col = cr[..., 0] + cr[..., 1] * 256.0 + cr[..., 2] * 65536.0
    rgbd_tab = jnp.stack(
        [depth_im.reshape(-1), packed_col.reshape(-1)], axis=-1
    )  # [H*W, 2]
    rgbd = rgbd_tab[py * W + px]  # [V, 2]
    depth_val = jnp.where(in_frustum, rgbd[:, 0], 0.0)
    diff = depth_val - z
    if config.ray_multiplier:
        mx = (px.astype(jnp.float32) - intr.cx) / intr.fx
        my = (py.astype(jnp.float32) - intr.cy) / intr.fy
        diff = diff * jnp.sqrt(1.0 + mx * mx + my * my)
    update = (
        warp_valid
        & in_frustum
        & (depth_val > 0)
        & (diff >= -trunc)
    )
    dist = jnp.minimum(1.0, diff / trunc)

    shape3 = state.tsdf.shape
    upd = update.reshape(shape3)
    w_old = state.weight
    w_add = jnp.where(upd, obs_weight, 0.0)
    w_new = w_old + w_add
    w_safe = jnp.maximum(w_new, 1e-12)
    tsdf_new = jnp.where(
        upd,
        (state.tsdf * w_old + w_add * dist.reshape(shape3)) / w_safe,
        state.tsdf,
    )
    p = rgbd[:, 1]
    red = jnp.mod(p, 256.0)
    rem = jnp.floor(p / 256.0)
    grn = jnp.mod(rem, 256.0)
    blu = jnp.floor(rem / 256.0)
    sampled = jnp.stack([red, grn, blu], axis=-1).reshape(shape3 + (3,))
    color_new = jnp.where(
        upd[..., None],
        jnp.minimum(
            jnp.round(
                (state.color * w_old[..., None] + w_add[..., None] * sampled)
                / w_safe[..., None]
            ),
            255.0,
        ),
        state.color,
    )
    return TSDFState(
        tsdf=tsdf_new, weight=w_new, color=color_new, origin=state.origin
    )


def truncated_region_mask(tsdf: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Mask of voxels near the zero crossing with observed weight, used to
    restrict marching cubes to observed surface (``tsdf.py:704-745``).

    A voxel participates if it was observed and some voxel in its 3^3
    neighborhood has opposite TSDF sign (a 3x3x3 stencil —
    ``lax.reduce_window`` min/max).
    """
    observed = weight > 0
    big = jnp.where(observed, tsdf, jnp.inf)
    small = jnp.where(observed, tsdf, -jnp.inf)
    dims = (3, 3, 3)
    ones = (1, 1, 1)
    nb_min = jax.lax.reduce_window(
        big, jnp.inf, jax.lax.min, dims, ones, "SAME"
    )
    nb_max = jax.lax.reduce_window(
        small, -jnp.inf, jax.lax.max, dims, ones, "SAME"
    )
    crossing = (nb_min <= 0.0) & (nb_max >= 0.0)
    return observed & crossing
