"""Ground-truth derivation helpers for neural-tracking training.

Mirrors ``utils/nnutils.py:151-244`` (mask ground truth + deformed
ground truth): given a source RGB-XYZ frame, GT scene flow and the
target frame, derive (a) the binary mask-training target — pixels whose
flowed position lands on observed, depth-consistent target geometry —
and (b) the deformed-GT point image the warp loss supervises against.
"""

from __future__ import annotations

import jax.numpy as jnp

from occlusionfusion_tpu.geometry.camera import Intrinsics, bilinear_sample


def deformed_gt_points(
    source_xyz: jnp.ndarray,  # [H, W, 3]
    scene_flow: jnp.ndarray,  # [H, W, 3] GT 3D flow
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GT deformed positions + validity (source depth > 0)."""
    valid = source_xyz[..., 2] > 0
    out = jnp.where(valid[..., None], source_xyz + scene_flow, 0.0)
    return out, valid


def mask_gt(
    source_xyz: jnp.ndarray,  # [H, W, 3]
    scene_flow: jnp.ndarray,  # [H, W, 3]
    target_xyz: jnp.ndarray,  # [H, W, 3]
    intr: Intrinsics,
    max_depth_diff: float = 0.05,
) -> jnp.ndarray:
    """Binary correspondence-mask target [H, W]:

    a source pixel is positive iff it has depth, its GT-flowed 3D
    position projects inside the image, and the target's observed depth
    there agrees within ``max_depth_diff`` (the visibility criterion of
    ``utils/nnutils.py:151-244``).
    """
    H, W, _ = source_xyz.shape
    deformed, src_valid = deformed_gt_points(source_xyz, scene_flow)
    z = jnp.maximum(deformed[..., 2], 1e-6)
    u = deformed[..., 0] / z * intr.fx + intr.cx
    v = deformed[..., 1] / z * intr.fy + intr.cy
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    uv = jnp.stack([u, v], -1).reshape(-1, 2)
    tgt_depth = bilinear_sample(target_xyz[..., 2:3], uv).reshape(H, W)
    agree = jnp.abs(tgt_depth - deformed[..., 2]) < max_depth_diff
    return src_valid & inb & (tgt_depth > 0) & agree
