"""Pinhole camera model: backprojection / projection, fully vectorized.

TPU-native replacement for the reference's C++ image ops
(``csrc/cpu/image_proc.cpp:351`` backproject_depth_ushort,
``NonRigidICP/model/geometry.py:44`` depth_2_pc): elementwise math over the
whole depth image, so XLA maps it straight onto the VPU with no host loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def from_matrix(K) -> "Intrinsics":
        K = jnp.asarray(K)
        return Intrinsics(K[0, 0], K[1, 1], K[0, 2], K[1, 2])

    def matrix(self) -> jnp.ndarray:
        fx = jnp.asarray(self.fx, dtype=jnp.float32)
        K = jnp.zeros((3, 3), dtype=fx.dtype)
        K = K.at[0, 0].set(self.fx).at[1, 1].set(self.fy)
        K = K.at[0, 2].set(self.cx).at[1, 2].set(self.cy).at[2, 2].set(1.0)
        return K


def backproject_depth(
    depth: jnp.ndarray, intr: Intrinsics, depth_scale: float = 1.0
) -> jnp.ndarray:
    """Depth image [H, W] -> point image [H, W, 3] in camera frame.

    Invalid (<= 0) depths produce (0, 0, 0), matching the reference's
    convention of zero points for missing depth.
    """
    H, W = depth.shape
    d = depth.astype(jnp.float32) * depth_scale
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    x = (u - intr.cx) / intr.fx * d
    y = (v - intr.cy) / intr.fy * d
    pts = jnp.stack([x, y, d], axis=-1)
    valid = (d > 0.0)[..., None]
    return jnp.where(valid, pts, 0.0)


def project_points(
    points: jnp.ndarray, intr: Intrinsics, eps: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 3] camera-frame points -> ([..., 2] (u, v) pixels, [...] valid).

    Points behind the camera are flagged invalid; their pixel coords are
    computed with a safe denominator so gradients stay finite.
    """
    z = points[..., 2]
    valid = z > eps
    zs = jnp.where(valid, z, 1.0)
    u = points[..., 0] / zs * intr.fx + intr.cx
    v = points[..., 1] / zs * intr.fy + intr.cy
    return jnp.stack([u, v], axis=-1), valid


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample img [H, W, C] at uv [..., 2] (u=x, v=y) pixel coords.

    Out-of-range samples clamp to the border (callers mask separately).
    Replacement for the reference's grid_sample-based target lookup
    (``model/model.py:941-954``).
    """
    H, W = img.shape[:2]
    u = jnp.clip(uv[..., 0], 0.0, W - 1.000001)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = (u - u0.astype(u.dtype))[..., None]
    fv = (v - v0.astype(v.dtype))[..., None]
    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]
    top = i00 * (1 - fu) + i01 * fu
    bot = i10 * (1 - fu) + i11 * fu
    return top * (1 - fv) + bot * fv
