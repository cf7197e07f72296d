"""Image warping utilities (flow / rigid / 3D) and flow augmentation.

JAX equivalents of the reference's C++ warping ops
(``csrc/cpu/image_proc.cpp:900/:992/:1109`` warp_flow / warp_rigid /
warp_3d, and ``:39`` flow augmentation): trivially vectorizable
elementwise/bilinear ops used by the neural-tracking data pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from occlusionfusion_tpu.geometry.camera import Intrinsics, bilinear_sample


def warp_image_with_flow(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp [H, W, C] by flow [H, W, 2] (u, v): out(x) =
    image(x + flow(x)); out-of-range samples clamp (mask separately)."""
    H, W = image.shape[:2]
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    uv = jnp.stack([u + flow[..., 0], v + flow[..., 1]], axis=-1)
    return bilinear_sample(image, uv.reshape(-1, 2)).reshape(H, W, -1)


def warp_rigid(
    point_image: jnp.ndarray,  # [H, W, 3]
    R: jnp.ndarray,
    t: jnp.ndarray,
    intr: Intrinsics,
):
    """Transform the point image rigidly and reproject: returns the flow
    [H, W, 2] induced by (R, t) plus validity (positive depth both
    sides)."""
    H, W, _ = point_image.shape
    pts = point_image.reshape(-1, 3)
    moved = pts @ R.T + t
    z = moved[:, 2]
    valid = (pts[:, 2] > 0) & (z > 1e-6)
    zs = jnp.where(valid, z, 1.0)
    u2 = moved[:, 0] / zs * intr.fx + intr.cx
    v2 = moved[:, 1] / zs * intr.fy + intr.cy
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    flow = jnp.stack(
        [u2.reshape(H, W) - u, v2.reshape(H, W) - v], axis=-1
    )
    return jnp.where(valid.reshape(H, W, 1), flow, 0.0), valid.reshape(H, W)


def warp_3d(
    point_image: jnp.ndarray,  # [H, W, 3] source points
    scene_flow: jnp.ndarray,  # [H, W, 3]
    intr: Intrinsics,
):
    """Apply per-pixel 3D scene flow and reproject to 2D optical flow
    (+ validity)."""
    moved = point_image + scene_flow
    H, W, _ = point_image.shape
    z = moved[..., 2]
    valid = (point_image[..., 2] > 0) & (z > 1e-6)
    zs = jnp.where(valid, z, 1.0)
    u2 = moved[..., 0] / zs * intr.fx + intr.cx
    v2 = moved[..., 1] / zs * intr.fy + intr.cy
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    flow = jnp.stack([u2 - u, v2 - v], axis=-1)
    return jnp.where(valid[..., None], flow, 0.0), valid


def median_filter_depth(
    depth: jnp.ndarray, size: int = 5, max_deviation: float = 0.1
) -> jnp.ndarray:
    """Approximate median depth filter (``image_proc.cpp:854``
    filter_depth): replaces pixels deviating from the local window median;
    the median over the k^2 window is computed exactly via sort. Zero
    (invalid) depths stay zero."""
    H, W = depth.shape
    r = size // 2
    pad = jnp.pad(depth, r, constant_values=0.0)
    windows = [
        pad[dy : dy + H, dx : dx + W]
        for dy in range(size)
        for dx in range(size)
    ]
    stack = jnp.stack(windows, axis=-1)  # [H, W, k^2]
    # median over valid entries: sort invalid (0) to the end via +inf
    valid = stack > 0
    big = jnp.where(valid, stack, jnp.inf)
    srt = jnp.sort(big, axis=-1)
    count = jnp.sum(valid, axis=-1)
    mid = jnp.maximum(count // 2, 0)
    med = jnp.take_along_axis(srt, mid[..., None], axis=-1)[..., 0]
    med = jnp.where(count > 0, med, 0.0)
    out = jnp.where(
        (depth > 0) & (jnp.abs(depth - med) > max_deviation), med, depth
    )
    return out


def augment_flow(
    key,
    flow: jnp.ndarray,  # [H, W, 2] ground-truth flow
    mask: jnp.ndarray,  # [H, W]
    max_offset: float = 2.0,
    noise_sigma: float = 0.5,
):
    """Training-time flow augmentation (``image_proc.cpp:39``): add a
    global offset + per-pixel noise to valid flow."""
    import jax

    k1, k2 = jax.random.split(key)
    offset = jax.random.uniform(k1, (2,), minval=-max_offset, maxval=max_offset)
    noise = jax.random.normal(k2, flow.shape) * noise_sigma
    out = flow + offset + noise
    return jnp.where(mask[..., None], out, flow)
