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
    """Cheap training-time flow jitter: global offset + per-pixel noise
    on valid flow (supplementary to the rotation-composition
    augmentation below)."""
    import jax

    k1, k2 = jax.random.split(key)
    offset = jax.random.uniform(k1, (2,), minval=-max_offset, maxval=max_offset)
    noise = jax.random.normal(k2, flow.shape) * noise_sigma
    out = flow + offset + noise
    return jnp.where(mask[..., None], out, flow)


def rotation_flow(h: int, w: int, angle: jnp.ndarray) -> jnp.ndarray:
    """Dense [H, W, 2] pixel flow of an in-plane rotation about the
    image center: for the rotated image's pixel p, the flow to its
    source location in the original image (rotate an image by ``angle``
    == sample the original at R(-angle)(p - c) + c)."""
    v, u = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ca, sa = jnp.cos(-angle), jnp.sin(-angle)
    x = u - cx
    y = v - cy
    return jnp.stack(
        [ca * x - sa * y + cx - u, sa * x + ca * y + cy - v], axis=-1
    )


def rotate_image(image: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate [H, W, C] by ``angle`` about the center (bilinear)."""
    return warp_image_with_flow(
        image, rotation_flow(image.shape[0], image.shape[1], angle)
    )


def compose_flows(
    flow_ab: jnp.ndarray,  # [H, W, 2] a -> b (dense over a)
    flow_bc: jnp.ndarray,  # [H, W, 2] b -> c
    valid_bc: jnp.ndarray,  # [H, W]
):
    """Chain two pixel-flow fields: sample flow_bc at p + flow_ab with
    the reference's corner semantics (``image_proc.cpp:98-170``): all 4
    bilinear corners valid -> bilinear blend; some valid -> the
    NEAREST valid corner's flow; none -> invalid. Returns
    (flow_ac [H, W, 2], valid [H, W])."""
    H, W = flow_ab.shape[:2]
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    px = u + flow_ab[..., 0]
    py = v + flow_ab[..., 1]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    corners_x = jnp.stack([x0, x0, x0 + 1, x0 + 1], -1)  # [H, W, 4]
    corners_y = jnp.stack([y0, y0 + 1, y0, y0 + 1], -1)
    inb = (
        (corners_x >= 0) & (corners_x <= W - 1)
        & (corners_y >= 0) & (corners_y <= H - 1)
    )
    cx = jnp.clip(corners_x, 0, W - 1).astype(jnp.int32)
    cy = jnp.clip(corners_y, 0, H - 1).astype(jnp.int32)
    cvalid = inb & valid_bc[cy, cx]
    cflow = flow_bc[cy, cx]  # [H, W, 4, 2]
    du = px - x0
    dv = py - y0
    w4 = jnp.stack(
        [(1 - du) * (1 - dv), (1 - du) * dv, du * (1 - dv), du * dv], -1
    )
    bilinear = jnp.sum(w4[..., None] * cflow, axis=-2)
    dist = jnp.hypot(corners_x - px[..., None], corners_y - py[..., None])
    dist = jnp.where(cvalid, dist, jnp.inf)
    nn = jnp.argmin(dist, axis=-1)
    nearest = jnp.take_along_axis(
        cflow, nn[..., None, None].repeat(2, -1), axis=-2
    )[..., 0, :]
    all4 = jnp.all(cvalid, axis=-1)
    any_valid = jnp.any(cvalid, axis=-1)
    sampled = jnp.where(all4[..., None], bilinear, nearest)
    return flow_ab + sampled, any_valid


def augmented_flow_from_rotation(
    flow_sa2so: jnp.ndarray,  # [H, W, 2] source-augmented -> source
    flow_so2to: jnp.ndarray,  # [H, W, 2] GT flow source -> target
    valid_so2to: jnp.ndarray,  # [H, W]
    flow_to2ta: jnp.ndarray,  # [H, W, 2] target -> target-augmented
):
    """``compute_augmented_flow_from_rotation``
    (``csrc/cpu/image_proc.cpp:39-349``): compose the source-side
    rotation, the GT flow, and the target-side rotation into the flow
    between the two AUGMENTED images. Returns (flow [H, W, 2], valid).
    The reference marks invalid pixels -inf; here they carry a mask."""
    H, W = flow_sa2so.shape[:2]
    c1, v1 = compose_flows(flow_sa2so, flow_so2to, valid_so2to)
    c2, v2 = compose_flows(c1, flow_to2ta, jnp.ones((H, W), bool))
    return c2, v1 & v2
