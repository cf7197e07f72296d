"""DeformingThings4D (.anime) clips: loading, depth rendering, GT eval.

Equivalent of the reference's DT4D tooling
(``preprocessing/createDeformingThings4D.py``, anime reader at
``fusion_tests/ssdr.py:14-29``): reads the .anime binary format, animates
the mesh, renders synthetic depth sequences through our point-splat
rasterizer (ops/rasterize.py), and exposes ground-truth per-frame vertex
trajectories for ATE / node-motion-EPE evaluation (the parity metrics of
BASELINE config 3 are defined against these GT trajectories since the
fork ships no Lepard/NT weights).

.anime layout (little-endian): int32 nf, nv, nt; f32[nv, 3] rest
vertices; int32[nt, 3] triangles; f32[nf-1, nv, 3] per-frame offsets.
"""

from __future__ import annotations

import numpy as np


def load_anime(path: str):
    """-> (verts [nv, 3], faces [nt, 3], offsets [nf-1, nv, 3])."""
    with open(path, "rb") as fh:
        nf, nv, nt = np.frombuffer(fh.read(12), np.int32)
        verts = np.frombuffer(fh.read(4 * nv * 3), np.float32).reshape(nv, 3)
        faces = np.frombuffer(fh.read(4 * nt * 3), np.int32).reshape(nt, 3)
        offsets = np.frombuffer(fh.read(4 * (nf - 1) * nv * 3), np.float32)
        offsets = offsets.reshape(nf - 1, nv, 3)
    return verts.copy(), faces.copy(), offsets.copy()


def save_anime(path: str, verts, faces, offsets):
    with open(path, "wb") as fh:
        nf = offsets.shape[0] + 1
        np.asarray([nf, verts.shape[0], faces.shape[0]], np.int32).tofile(fh)
        np.ascontiguousarray(verts, np.float32).tofile(fh)
        np.ascontiguousarray(faces, np.int32).tofile(fh)
        np.ascontiguousarray(offsets, np.float32).tofile(fh)


def frame_vertices(verts, offsets, frame: int):
    """Animated vertices at frame (frame 0 = rest pose)."""
    return verts if frame == 0 else verts + offsets[frame - 1]


def anime_to_depth_sequence(
    path: str,
    intrinsics,
    image_hw=(240, 320),
    camera_offset=(0.0, 0.0, 1.5),
    scale: float = 1.0,
    splat_radius: int = 2,
    max_frames: int | None = None,
):
    """Render an .anime clip to synthetic depth maps + GT trajectories.

    Places the animated mesh ``camera_offset`` in front of the camera.
    Returns (depths [F, H, W], gt_vertices [F, nv, 3] in camera frame).
    """
    import jax.numpy as jnp

    from occlusionfusion_tpu.ops.rasterize import render_depth

    verts, faces, offsets = load_anime(path)
    n_frames = offsets.shape[0] + 1
    if max_frames:
        n_frames = min(n_frames, max_frames)
    center = verts.mean(0)
    offset = np.asarray(camera_offset, np.float32)
    depths, gt = [], []
    for f in range(n_frames):
        v = (frame_vertices(verts, offsets, f) - center) * scale + offset
        depth, _ = render_depth(
            jnp.asarray(v), intrinsics, image_hw, splat_radius=splat_radius
        )
        depths.append(np.asarray(depth))
        gt.append(v.astype(np.float32))
    return np.stack(depths), np.stack(gt)


def trajectory_ate(pred: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error: RMS over frames x points of the L2
    position error (the BASELINE ATE metric)."""
    err = np.linalg.norm(pred - gt, axis=-1)
    return float(np.sqrt(np.mean(err**2)))
