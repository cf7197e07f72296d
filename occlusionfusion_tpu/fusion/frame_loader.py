"""RGB-D sequence loader.

Equivalent of the reference ``RGBDVideoLoader``
(``fusion_with_occlusion/frame_loader.py:16-81``): a directory with
``color/``, ``depth/`` (16-bit PNG, millimeters), optional ``mask/`` and
an ``intrinsics.txt`` 3x3 (or 4x4) matrix. Produces numpy RGB images,
metric depth, and the camera intrinsics; backprojection happens on device
(geometry/camera.py), not here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from occlusionfusion_tpu.geometry.camera import Intrinsics


@dataclass
class Frame:
    index: int
    color: np.ndarray  # [H, W, 3] float32 0..255
    depth: np.ndarray  # [H, W] float32 meters
    mask: np.ndarray | None  # [H, W] bool
    # depth-discontinuity pixels to exclude from correspondence search
    # (``utils/image_proc.py:352`` compute_boundary_mask); None = none
    boundary: np.ndarray | None = None


def median_filter_depth_np(
    depth: np.ndarray, size: int = 5, max_deviation: float = 0.1
) -> np.ndarray:
    """Numpy twin of ``ops/image_warp.py::median_filter_depth`` (the
    reference's ``image_proc.cpp:854`` filter_depth) for the host-side
    loader: replace pixels deviating from the local window median by more
    than ``max_deviation``; zero (invalid) depths stay zero."""
    H, W = depth.shape
    r = size // 2
    pad = np.pad(depth, r, constant_values=0.0)
    stack = np.stack(
        [pad[dy : dy + H, dx : dx + W] for dy in range(size) for dx in range(size)],
        axis=-1,
    )
    valid = stack > 0
    big = np.where(valid, stack, np.inf)
    srt = np.sort(big, axis=-1)
    count = valid.sum(axis=-1)
    med = np.take_along_axis(
        srt, np.maximum(count // 2, 0)[..., None], axis=-1
    )[..., 0]
    med = np.where(count > 0, med, 0.0)
    return np.where(
        (depth > 0) & (np.abs(depth - med) > max_deviation), med, depth
    ).astype(np.float32)


def boundary_mask_np(
    depth: np.ndarray, intrinsics: Intrinsics, max_distance: float
) -> np.ndarray:
    """Depth-discontinuity mask (``utils/image_proc.py:352-379``): mark
    pixels whose central-difference 3D point distance (horizontal or
    vertical) exceeds ``max_distance``."""
    H, W = depth.shape
    u, v = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32)
    )
    x = (u - float(intrinsics.cx)) / float(intrinsics.fx) * depth
    y = (v - float(intrinsics.cy)) / float(intrinsics.fy) * depth
    pts = np.stack([x, y, depth], axis=-1)
    sr = np.zeros_like(pts); sr[:, 1:] = pts[:, :-1]
    sl = np.zeros_like(pts); sl[:, :-1] = pts[:, 1:]
    sd = np.zeros_like(pts); sd[1:] = pts[:-1]
    su = np.zeros_like(pts); su[:-1] = pts[1:]
    horiz = np.linalg.norm(sl - sr, axis=-1)
    vert = np.linalg.norm(su - sd, axis=-1)
    return (horiz > max_distance) | (vert > max_distance)


class RGBDSequence:
    def __init__(self, seq_dir: str, depth_scale: float = 1.0 / 1000.0,
                 max_depth: float = 0.0,
                 depth_filter_size: int = 0,
                 depth_filter_max_deviation: float = 0.1,
                 boundary_dist: float = 0.0):
        """Optional preprocessing (all off by default):
        ``max_depth`` zeroes depth beyond the cutoff (frame_loader.py:57
        ``max_depth`` equivalent); ``depth_filter_size`` > 0 enables the
        median depth filter; ``boundary_dist`` > 0 computes the
        depth-discontinuity mask consumed by the correspondence search
        (``model/dataset.py:212`` max_boundary_dist equivalent)."""
        self.seq_dir = seq_dir
        self.depth_scale = depth_scale
        self.max_depth = max_depth
        self.depth_filter_size = depth_filter_size
        self.depth_filter_max_deviation = depth_filter_max_deviation
        self.boundary_dist = boundary_dist
        K = np.loadtxt(os.path.join(seq_dir, "intrinsics.txt"))
        self.intrinsics = Intrinsics(
            np.float32(K[0, 0]), np.float32(K[1, 1]),
            np.float32(K[0, 2]), np.float32(K[1, 2]),
        )
        color_dir = os.path.join(seq_dir, "color")
        self.names = sorted(
            os.listdir(color_dir), key=lambda x: int(x.split(".")[0])
        )

    def __len__(self):
        return len(self.names)

    def _path(self, sub: str, name: str, ext_png: bool):
        if ext_png:
            name = name.replace("jpg", "png").replace("jpeg", "png")
        return os.path.join(self.seq_dir, sub, name)

    def load(self, index: int) -> Frame:
        from PIL import Image

        name = self.names[index]
        color = np.asarray(
            Image.open(self._path("color", name, False)).convert("RGB"),
            np.float32,
        )
        depth_raw = np.asarray(Image.open(self._path("depth", name, True)))
        depth = depth_raw.astype(np.float32) * self.depth_scale
        mask = None
        mask_path = self._path("mask", name, True)
        if os.path.exists(mask_path):
            mask = np.asarray(Image.open(mask_path)) > 0
            if mask.ndim == 3:
                mask = mask.any(-1)
            depth = np.where(mask, depth, 0.0)
        if self.max_depth > 0:
            depth = np.where(depth > self.max_depth, 0.0, depth)
        if self.depth_filter_size > 0:
            depth = median_filter_depth_np(
                depth, self.depth_filter_size,
                self.depth_filter_max_deviation,
            )
        boundary = None
        if self.boundary_dist > 0:
            boundary = boundary_mask_np(
                depth, self.intrinsics, self.boundary_dist
            )
        return Frame(
            index=index, color=color, depth=depth.astype(np.float32),
            mask=mask, boundary=boundary,
        )


class ArraySequence:
    """In-memory sequence (tests / synthetic data): same interface."""

    def __init__(self, colors, depths, intrinsics: Intrinsics, masks=None):
        self.colors = colors
        self.depths = depths
        self.masks = masks
        self.intrinsics = intrinsics

    def __len__(self):
        return len(self.depths)

    def load(self, index: int) -> Frame:
        return Frame(
            index=index,
            color=np.asarray(self.colors[index], np.float32),
            depth=np.asarray(self.depths[index], np.float32),
            mask=None if self.masks is None else self.masks[index],
        )
