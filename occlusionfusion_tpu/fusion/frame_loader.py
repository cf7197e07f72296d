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


class RGBDSequence:
    def __init__(self, seq_dir: str, depth_scale: float = 1.0 / 1000.0):
        self.seq_dir = seq_dir
        self.depth_scale = depth_scale
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
        return Frame(index=index, color=color, depth=depth, mask=mask)


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
