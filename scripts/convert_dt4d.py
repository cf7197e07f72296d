#!/usr/bin/env python
"""Convert a DeformingThings4D .anime clip into a fusion sequence
directory (color/ depth/ intrinsics.txt) consumable by run_fusion.py.

Equivalent of the reference's DT4D converter
(``preprocessing/createDeformingThings4D.py``): renders each animated
frame to a synthetic depth map (point-splat rasterizer) and writes 16-bit
depth PNGs + flat-gray color JPGs.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anime", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--fx", type=float, default=300.0)
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    args = ap.parse_args()

    from PIL import Image

    from occlusionfusion_tpu.data.deformingthings4d import (
        anime_to_depth_sequence,
    )
    from occlusionfusion_tpu.geometry.camera import Intrinsics

    intr = Intrinsics(
        np.float32(args.fx), np.float32(args.fx),
        np.float32(args.width / 2), np.float32(args.height / 2),
    )
    depths, gt = anime_to_depth_sequence(
        args.anime, intr, image_hw=(args.height, args.width),
        max_frames=args.frames or None,
    )

    os.makedirs(os.path.join(args.out, "color"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    K = np.array(
        [[args.fx, 0, args.width / 2],
         [0, args.fx, args.height / 2],
         [0, 0, 1.0]]
    )
    np.savetxt(os.path.join(args.out, "intrinsics.txt"), K)
    for i, d in enumerate(depths):
        mm = np.clip(d * 1000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(mm).save(
            os.path.join(args.out, "depth", f"{i:06d}.png")
        )
        gray = np.full((args.height, args.width, 3), 128, np.uint8)
        Image.fromarray(gray).save(
            os.path.join(args.out, "color", f"{i:06d}.jpg")
        )
    np.save(os.path.join(args.out, "gt_vertices.npy"), gt)
    print(f"wrote {len(depths)} frames to {args.out}")


if __name__ == "__main__":
    main()
