#!/usr/bin/env python
"""Visualize motion-completion demo outputs.

Equivalent of the reference's ``visualize.py`` (renders input visible
node motion vs predicted complete motion per frame): produces side-by-side
matplotlib png frames (headless) with motion vectors colored by
confidence; assemble into a video with ffmpeg if desired.

  python scripts/visualize_demo.py --input /root/reference/data/input \
      --output data/output --frames 1 50 100 --out_dir viz/
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import os

import numpy as np


def render_frame(node_path, out_path, frame_id, save_to):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nf = np.load(os.path.join(node_path, f"{frame_id:04d}.npy"))
    pos = nf[:, :3]
    motion_in = nf[:, 3:6]
    visible = nf[:, -1] > 0.5
    pred = np.load(os.path.join(out_path, f"{frame_id:04d}.npy"))
    motion_out, conf = pred[:, :3], pred[:, 3]

    fig = plt.figure(figsize=(11, 5))
    for idx, (title, motion, mask, color) in enumerate(
        [
            ("input (visible only)", motion_in, visible, None),
            ("completed (conf color)", motion_out, np.ones_like(visible), conf),
        ]
    ):
        ax = fig.add_subplot(1, 2, idx + 1, projection="3d")
        sc = ax.scatter(
            pos[:, 0], pos[:, 2], -pos[:, 1],
            c=(color if color is not None else np.where(mask, 0.8, 0.1)),
            cmap="viridis", s=8, vmin=0, vmax=1,
        )
        m = mask.astype(bool)
        scale = 12.0
        ax.quiver(
            pos[m, 0], pos[m, 2], -pos[m, 1],
            motion[m, 0] * scale, motion[m, 2] * scale, -motion[m, 1] * scale,
            color="tab:red", linewidth=0.6, arrow_length_ratio=0.25,
        )
        ax.set_title(f"frame {frame_id}: {title}")
        ax.set_box_aspect((1, 1, 1))
        if color is not None:
            fig.colorbar(sc, ax=ax, shrink=0.6, label="confidence")
    os.makedirs(save_to, exist_ok=True)
    out_png = os.path.join(save_to, f"{frame_id:04d}.png")
    fig.savefig(out_png, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/data/input")
    ap.add_argument("--output", default="data/output")
    ap.add_argument("--frames", type=int, nargs="+", default=[1, 200, 500])
    ap.add_argument("--out_dir", default="viz")
    args = ap.parse_args()

    for f in args.frames:
        png = render_frame(
            os.path.join(args.input, "node"),
            os.path.join(args.output, "node"),
            f,
            args.out_dir,
        )
        print(f"wrote {png}")


if __name__ == "__main__":
    main()
