#!/usr/bin/env python
"""Run the motion-completion demo over a prepared node/graph sequence.

Equivalent of the reference's ``demo.py`` CLI (BASELINE config 1): reads
``<input>/node/NNNN.npy`` (per-node pos3 + motion3 + visible1) and
``<input>/graph/NNNN.npz`` (4-level pyramid), writes
``<output>/node/NNNN.npy`` (motion3 + confidence1) per frame.

Runs the whole per-frame pipeline as one jitted TPU step; the host only
pads and does file IO.
"""

import argparse
import os
import time
from glob import glob

import numpy as np

from occlusionfusion_tpu.models.checkpoint import load_motion_complete_params
from occlusionfusion_tpu.fusion.motion_runner import MotionCompletionRunner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/data/input")
    ap.add_argument("--output", default="data/output")
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--weights", default=None)
    args = ap.parse_args()

    params = load_motion_complete_params(
        npz_path=args.weights,
        tar_path="/root/reference/checkpoints/model_noise_all.tar",
    )
    runner = MotionCompletionRunner(params)

    node_dir = os.path.join(args.input, "node")
    graph_dir = os.path.join(args.input, "graph")
    out_dir = os.path.join(args.output, "node")
    os.makedirs(out_dir, exist_ok=True)

    total = len(glob(os.path.join(node_dir, "*.npy")))
    if args.frames:
        total = min(total, args.frames)

    t_start = time.perf_counter()
    for frame_id in range(1, total + 1):
        nf = np.load(os.path.join(node_dir, f"{frame_id:04d}.npy"))
        pyd = np.load(os.path.join(graph_dir, f"{frame_id:04d}.npz"))
        motion, conf = runner.run_frame(
            node_pos=nf[:, :3],
            node_motion=nf[:, 3:6],
            visible=nf[:, -1] > 0.5,
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )
        np.save(
            os.path.join(out_dir, f"{frame_id:04d}.npy"),
            np.hstack([motion, conf[:, None]]).astype(np.float32),
        )
        if frame_id == 1:
            t_first = time.perf_counter() - t_start
            print(f"frame 1 (incl. compile): {t_first:.2f}s")
            t_start = time.perf_counter()
    n_timed = total - 1
    if n_timed > 0:
        dt = time.perf_counter() - t_start
        print(
            f"{total} frames; steady-state {n_timed / dt:.1f} frames/s "
            f"({dt / n_timed * 1e3:.1f} ms/frame)"
        )


if __name__ == "__main__":
    main()
