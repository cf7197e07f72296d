#!/usr/bin/env python
"""Run the motion-completion demo over a prepared node/graph sequence.

Equivalent of the reference's ``demo.py`` CLI (BASELINE config 1): reads
``<input>/node/NNNN.npy`` (per-node pos3 + motion3 + visible1) and
``<input>/graph/NNNN.npz`` (4-level pyramid), writes
``<output>/node/NNNN.npy`` (motion3 + confidence1) per frame.

Runs the whole per-frame pipeline as one jitted TPU step; the host only
pads and does file IO.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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

    chunk = int(os.environ.get("DEMO_CHUNK", "32"))

    def frame_dict(frame_id):
        nf = np.load(os.path.join(node_dir, f"{frame_id:04d}.npy"))
        pyd = np.load(os.path.join(graph_dir, f"{frame_id:04d}.npz"))
        return dict(
            node_pos=nf[:, :3],
            node_motion=nf[:, 3:6],
            visible=nf[:, -1] > 0.5,
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )

    t_start = time.perf_counter()
    done = 0
    for start in range(1, total + 1, chunk):
        ids = list(range(start, min(start + chunk, total + 1)))
        outs = runner.run_chunk([frame_dict(i) for i in ids])
        for frame_id, (motion, conf) in zip(ids, outs):
            np.save(
                os.path.join(out_dir, f"{frame_id:04d}.npy"),
                np.hstack([motion, conf[:, None]]).astype(np.float32),
            )
        done += len(ids)
    dt = time.perf_counter() - t_start
    print(
        f"{done} frames incl. IO+compile: {done / dt:.1f} frames/s "
        f"({dt / max(done, 1) * 1e3:.1f} ms/frame)"
    )


if __name__ == "__main__":
    main()
