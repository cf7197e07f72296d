#!/usr/bin/env python
"""Export a synthetic clip to the DeepDeform/NeuralTracking data layout.

Produces the exact on-disk format the reference's ``DeformDataset``
consumes (``/root/reference/model/dataset.py:151-213`` image pipeline,
``utils/utils.py:126-383`` binary blobs): per-frame color jpg + 16-bit
depth png + intrinsics txt, and per-pair optical flow (.oflow), scene
flow (.sflow), deformation-graph blobs (nodes/edges/weights/clusters +
GT node deformations) and pixel anchors/weights — so the loader
(``data/deepdeform.py``), the flow trainer (``train_flow.py --data
deepdeform``) and the DeepDeform-format eval
(``evaluate_deepdeform.py``) can be exercised end-to-end without the
(unreleasable) real dataset. GT comes from the synthetic clip's known
vertex correspondences rendered through the same point-splat camera as
the rest of the framework.

Usage:
  python scripts/export_deepdeform.py --out /tmp/dd --shape arms \
      --frames 8 --height 160 --width 160
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def export(args):
    from PIL import Image

    from occlusionfusion_tpu.data import formats
    from occlusionfusion_tpu.data.deformingthings4d import (
        frame_vertices,
        procedural_vertex_colors,
    )
    from occlusionfusion_tpu.data.synthetic_shapes import (
        _backproject,
        _project,
        np_render,
        shape_clip,
    )
    from occlusionfusion_tpu.geometry.camera import Intrinsics
    from occlusionfusion_tpu.graph.edgraph import (
        GraphConfig,
        build_graph_from_depth,
    )
    from occlusionfusion_tpu.graph.pixel_anchors import (
        pixel_anchors_euclidean,
    )

    H, W = args.height, args.width
    intr = Intrinsics(
        np.float32(args.fx), np.float32(args.fx),
        np.float32(W / 2), np.float32(H / 2),
    )
    verts, _, offs = shape_clip(
        args.shape, args.frames, args.verts, seed=args.seed,
        rotate_deg=args.rotate_deg,
    )
    colors = procedural_vertex_colors(verts, seed=args.seed)
    center = verts.mean(0)
    cam = np.asarray([0.0, 0.0, 1.5], np.float32)

    seq = os.path.join("seqs", args.shape)
    for sub in ("color", "depth", "flow", "graph"):
        os.makedirs(os.path.join(args.out, seq, sub), exist_ok=True)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = args.fx
    K[0, 2], K[1, 2] = W / 2, H / 2
    intr_rel = os.path.join(seq, "intrinsics.txt")
    np.savetxt(os.path.join(args.out, intr_rel), K)

    frames = []
    for f in range(args.frames):
        v = frame_vertices(verts, offs, f) - center + cam
        depth, color, mask, win = np_render(
            v, colors, intr, (H, W), splat_radius=args.splat_radius
        )
        crel = os.path.join(seq, "color", f"{f:06d}.jpg")
        drel = os.path.join(seq, "depth", f"{f:06d}.png")
        Image.fromarray(color.astype(np.uint8)).save(
            os.path.join(args.out, crel), quality=95
        )
        Image.fromarray(
            np.round(depth * 1000.0).astype(np.uint16)
        ).save(os.path.join(args.out, drel))
        frames.append(dict(v=v, depth=depth, win=win, mask=mask,
                           color=crel, depth_rel=drel))

    samples = []
    gcfg = GraphConfig(
        node_coverage=args.node_coverage, max_triangle_edge=0.05
    )
    for i in range(args.frames - 1):
        j = i + 1
        src, tgt = frames[i], frames[j]
        P = len(src["v"])
        valid = src["mask"] & (src["win"] < P)
        safe = np.minimum(src["win"], P - 1)
        tgt_pts = tgt["v"][safe]  # [H, W, 3]
        src_pts = _backproject(src["depth"], intr)
        uj, vj = _project(tgt_pts, intr)
        vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        oflow = np.stack([uj - uu, vj - vv], 0).astype(np.float32)
        oflow = np.where(valid[None], oflow, -np.inf)  # reference's
        # invalid-flow sentinel (dataset.py loads -Inf holes)
        sflow = np.where(
            valid[None],
            (tgt_pts - src_pts).transpose(2, 0, 1),
            -np.inf,
        ).astype(np.float32)
        frel = os.path.join(seq, "flow", f"{i:06d}_{j:06d}")
        formats.save_flow(os.path.join(args.out, frel + ".oflow"), oflow)
        formats.save_flow(os.path.join(args.out, frel + ".sflow"), sflow)

        # deformation graph on the source frame (native builder:
        # mesh_from_depth -> erode -> sample -> geodesic edges)
        g = build_graph_from_depth(src_pts.astype(np.float32), gcfg)
        grel = os.path.join(seq, "graph", f"{i:06d}_{j:06d}")
        formats.save_graph_nodes(
            os.path.join(args.out, grel + "_nodes.bin"), g.nodes
        )
        formats.save_graph_edges(
            os.path.join(args.out, grel + "_edges.bin"), g.edges
        )
        formats.save_graph_edges_weights(
            os.path.join(args.out, grel + "_weights.bin"), g.edge_weights
        )
        formats.save_graph_clusters(
            os.path.join(args.out, grel + "_clusters.bin"),
            g.clusters.reshape(-1, 1),
        )
        # GT node deformations: nodes sit on backprojected source pixels;
        # move them by the scene flow of their winning vertex
        ny = np.clip(
            np.round(
                g.nodes[:, 1] / np.maximum(g.nodes[:, 2], 1e-6)
                * float(intr.fy) + float(intr.cy)
            ).astype(int), 0, H - 1,
        )
        nx = np.clip(
            np.round(
                g.nodes[:, 0] / np.maximum(g.nodes[:, 2], 1e-6)
                * float(intr.fx) + float(intr.cx)
            ).astype(int), 0, W - 1,
        )
        node_delta = (tgt_pts - src_pts)[ny, nx] * valid[ny, nx][:, None]
        formats.save_graph_nodes(
            os.path.join(args.out, grel + "_deform.bin"),
            node_delta.astype(np.float32),
        )

        anchors, weights = pixel_anchors_euclidean(
            src_pts.astype(np.float32), g.nodes, None, args.node_coverage
        )
        formats.save_int_image(
            os.path.join(args.out, grel + "_anchors.bin"),
            anchors.transpose(2, 0, 1).astype(np.int32),
        )
        formats.save_float_image(
            os.path.join(args.out, grel + "_anchor_weights.bin"),
            weights.transpose(2, 0, 1).astype(np.float32),
        )

        samples.append({
            "seq": args.shape,
            "source_id": i,
            "target_id": j,
            "intrinsics": intr_rel,
            "source_color": src["color"],
            "source_depth": src["depth_rel"],
            "target_color": tgt["color"],
            "target_depth": tgt["depth_rel"],
            "optical_flow": frel + ".oflow",
            "scene_flow": frel + ".sflow",
            "graph_nodes": grel + "_nodes.bin",
            "graph_edges": grel + "_edges.bin",
            "graph_edges_weights": grel + "_weights.bin",
            "graph_clusters": grel + "_clusters.bin",
            "graph_node_deformations": grel + "_deform.bin",
            "pixel_anchors": grel + "_anchors.bin",
            "pixel_weights": grel + "_anchor_weights.bin",
        })

    with open(os.path.join(args.out, f"{args.split}.json"), "w") as fh:
        json.dump(samples, fh, indent=1)
    print(f"exported {len(samples)} samples to {args.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--shape", default="arms",
                    choices=("blob", "limbs", "arms"))
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--height", type=int, default=160)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--fx", type=float, default=300.0)
    ap.add_argument("--verts", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rotate_deg", type=float, default=0.0)
    ap.add_argument("--splat_radius", type=int, default=2)
    ap.add_argument("--node_coverage", type=float, default=0.05)
    ap.add_argument("--split", default="train")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tool
    export(args)


if __name__ == "__main__":
    main()
