#!/usr/bin/env python
"""DeepDeform-format evaluation loop (reference ``model/evaluate.py:13-214``).

For every sample of a DeepDeform-layout split: run the flow net (or the
GT optical flow with ``--gt_flow``), lift to 3D targets, run the
Gauss-Newton warp solve over the sample's deformation graph, and report
the reference's metrics:

  * ``epe2d_px``    — optical-flow end-point error (pixels)
  * ``graph_mm``    — solver node-translation error vs GT node
                      deformations (the reference's "Graph Error 3D";
                      published bound 30.898 mm on real DeepDeform,
                      ``experiments/models/model_A/model_A__ON__test.txt:7``)
  * ``epe3d_mm``    — warped-point error vs scene-flow GT (bound
                      26.005 mm, ibid:8)

Real DeepDeform is not distributable with this repo; the format is
exercised end-to-end via ``scripts/export_deepdeform.py`` synthetic
exports (pass that directory as ``--root``). Numbers on synthetic
exports are NOT comparable to the published real-data bounds — they
validate the machinery and rank checkpoints.

Usage:
  python scripts/export_deepdeform.py --out /tmp/dd --shape arms
  python scripts/evaluate_deepdeform.py --root /tmp/dd --gt_flow
  python scripts/evaluate_deepdeform.py --root /tmp/dd \
      --flow_weights checkpoints/flow.npz
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--height", type=int, default=160)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--flow_weights", default=None,
                    help="PWC(+MaskNet) checkpoint to evaluate")
    ap.add_argument("--gt_flow", action="store_true",
                    help="use the GT optical flow as the correspondence "
                         "source (isolates the solver: graph_mm/epe3d_mm "
                         "then measure solve quality, not flow quality)")
    ap.add_argument("--matches", type=int, default=2048,
                    help="static cap of match pixels fed to the solver")
    ap.add_argument("--gn_iters", type=int, default=4)
    ap.add_argument("--max_samples", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (default CPU: per-sample "
                         "dispatches through the axon relay are slow)")
    args = ap.parse_args()
    if not (args.flow_weights or args.gt_flow):
        ap.error("pass --flow_weights or --gt_flow")

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from occlusionfusion_tpu.data.deepdeform import (
        DeepDeformConfig,
        DeepDeformDataset,
    )
    from occlusionfusion_tpu.fusion.flow_correspondence import (
        flow_correspondences,
    )
    from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem
    from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

    ds = DeepDeformDataset(
        args.root, args.split,
        DeepDeformConfig(image_height=args.height, image_width=args.width),
    )
    flow_params = mask_params = None
    if args.flow_weights:
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed
        from occlusionfusion_tpu.utils.snapshot import load_params

        ck = normalize_indexed(load_params(args.flow_weights))
        flow_params = ck["pwc"]
        mask_params = ck.get("mask")

    gn = GNConfig(iters=args.gn_iters, w_arap=1.0, assembly="blocks")
    H, W, M = args.height, args.width, args.matches
    epe2d, graph_mm, epe3d_mm, valid_solves = [], [], [], []
    n = len(ds) if not args.max_samples else min(len(ds), args.max_samples)
    for idx in range(n):
        s = ds[idx]
        src = jnp.asarray(s["source"])
        tgt = jnp.asarray(s["target"])
        oflow_gt = s["optical_flow"].transpose(1, 2, 0)  # [H, W, 2]
        gt_valid = np.isfinite(oflow_gt).all(-1) & (s["source"][5] > 0)

        if args.gt_flow:
            flow = np.where(gt_valid[..., None], oflow_gt, 0.0)
            # lift GT flow exactly as the learned path does
            from occlusionfusion_tpu.geometry.camera import bilinear_sample

            v, u = np.mgrid[0:H, 0:W].astype(np.float32)
            uv = jnp.asarray(
                np.stack([u + flow[..., 0], v + flow[..., 1]], -1)
            )
            tgt_xyz = tgt[3:].transpose(1, 2, 0)
            lifted = bilinear_sample(
                tgt_xyz, uv.reshape(-1, 2)
            ).reshape(H, W, 3)
            valid = jnp.asarray(gt_valid) & (lifted[..., 2] > 0)
            weights = valid.astype(jnp.float32)
        else:
            flow_j, lifted, valid, weights = flow_correspondences(
                flow_params, src, tgt, mask_params=mask_params
            )
            flow = np.asarray(flow_j)
            e = np.linalg.norm(flow - oflow_gt, axis=-1)[gt_valid]
            if e.size:
                epe2d.append(float(e.mean()))

        # static-cap match pixels: anchored, valid source depth
        anchors = s["pixel_anchors"].transpose(1, 2, 0)  # [H, W, 4]
        aweights = s["pixel_weights"].transpose(1, 2, 0)
        ok = (
            (anchors[..., 0] >= 0)
            & (s["source"][5] > 0)
            & np.asarray(valid)
        )
        flat = np.flatnonzero(ok.reshape(-1))
        rs = np.random.RandomState(0)
        pick = (
            rs.choice(flat, M, replace=False)
            if flat.size > M
            else np.pad(flat, (0, M - flat.size), mode="edge")
        )
        match_valid = np.zeros(M, bool)
        match_valid[: min(flat.size, M)] = True

        src_xyz = s["source"][3:].transpose(1, 2, 0).reshape(-1, 3)
        nodes = jnp.asarray(s["graph_nodes"])
        node_valid = jnp.asarray(s["graph_mask"])
        problem = GNProblem(
            source_points=jnp.asarray(src_xyz[pick]),
            point_anchors=jnp.asarray(
                anchors.reshape(-1, 4)[pick].astype(np.int32)
            ),
            point_weights=jnp.asarray(aweights.reshape(-1, 4)[pick]),
            target_points=jnp.asarray(lifted).reshape(-1, 3)[pick],
            point_valid=(
                jnp.asarray(weights).reshape(-1)[pick]
                * jnp.asarray(match_valid)
            ),
            nodes=nodes,
            node_valid=node_valid,
            edges=jnp.asarray(s["graph_edges"]),
            edge_weights=jnp.asarray(s["graph_edges_weights"]),
            motion_targets=jnp.zeros_like(nodes),
            motion_confidence=jnp.zeros(nodes.shape[0], jnp.float32),
            solve_node_mask=node_valid,
            intrinsics=jnp.asarray(
                [s["intrinsics"]["fx"], s["intrinsics"]["fy"],
                 s["intrinsics"]["cx"], s["intrinsics"]["cy"]],
                jnp.float32,
            ),
        )
        result = solve_dense(problem, gn)
        valid_solves.append(bool(result.valid))

        nv = np.asarray(node_valid)
        ge = np.linalg.norm(
            np.asarray(result.translations)[nv]
            - s["graph_node_deformations"][nv], axis=-1,
        )
        graph_mm.append(float(ge.mean() * 1000.0))

        sflow = s["scene_flow"].transpose(1, 2, 0).reshape(-1, 3)[pick]
        fin = np.isfinite(sflow).all(-1) & match_valid
        we = np.linalg.norm(
            np.asarray(result.warped_points) - (src_xyz[pick] + sflow),
            axis=-1,
        )[fin]
        if we.size:
            epe3d_mm.append(float(we.mean() * 1000.0))

    if not graph_mm or not epe3d_mm:
        raise SystemExit(
            f"no finite samples to aggregate (graph_mm n={len(graph_mm)}, "
            f"epe3d_mm n={len(epe3d_mm)}) — empty split or max_samples=0?"
        )
    metrics = {
        "samples": n,
        "graph_mm": round(float(np.mean(graph_mm)), 3),
        "epe3d_mm": round(float(np.mean(epe3d_mm)), 3),
        # reference valid-solve ratio (model/evaluate.py valid accounting)
        "valid_solve_ratio": round(
            float(np.mean(valid_solves)), 4
        ) if valid_solves else 0.0,
    }
    if epe2d:
        metrics["epe2d_px"] = round(float(np.mean(epe2d)), 3)
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(metrics, fh)


if __name__ == "__main__":
    main()
