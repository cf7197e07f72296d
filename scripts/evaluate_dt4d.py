#!/usr/bin/env python
"""Evaluate the fusion pipeline on DeformingThings4D-style clips.

BASELINE config 3 eval: render a synthetic depth sequence from an .anime
clip, run DynamicFusion, and report trajectory ATE of the tracked model
against the clip's ground-truth vertex trajectories (the parity metric —
the fork ships no Lepard/NT weights, so GT-trajectory ATE replaces
checkpoint equivalence; BASELINE.md).

Usage:
  python scripts/evaluate_dt4d.py --anime clip.anime [--frames 20]
  python scripts/evaluate_dt4d.py --synthetic   # built-in deforming blob
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import time

import numpy as np


def synthetic_anime(path, n_frames=16, n_verts=6000, seed=0,
                    rotate_deg=0.0, shape="blob", rotate_osc_deg=0.0):
    """Write a synthetic deforming clip (optional in-plane rotation of
    ``rotate_deg`` per frame — tangential motion that projective
    association is blind to, the regime the learned matcher exists for).

    ``shape="blob"``: sphere with a moving bulge (near-featureless —
    geometric matching cannot discriminate on it; good for testing the
    projective path). ``shape="limbs"``: sphere with 4 protruding lobes
    (distinct local geometry, the regime KPConv features can match).
    ``shape="arms"``: ARTICULATED — a body with two long limbs that
    swing about their shoulder joints, crossing in front of the body
    (large rotational per-part motion + self-occlusion: the hard
    regime VERDICT item 6 asks for). Generators live in
    ``data/synthetic_shapes.py`` (shared with the flow trainer's
    rendered-pair data path)."""
    from occlusionfusion_tpu.data.deformingthings4d import save_anime
    from occlusionfusion_tpu.data.synthetic_shapes import shape_clip

    verts, faces, offsets = shape_clip(
        shape, n_frames, n_verts, seed=seed, rotate_deg=rotate_deg,
        rotate_osc_deg=rotate_osc_deg,
    )
    save_anime(path, verts, faces, offsets)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anime", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--solver", default="gn_dense")
    ap.add_argument("--gn_iters", type=int, default=0,
                    help="override gn_dense iteration count (0 = the "
                         "engine default, 6 stepwise / 6 fused); the "
                         "warm-started tracking solve may converge in "
                         "2-3 — iteration-count accuracy A/B for the "
                         "envelope perf ladder")
    ap.add_argument("--use_motion_model", action="store_true")
    ap.add_argument("--shape", default="blob",
                    choices=("blob", "limbs", "arms"),
                    help="synthetic clip geometry: featureless blob or "
                         "4-lobed shape with matchable local geometry")
    ap.add_argument("--rotate_deg", type=float, default=0.0,
                    help="synthetic clip: in-plane rotation per frame "
                    "(tangential motion, projective-blind)")
    ap.add_argument("--rotate_osc", type=float, default=0.0,
                    help="oscillating in-plane rotation amplitude (deg): "
                         "the object swings away and returns — the "
                         "revisit regime for keyframe loop closure")
    ap.add_argument("--camera_path", default="static",
                    choices=("static", "truck_return", "orbit_return"),
                    help="camera trajectory (synthetic_shapes."
                         "camera_path): truck_return/orbit_return make "
                         "the object leave the frustum and come back — "
                         "the pose-graph leave-and-revisit regime")
    ap.add_argument("--camera_amp", type=float, default=0.25,
                    help="truck_return amplitude in metres (0.25 pushes "
                         "most of the default clip out of the 160px "
                         "frustum at its apex)")
    ap.add_argument("--camera_orbit_deg", type=float, default=25.0,
                    help="orbit_return yaw amplitude in degrees")
    ap.add_argument("--textured", action="store_true",
                    help="render procedural per-vertex texture instead "
                         "of flat gray (needed for optical flow)")
    ap.add_argument("--flow_weights", default=None,
                    help="PWC(+MaskNet) checkpoint; adds the optical-"
                         "flow correspondence source to the stepwise "
                         "loop (implies --textured)")
    ap.add_argument("--flow_downscale", type=int, default=1,
                    help="run PWC+MaskNet at 1/N resolution (lift stays "
                         "full-res)")
    ap.add_argument("--flow_mode", default="fill",
                    choices=("fill", "override", "advect"),
                    help="flow combination semantics (override = the "
                         "reference's, run_model.py:115-217; advect = "
                         "flow-advected pixel + exact along-ray depth "
                         "— the tangential-drift hybrid)")
    ap.add_argument("--flow_advect_min_px", type=float, default=0.0,
                    help="advect only where |flow| >= this many px "
                         "(noise gate; 0 = everywhere)")
    ap.add_argument("--flow_advect_weight", type=float, default=1.0,
                    help="solver weight multiplier for advected "
                         "correspondences")
    ap.add_argument("--flow_advect_mask", type=float, default=None,
                    help="MaskNet threshold for the advect override "
                         "(default: flow_mask_threshold)")
    ap.add_argument("--flow_advect_alpha", type=float, default=1.0,
                    help="blend of advected vs projective target where "
                         "both valid (tangential correction scale)")
    ap.add_argument("--lepard_subsample", default="topk",
                    choices=("topk", "strided"),
                    help="target-subsample selection A/B (fused-engine "
                         "lepard_subsample knob; also drives the "
                         "stepwise loop)")
    ap.add_argument("--print_infos", action="store_true",
                    help="print each frame's solver/keyframe info dict "
                         "(loop-closure / relocalization tracing)")
    ap.add_argument("--lepard_threshold", type=float, default=None,
                    help="override the checkpoint's coarse match "
                         "confidence threshold (higher = fewer, more "
                         "confident anchors — the articulated-regime "
                         "robustness knob)")
    ap.add_argument("--lepard_reloc_only", action="store_true",
                    help="load the matcher ONLY for feature-based "
                         "track-loss recovery (relocalization seed); "
                         "the per-frame tracking loop stays matcher-"
                         "free, isolating the recovery A/B")
    ap.add_argument("--lepard_coherence", type=float, default=None,
                    help="enable the motion-coherence match filter with "
                         "this tau (canonical units; anchors whose flow "
                         "deviates from the local median by more are "
                         "dropped — the crossing-limbs robustness knob)")
    ap.add_argument("--lepard_coherence_mad", type=float, default=None,
                    help="override the MAD multiplier of the coherence "
                         "threshold tau + mad*MAD (0 = pure absolute "
                         "tau; default 3)")
    ap.add_argument("--lepard_every", type=int, default=1,
                    help="run the matcher every K-th frame (cadence "
                         "accuracy A/B for the fused engine's "
                         "lepard_every knob)")
    ap.add_argument("--lepard_weights", default=None,
                    help="trained matcher checkpoint; runs the stepwise "
                    "loop with learned scene flow (use_lepard)")
    ap.add_argument("--stepwise", action="store_true",
                    help="use the stepwise register_frame loop instead "
                    "of the fused path (required for --lepard_weights)")
    ap.add_argument("--out", default=None, help="write metrics JSON here")
    ap.add_argument(
        "--trajectory", default=None,
        help="score an exported results/trajectory.npz (from "
        "run_fusion.py --keyframe_interval) against this clip's GT "
        "rigid poses instead of running fusion",
    )
    ap.add_argument(
        "--gt", default=None,
        help="gt_vertices.npy from convert_dt4d.py (exact camera-frame "
        "GT for --trajectory scoring; otherwise GT is re-rendered from "
        "the .anime clip)",
    )
    ap.add_argument("--recovery", action="store_true",
                    help="enable wide-baseline track-loss recovery "
                         "(ships default-off: trades final-frame EPE "
                         "for mid-sequence ATE — EVAL_MATRIX regime 3)")
    ap.add_argument("--keyframe_interval", type=int, default=0,
                    help="enable the keyframe pose graph in the stepwise "
                         "loop (record every N frames; loop closure + "
                         "relocalization as in run_fusion) — the drift "
                         "A/B knob")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator backend; default forces "
                         "CPU (this is a correctness eval — per-frame "
                         "stepwise dispatches through the axon relay are "
                         "pathologically slow, see CLAUDE.md)")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from occlusionfusion_tpu.data.deformingthings4d import (
        anime_to_depth_sequence,
        pose_trajectory_ate,
        rigid_pose_np,
        trajectory_ate,
    )
    from occlusionfusion_tpu.fusion import warpfield as W
    from occlusionfusion_tpu.fusion.frame_loader import ArraySequence
    from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
    from occlusionfusion_tpu.geometry.camera import Intrinsics
    from occlusionfusion_tpu.geometry.skinning import skinning_weights
    from occlusionfusion_tpu.graph.edgraph import GraphConfig
    from occlusionfusion_tpu.solvers.nicp import NICPConfig
    from occlusionfusion_tpu.utils.metrics import epe_3d

    path = args.anime
    if args.synthetic or (path is None and args.gt is None):
        path = synthetic_anime(
            "/tmp/synthetic_clip.anime", args.frames + 1,
            rotate_deg=args.rotate_deg, shape=args.shape,
            rotate_osc_deg=args.rotate_osc,
        )

    intr = Intrinsics(
        np.float32(300.0), np.float32(300.0), np.float32(80.0), np.float32(80.0)
    )
    textured = args.textured or args.flow_weights is not None
    rendered_colors = None
    if args.gt is not None:
        if not args.trajectory:
            ap.error("--gt is only meaningful with --trajectory")
        gt = np.load(args.gt)
        depths = None
    else:
        cam_poses = None
        if args.camera_path != "static":
            from occlusionfusion_tpu.data.synthetic_shapes import (
                camera_path,
            )

            cam_poses = camera_path(
                args.camera_path, args.frames, amp=args.camera_amp,
                orbit_deg=args.camera_orbit_deg,
            )
        if textured:
            from occlusionfusion_tpu.data.deformingthings4d import (
                anime_to_rgbd_sequence,
            )

            depths, rendered_colors, gt = anime_to_rgbd_sequence(
                path, intr, image_hw=(160, 160), max_frames=args.frames,
                camera_poses=cam_poses,
            )
        else:
            depths, gt = anime_to_depth_sequence(
                path, intr, image_hw=(160, 160), max_frames=args.frames,
                camera_poses=cam_poses,
            )

    if args.trajectory:
        # score an exported keyframe trajectory artifact and exit
        data = np.load(args.trajectory)
        metrics = pose_trajectory_ate(
            data["frame_ids"], data["rotations"], data["translations"], gt
        )
        print(json.dumps(metrics))
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(metrics, fh)
        return

    if rendered_colors is not None:
        colors = list(rendered_colors)
    else:
        colors = [
            np.full(depths[0].shape + (3,), 128.0, np.float32)
            for _ in depths
        ]
    seq = ArraySequence(colors, list(depths), intr)

    motion_params = None
    if args.use_motion_model:
        from occlusionfusion_tpu.models.checkpoint import (
            load_motion_complete_params,
        )

        motion_params = load_motion_complete_params()
    lepard_params = lepard_config = None
    if args.lepard_weights:
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )

        lepard_params, lepard_config = load_lepard_checkpoint(
            args.lepard_weights
        )
        if args.lepard_threshold is not None:
            lepard_config = lepard_config._replace(
                match_threshold=args.lepard_threshold
            )
        if args.lepard_coherence is not None:
            lepard_config = lepard_config._replace(
                coherence_tau=args.lepard_coherence
            )
        if args.lepard_coherence_mad is not None:
            lepard_config = lepard_config._replace(
                coherence_mad=args.lepard_coherence_mad
            )
        args.stepwise = True  # learned scene flow runs in the stepwise loop
    flow_params = mask_params = None
    if args.flow_weights:
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed
        from occlusionfusion_tpu.utils.snapshot import load_params

        ck = normalize_indexed(load_params(args.flow_weights))
        flow_params = ck["pwc"]
        mask_params = ck.get("mask")
        args.stepwise = True
    cfg = FusionConfig(
        vol_dim=(64, 64, 64),
        voxel_size=0.006,
        node_coverage=0.03,
        max_nodes=512,
        max_points=4096,
        max_depth_diff=0.04,
        graph=GraphConfig(node_coverage=0.03, min_neighbors=2),
        nicp=NICPConfig(
            iters=100, w_motion=100.0 if args.use_motion_model else 0.0,
            lr=0.02,
        ),
        use_motion_model=args.use_motion_model,
        solver=args.solver,
        # iteration-count A/B: mirror the engine's default GNConfig
        # mapping (pipeline.py: w_point=nicp.w_ldmk, w_arap=nicp.w_arap,
        # w_motion=nicp.w_motion/100) so ONLY iters varies
        gn=(
            None if not args.gn_iters else __import__(
                "occlusionfusion_tpu.solvers.gauss_newton",
                fromlist=["GNConfig"],
            ).GNConfig(
                iters=args.gn_iters,
                w_point=1.0,
                w_arap=10.0,
                w_motion=1.0 if args.use_motion_model else 0.0,
            )
        ),
        use_lepard=lepard_params is not None and not args.lepard_reloc_only,
        # --lepard_reloc_only exists to measure FEATURE-SEEDED recovery;
        # since relocalize_feat_min_points ships default-0 (opt-in,
        # advisor r4), the flag must arm it explicitly or it is a no-op
        relocalize_feat_min_points=50 if args.lepard_reloc_only else 0,
        lepard_every=args.lepard_every,
        lepard_subsample=args.lepard_subsample,
        use_flow=flow_params is not None,
        keyframe_interval=args.keyframe_interval,
        relocalize_recovery=args.recovery,
        flow_downscale=args.flow_downscale,
        flow_mode=args.flow_mode,
        flow_advect_min_px=args.flow_advect_min_px,
        flow_advect_weight=args.flow_advect_weight,
        flow_advect_mask_threshold=args.flow_advect_mask,
        flow_advect_alpha=args.flow_advect_alpha,
    )
    if args.keyframe_interval:
        args.stepwise = True  # pose graph lives in the stepwise loop
    fusion = DynamicFusion(seq, cfg, motion_params=motion_params,
                           lepard_params=lepard_params,
                           lepard_config=lepard_config,
                           flow_params=flow_params,
                           mask_params=mask_params)
    t0 = time.perf_counter()
    fusion.initialize(seq.load(0))
    if args.stepwise:
        nodes_j = fusion.warp.node_positions
        nvalid_j = fusion.node_valid
    else:
        sc, state, tables = fusion.build_fused(motion_params)
        nodes_j = tables.nodes
        nvalid_j = tables.node_valid

    # track the GT vertices through the estimated warp field each frame
    gt0 = jnp.asarray(gt[0])
    anchors, weights, reach = skinning_weights(
        gt0, nodes_j, nvalid_j, cfg.node_coverage, k=4
    )
    table = W.SkinTable(anchors, weights, reach)

    per_frame_epe = []
    tracked = [np.asarray(gt[0])]
    nodes_np = np.asarray(nodes_j)
    nvalid_np = np.asarray(nvalid_j)
    est_ids, est_R, est_t = [0], [np.eye(3, dtype=np.float32)], [
        np.zeros(3, np.float32)
    ]
    n_valid_solves = 0
    for i in range(1, args.frames):
        if args.stepwise:
            finfo = fusion.register_frame(seq.load(i))
            n_valid_solves += int(finfo.get("solve_valid", True))
            if args.print_infos:
                print(f"frame {i}: {finfo}", flush=True)
            warp = fusion.warp
            translations = warp.translations
        else:
            state, info = fusion.register_frame_fused(
                sc, state, tables, seq.load(i), motion_params
            )
            n_valid_solves += int(float(info[4]) > 0.5)
            warp = W.WarpFieldState(
                nodes_j, nvalid_j, state.rotations, state.translations
            )
            translations = state.translations
        pred = W.deform_points(warp, gt0, table)
        tracked.append(np.asarray(pred))
        # estimated global rigid pose: Kabsch canonical -> deformed nodes
        # (pivoted transforms: deformed node = g + t)
        deformed_nodes = nodes_np + np.asarray(translations)
        Re, te = rigid_pose_np(nodes_np[nvalid_np], deformed_nodes[nvalid_np])
        est_ids.append(i)
        est_R.append(Re)
        est_t.append(te)
        # evaluate on vertices actually visible in this frame's depth map
        from occlusionfusion_tpu.fusion.tsdf import check_visibility

        vis, _ = check_visibility(
            jnp.asarray(gt[i]), jnp.asarray(depths[i]), intr, 0.01
        )
        visible_mask = np.asarray(reach) & np.asarray(vis)
        per_frame_epe.append(
            float(epe_3d(pred, jnp.asarray(gt[i]), jnp.asarray(visible_mask)))
        )

    ate = trajectory_ate(
        np.stack(tracked)[:, np.asarray(reach)], gt[: args.frames][:, np.asarray(reach)]
    )
    pose_metrics = pose_trajectory_ate(
        np.asarray(est_ids), np.stack(est_R), np.stack(est_t), gt
    )
    elapsed = time.perf_counter() - t0
    metrics = {
        "ate_m": round(ate, 5),
        "pose_ate_m": round(pose_metrics["pose_ate_m"], 5),
        "rot_err_deg": round(pose_metrics["rot_err_deg"], 3),
        "final_epe_m": round(per_frame_epe[-1], 5),
        "mean_epe_m": round(float(np.mean(per_frame_epe)), 5),
        "frames": args.frames,
        "nodes": int(fusion.node_count),
        "seconds": round(elapsed, 1),
        # reference valid-solve ratio (model/evaluate.py, model.py:1611)
        "valid_solve_ratio": round(
            n_valid_solves / max(args.frames - 1, 1), 4
        ),
    }
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(metrics, fh)


if __name__ == "__main__":
    main()
