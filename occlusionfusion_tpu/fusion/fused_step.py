"""The fused fusion step: one device dispatch per frame.

This is the TPU-shaped core of the engine: the *entire* per-frame hot
loop of the reference (``fusion.py:120-194`` — correspondence search,
node visibility, per-node motion observation, occlusion-aware motion
completion, the 100-200-iteration warp solve, transform update, and
warp-aware TSDF integration) compiled into a single jitted function over
a resident ``FusionState`` pytree. Host traffic per frame is exactly one
upload (depth + color) and an optional tiny info readback — against the
reference's dozens of numpy<->device round trips per frame
(``run_model.py:282-331``, SURVEY §5).

The graph-dependent tables (voxel/point skinning, edges, the motion
pyramid) are device-resident constants between keyframe graph rebuilds.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.fusion.correspondence import (
    node_motion_observations,
    projective_correspondences,
)
from occlusionfusion_tpu.fusion.motion_runner import (
    LEVEL_SIZES,
    MotionRunnerState,
    _unpack_pyramid,
    motion_step,
)
from occlusionfusion_tpu.geometry.camera import Intrinsics
from occlusionfusion_tpu.solvers import nicp


class FusionTables(NamedTuple):
    """Device-resident per-graph constants (rebuilt at keyframes only)."""

    vox_points: jnp.ndarray  # [V, 3]
    vox_anchors: jnp.ndarray  # [V, K]
    vox_weights: jnp.ndarray  # [V, K]
    vox_valid: jnp.ndarray  # [V]
    model_points: jnp.ndarray  # [P, 3]
    model_valid: jnp.ndarray  # [P]
    point_anchors: jnp.ndarray  # [P, K]
    point_weights: jnp.ndarray  # [P, K]
    point_valid: jnp.ndarray  # [P]
    nodes: jnp.ndarray  # [N, 3]
    node_valid: jnp.ndarray  # [N]
    edges: jnp.ndarray  # [N, K_e]
    edge_weights: jnp.ndarray  # [N, K_e]
    pyramid_ints: jnp.ndarray  # packed pyramid (motion_runner layout)
    n_nodes: jnp.ndarray  # scalar int32
    # precomputed dense skinning matrix for the voxel warp (ops/lbs.py
    # DenseSkin halves); None -> fall back to Pallas/XLA LBS
    vox_dense_hi: jnp.ndarray = None  # [V, N_pad] bf16
    vox_dense_lo: jnp.ndarray = None  # [V, N_pad] bf16
    # keyframe-static compact-pair scatter plan for the dense-GN block
    # assembly (solvers/gauss_newton_dense.PairScatterPlan); None ->
    # direct full-space segment_sum
    gn_scatter_plan: tuple = None
    # connected-component id per node ([N] int32, -1 padded) — the
    # cluster table for match-starved-component freezing; None disables
    node_clusters: jnp.ndarray = None


class FusionStepState(NamedTuple):
    tsdf: T.TSDFState
    rotations: jnp.ndarray  # [N, 3, 3] canonical -> current
    translations: jnp.ndarray  # [N, 3]
    motion: MotionRunnerState
    # previous frame's RGB-XYZ image [6, H, W] — the optical-flow source
    # (None unless config.use_flow; the scan carries it frame to frame)
    prev_rgbxyz: jnp.ndarray = None
    # absolute frame index of the frame being registered (seeded with
    # frame_id+1 at build_fused, +1 per scanned frame) — drives the
    # Lepard cadence gate on the same absolute phase as the stepwise
    # path's ``frame.index % lepard_every``, including across table
    # rebuilds. None when lepard_every == 1.
    frame_count: jnp.ndarray = None


class FusedStepConfig(NamedTuple):
    tsdf: T.TSDFConfig
    nicp: nicp.NICPConfig
    max_depth_diff: float = 0.1
    use_motion_model: bool = True
    # learned correspondence sources IN the fused dispatch (the
    # reference's per-frame loop runs flow + Lepard + motion GNN every
    # frame, fusion.py:137-148; round 1 had them only in the object-
    # style path with host round trips — VERDICT item 1):
    # PWC flow prev->current lifted to 3D targets, MaskNet-weighted
    use_flow: bool = False
    flow_mask_threshold: float = 0.35
    # eval-time patchwise-max mask thresholding (model.py:987-993): keep
    # only the best-weighted correspondence per PxP patch. 0 = off.
    flow_mask_patch: int = 0
    # "fill" = flow only rescues points without a valid projective
    # target; "override" = reference behavior; "advect" = flow-guided
    # projective hybrid (see pipeline.FusionConfig)
    flow_mode: str = "fill"
    # advect-mode knobs (pipeline.FusionConfig.flow_advect_*)
    flow_advect_min_px: float = 0.0
    flow_advect_weight: float = 1.0
    flow_advect_mask_threshold: float = None
    flow_advect_alpha: float = 1.0
    # PWC+MaskNet resolution divisor (pipeline.FusionConfig.flow_downscale)
    flow_downscale: int = 1
    # perception precision/resolution knobs (sparse lift only):
    # bfloat16 conv stacks and a 1/N-resolution MaskNet
    flow_bf16: bool = False
    mask_downscale: int = 1
    # "dense" materializes the [H,W] lifted-target fields then samples
    # them at the model projections (object-path semantics); "sparse"
    # lifts flow only at the P model projections (first-order identical,
    # skips H*W-scale gathers of the target point image — the envelope
    # image is 287k pixels vs 8k points). flow_mask_patch forces dense
    # (NMS needs the grid).
    flow_lift: str = "dense"
    # Lepard-style matcher scene flow on a device-side deterministic
    # subsample of the target depth cloud
    use_lepard: bool = False
    lepard: tuple = None  # LepardConfig (static, hashable)
    lepard_max_target_points: int = 2048
    # run the matcher only every K-th frame (lax.cond — TPU executes a
    # real branch, so skipped frames pay none of the matcher's cost).
    # The matcher's role is rescuing tangential/large-displacement drift
    # (a slowly-accumulating error mode); projective + flow association
    # track frame-to-frame. 1 = reference behavior (every frame,
    # fusion.py:139).
    lepard_every: int = 1
    # target-subsample selection: "topk" (hash-uniform, one H*W sort) or
    # "strided" (block-stratified argmax, sort-free — see
    # _deterministic_target_subsample)
    lepard_subsample: str = "topk"
    # freeze graph components whose summed match weight falls below this
    # (reference gn_remove_clusters_with_few_matches /
    # gn_min_num_correspondences_per_cluster, model.py:1143-1221; their
    # 1000-2000 at <=10k matches ~ a fixed count — here an absolute
    # weight sum at the configured point cap). 0 disables.
    min_cluster_matches: float = 0.0
    # "nicp" (Adam on SO(3) tangent, reference-faithful budget) or
    # "gn_dense" (dense-assembly Gauss-Newton — ~1 order of magnitude
    # faster per solve on TPU at equal accuracy; see solvers/)
    solver: str = "nicp"
    gn: "GNConfig" = None  # type: ignore[assignment]
    # voxel-warp implementation for the TSDF integrate:
    #   "dense"  — precomputed split-bf16 skinning matrix (DenseSkin),
    #              per-frame LBS is a pure dense matmul (no gathers, no
    #              one-hot build); needs tables.vox_dense_hi/lo
    #   "pallas" — one-hot-matmul Pallas kernel (builds S per call)
    #   "xla"    — gather+einsum (warpfield.deform_points)
    #   "auto"   — dense if the tables carry it, else Pallas on TPU,
    #              else XLA. Inside the per-frame scan the warp varies,
    #              so XLA cannot hoist the [V, K] transform gathers —
    #              measured (64^3 vox / 512 nodes, slope+readback)
    #              5.2 ms/frame XLA-gather LBS vs 3.3 ms Pallas one-hot;
    #              whole scan body 6.8 -> 4.5 ms/frame.
    lbs_impl: str = "auto"
    # motion-completion pyramid padding buckets; must equal
    # level_sizes_for(node cap) so pyramid_ints, the GNN shapes and the
    # carried MotionRunnerState agree (level_sizes[0] == node cap)
    motion_levels: tuple = LEVEL_SIZES


def _rgbxyz_image(depth, color, intr):
    """[6, H, W] RGB (0-1) + camera-space point image — the PWC/MaskNet
    input convention (``frame_loader.py:43-77``'s 6-channel frames)."""
    from occlusionfusion_tpu.geometry.camera import backproject_depth

    xyz = backproject_depth(depth, intr)
    rgb = color.transpose(2, 0, 1) / 255.0
    return jnp.concatenate([rgb, xyz.transpose(2, 0, 1)], 0)


def _deterministic_target_subsample(depth, intr, cap: int,
                                    method: str = "topk"):
    """Static-cap subsample of the target depth cloud, on device.

    Replaces the host-side np.random sampling of the object path
    (pipeline.py round-1 item). Two deterministic selections:

    * ``topk`` — each valid pixel gets a Knuth-hash key of its index and
      the top ``cap`` keys win (uniform over valid pixels; one top_k
      over H*W — at the 448x640 envelope that is a 287k-element sort on
      TPU, the dominant cost of the whole matcher stage).
    * ``strided`` — the image is split into ``cap`` contiguous flat
      blocks and each block contributes its best-hash valid pixel (one
      [cap, H*W/cap] argmax, no sort): spatially stratified over the
      frame, which is at least as good a coverage property for matching
      as hash-uniform, at ~zero cost.

    Returns (points [cap, 3], valid)."""
    from occlusionfusion_tpu.geometry.camera import backproject_depth

    pts = backproject_depth(depth, intr).reshape(-1, 3)
    n = pts.shape[0]
    key = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)) >> 1
    key = jnp.where(depth.reshape(-1) > 0, key.astype(jnp.int32), -1)
    if method == "strided":
        m = -(-n // cap)
        keyp = jnp.pad(key, (0, cap * m - n), constant_values=-1)
        blocks = keyp.reshape(cap, m)
        j = jnp.argmax(blocks, axis=1)
        rows = jnp.arange(cap)
        flat_idx = jnp.minimum(rows * m + j, n - 1)
        valid = blocks[rows, j] >= 0
        return pts[flat_idx], valid
    top, idx = jax.lax.top_k(key, cap)
    return pts[idx], top >= 0


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnums=(1,)
)
def fused_register_frame(
    config: FusedStepConfig,
    state: FusionStepState,
    tables: FusionTables,
    motion_params,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    intr: Intrinsics,
    perception=None,
):
    """One frame, one dispatch. Returns (state, info [4] f32:
    final_loss, n_correspondences, n_visible_nodes, mean_conf)."""
    return _fused_register_frame_impl(
        config, state, tables, motion_params, depth, color, intr,
        perception,
    )


def _fused_register_frame_impl(
    config: FusedStepConfig,
    state: FusionStepState,
    tables: FusionTables,
    motion_params,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    intr: Intrinsics,
    perception=None,
):
    if config.flow_mode not in ("fill", "override", "advect"):
        raise ValueError(
            f"flow_mode must be 'fill', 'override' or 'advect', got "
            f"{config.flow_mode!r}"
        )
    warp = W.WarpFieldState(
        node_positions=tables.nodes,
        node_valid=tables.node_valid,
        rotations=state.rotations,
        translations=state.translations,
    )
    point_table = W.SkinTable(
        tables.point_anchors, tables.point_weights, tables.point_valid
    )
    vox_table = W.SkinTable(
        tables.vox_anchors, tables.vox_weights, tables.vox_valid
    )

    # 1. deform model + nodes
    deformed_pts = W.deform_points(warp, tables.model_points, point_table)
    deformed_nodes = warp.deformed_nodes

    # 2. correspondences + visibility
    targets, corr_valid = projective_correspondences(
        deformed_pts,
        tables.model_valid & tables.point_valid,
        depth,
        intr,
        max_depth_diff=config.max_depth_diff,
    )
    node_visible, _ = T.check_visibility(
        deformed_nodes, depth, intr, config.tsdf.trunc_margin
    )
    node_visible = node_visible & tables.node_valid
    # continuous correspondence weights (MaskNet-as-weights,
    # model.py:1338); projective matches weigh 1
    corr_weight = corr_valid.astype(jnp.float32)
    cur_rgbxyz = None

    # 2b. optical-flow correspondences in-dispatch (run_model.py:70-217
    # equivalent; reference runs it every frame, fusion.py:137):
    # PWC flow prev->current lifted to per-pixel 3D targets, sampled at
    # the deformed points' projections, MaskNet-gated and -weighted
    if config.use_flow:
        from occlusionfusion_tpu.fusion.flow_correspondence import (
            flow_correspondences,
        )
        from occlusionfusion_tpu.geometry.camera import bilinear_sample

        cur_rgbxyz = _rgbxyz_image(depth, color, intr)
        mask_params = (
            perception.get("mask") if perception is not None else None
        )
        z = jnp.maximum(deformed_pts[:, 2], 1e-6)
        u = deformed_pts[:, 0] / z * intr.fx + intr.cx
        v = deformed_pts[:, 1] / z * intr.fy + intr.cy
        h_im, w_im = depth.shape
        inb = (u >= 0) & (u <= w_im - 1) & (v >= 0) & (v <= h_im - 1)
        uv = jnp.stack([u, v], -1)
        use_sparse_lift = (
            config.flow_lift == "sparse" and not config.flow_mask_patch
        )
        adv_uv2 = None
        if use_sparse_lift:
            from occlusionfusion_tpu.fusion.flow_correspondence import (
                flow_targets_at_points,
            )

            if config.flow_mode == "advect":
                sampled, pvalid, wsamp, adv_uv2 = flow_targets_at_points(
                    perception["flow"], state.prev_rgbxyz, cur_rgbxyz, uv,
                    mask_params=mask_params,
                    downscale=config.flow_downscale,
                    bf16=config.flow_bf16,
                    mask_downscale=config.mask_downscale,
                    return_uv2=True,
                )
            else:
                sampled, pvalid, wsamp = flow_targets_at_points(
                    perception["flow"], state.prev_rgbxyz, cur_rgbxyz, uv,
                    mask_params=mask_params,
                    downscale=config.flow_downscale,
                    bf16=config.flow_bf16,
                    mask_downscale=config.mask_downscale,
                )
            ok = inb & pvalid & (deformed_pts[:, 2] > 0)
            if mask_params is not None:
                ok = ok & (wsamp > config.flow_mask_threshold)
        else:
            flow_full, flow_targets, flow_valid, flow_weights = (
                flow_correspondences(
                    perception["flow"], state.prev_rgbxyz, cur_rgbxyz,
                    mask_params=mask_params,
                    downscale=config.flow_downscale,
                )
            )
            if config.flow_mode == "advect":
                adv_uv2 = uv + bilinear_sample(flow_full, uv)
            if mask_params is not None and config.flow_mask_patch:
                from occlusionfusion_tpu.fusion.flow_correspondence import (
                    patchwise_max_weights,
                )

                flow_weights = patchwise_max_weights(
                    flow_weights, config.flow_mask_patch
                )
            sampled = bilinear_sample(flow_targets, uv)
            vsamp = bilinear_sample(
                flow_valid[..., None].astype(jnp.float32), uv
            )[:, 0]
            ok = inb & (vsamp > 0.5) & (deformed_pts[:, 2] > 0)
            if mask_params is not None:
                from occlusionfusion_tpu.fusion.flow_correspondence import (
                    sample_weight_field,
                )

                wsamp = sample_weight_field(
                    flow_weights, u, v,
                    nms_active=bool(config.flow_mask_patch),
                )
                ok = ok & (wsamp > config.flow_mask_threshold)
        if config.flow_mode == "fill":
            # rescue-only (see pipeline.FusionConfig.flow_mode): flow
            # fills points without a valid projective target instead of
            # overriding exact along-ray depth with flow pixel error
            ok = ok & ~corr_valid
        elif config.flow_mode == "advect":
            # flow-guided projective hybrid (see pipeline.register_frame
            # for the rationale): exact along-ray depth at the advected
            # pixel replaces projective association; the lifted sample
            # stays as a fill rescue where the association fails
            from occlusionfusion_tpu.fusion.correspondence import (
                depth_association_at_pixels,
            )

            adv_t, adv_dvalid = depth_association_at_pixels(
                adv_uv2[:, 0], adv_uv2[:, 1], deformed_pts[:, 2],
                depth, intr, config.max_depth_diff,
            )
            gate = inb & (deformed_pts[:, 2] > 0)
            if mask_params is not None:
                thr = (
                    config.flow_advect_mask_threshold
                    if config.flow_advect_mask_threshold is not None
                    else config.flow_mask_threshold
                )
                gate = gate & (wsamp > thr)
            if config.flow_advect_min_px > 0.0:
                gate = gate & (
                    jnp.linalg.norm(adv_uv2 - uv, axis=-1)
                    >= config.flow_advect_min_px
                )
            adv_ok = gate & adv_dvalid
            if config.flow_advect_alpha < 1.0:
                a = jnp.float32(config.flow_advect_alpha)
                adv_t = jnp.where(
                    corr_valid[:, None],
                    a * adv_t + (1.0 - a) * targets,
                    adv_t,
                )
            fill_ok = ok & ~adv_ok & ~corr_valid
            targets = jnp.where(
                adv_ok[:, None], adv_t,
                jnp.where(fill_ok[:, None], sampled, targets),
            )
            w_flow = (
                jnp.clip(wsamp, 0.0, 1.0)
                if mask_params is not None
                else jnp.ones_like(uv[:, 0])
            )
            corr_weight = jnp.where(
                adv_ok, w_flow * config.flow_advect_weight, corr_weight
            )
            corr_weight = jnp.where(fill_ok, w_flow, corr_weight)
            ok = adv_ok | fill_ok
        if config.flow_mode != "advect":
            if mask_params is not None:
                corr_weight = jnp.where(
                    ok, jnp.clip(wsamp, 0.0, 1.0), corr_weight
                )
            else:
                corr_weight = jnp.maximum(
                    corr_weight, ok.astype(jnp.float32)
                )
            targets = jnp.where(ok[:, None], sampled, targets)
        corr_valid = corr_valid | ok

    # 2c. learned scene flow in-dispatch (run_lepard.py:39-78
    # equivalent): matcher flow replaces targets where confidently
    # blended — recovers tangential motion projective association is
    # blind to. Target cloud subsampled deterministically on device.
    if config.use_lepard:
        from occlusionfusion_tpu.models.lepard import scene_flow

        src_valid_l = tables.model_valid & tables.point_valid

        def _run_lepard(operand):
            dpts, dep = operand
            tgt_pcd, tgt_valid = _deterministic_target_subsample(
                dep, intr, config.lepard_max_target_points,
                method=config.lepard_subsample,
            )
            lf, lm, _ = scene_flow(
                perception["lepard"],
                config.lepard,
                dpts,
                src_valid_l,
                tgt_pcd,
                tgt_valid,
            )
            return lf, lm

        if config.lepard_every > 1 and state.frame_count is not None:
            # cadence gate: a real TPU branch — skipped frames pay none
            # of the matcher's pyramid/KPConv/transformer cost
            run_now = (state.frame_count % config.lepard_every) == 0
            lflow, lmask = jax.lax.cond(
                run_now,
                _run_lepard,
                lambda op: (
                    jnp.zeros_like(op[0]),
                    jnp.zeros(op[0].shape[0], bool),
                ),
                (deformed_pts, depth),
            )
        else:
            lflow, lmask = _run_lepard((deformed_pts, depth))
        targets = jnp.where(lmask[:, None], deformed_pts + lflow, targets)
        corr_valid = corr_valid | lmask
        corr_weight = jnp.maximum(corr_weight, lmask.astype(jnp.float32))

    # 2d. freeze match-starved graph components (model.py:1143-1221):
    # their nodes keep the previous transforms and their matches drop
    # out of the solve instead of exploding on garbage association
    solve_mask = tables.node_valid
    if config.min_cluster_matches and tables.node_clusters is not None:
        from occlusionfusion_tpu.fusion.correspondence import (
            cluster_match_filter,
        )

        solve_mask, corr_weight = cluster_match_filter(
            tables.point_anchors,
            tables.point_weights,
            corr_weight,
            tables.node_clusters,
            tables.node_valid,
            config.min_cluster_matches,
        )
        corr_valid = corr_valid & (corr_weight > 0)

    # 3. per-node motion observations
    node_motion, node_observed = node_motion_observations(
        deformed_pts,
        targets,
        corr_valid,
        tables.point_anchors,
        tables.point_weights,
        deformed_nodes,
        node_visible,
    )

    # 4. motion completion (resident GNN state)
    if config.use_motion_model and motion_params is not None:
        pyramid = _unpack_pyramid(tables.pyramid_ints, config.motion_levels)
        motion_state, (completed, conf) = motion_step(
            motion_params,
            state.motion,
            deformed_nodes,
            node_motion,
            node_observed,
            tables.n_nodes,
            pyramid,
            n0_cap=config.motion_levels[0],
        )
        motion_targets = deformed_nodes + completed
        motion_conf = conf[:, 0]
    else:
        motion_state = state.motion
        motion_targets = deformed_nodes + node_motion
        motion_conf = node_observed.astype(jnp.float32)

    # 5. warp solve (warm started at the current transforms)
    P_cap = tables.model_points.shape[0]
    idx = jnp.arange(P_cap)
    problem = nicp.NICPProblem(
        source_points=tables.model_points,
        point_anchors=tables.point_anchors,
        point_weights=tables.point_weights,
        point_valid=tables.model_valid & tables.point_valid,
        nodes=tables.nodes,
        node_valid=tables.node_valid,
        edges=tables.edges,
        edge_weights=tables.edge_weights,
        target_points=targets,
        landmark_src=idx,
        landmark_tgt=idx,
        landmark_valid=corr_weight,
        motion_targets=motion_targets,
        motion_confidence=motion_conf,
    )
    if config.solver == "gn_dense":
        from occlusionfusion_tpu.solvers.gauss_newton import (
            GNConfig,
            GNProblem,
        )
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

        gn_cfg = config.gn if config.gn is not None else GNConfig(
            iters=6,
            w_point=config.nicp.w_ldmk,
            w_arap=config.nicp.w_arap,
            w_motion=config.nicp.w_motion / 100.0,
        )
        gn_problem = GNProblem(
            source_points=problem.source_points,
            point_anchors=problem.point_anchors,
            point_weights=problem.point_weights,
            target_points=problem.target_points,
            point_valid=problem.landmark_valid.astype(jnp.float32),
            nodes=problem.nodes,
            node_valid=problem.node_valid,
            edges=problem.edges,
            edge_weights=problem.edge_weights,
            motion_targets=problem.motion_targets,
            motion_confidence=problem.motion_confidence,
            solve_node_mask=solve_mask,
            intrinsics=jnp.stack(
                [intr.fx, intr.fy, intr.cx, intr.cy]
            ).astype(jnp.float32),
        )
        result = solve_dense(
            gn_problem,
            gn_cfg,
            init_rotations=state.rotations,
            init_translations=state.translations,
            scatter_plan=tables.gn_scatter_plan,
        )
    else:
        result = nicp.solve(
            problem,
            config.nicp,
            init_rotations=state.rotations,
            init_translations=state.translations,
        )

    # 6. integrate through the updated warp
    new_warp = warp._replace(
        rotations=result.rotations, translations=result.translations
    )
    have_dense = tables.vox_dense_hi is not None
    use_dense = config.lbs_impl == "dense" or (
        config.lbs_impl == "auto" and have_dense
    )
    use_pallas = not use_dense and (
        config.lbs_impl == "pallas"
        or (config.lbs_impl == "auto" and jax.default_backend() == "tpu")
    )
    if use_dense:
        from occlusionfusion_tpu.ops.lbs import DenseSkin, lbs_warp_dense

        warped_vox = lbs_warp_dense(
            tables.vox_points,
            vox_table.valid,
            DenseSkin(tables.vox_dense_hi, tables.vox_dense_lo),
            new_warp,
        )
    elif use_pallas:
        from occlusionfusion_tpu.ops.lbs import lbs_warp_pallas

        warped_vox = lbs_warp_pallas(
            tables.vox_points,
            vox_table.anchors,
            vox_table.weights,
            vox_table.valid,
            new_warp,
        )
    else:
        warped_vox = W.deform_points(new_warp, tables.vox_points, vox_table)
    new_tsdf = T.integrate(
        config.tsdf,
        state.tsdf,
        warped_vox,
        tables.vox_valid,
        depth,
        color,
        intr,
    )

    final_loss = (
        result.final_loss
        if hasattr(result, "final_loss")
        else result.residual_history[-1]
    )
    # valid-solve flag (the reference invalidates degenerate solves and
    # reports the valid ratio, model/model.py:1611-1615): gn_dense
    # carries an explicit all-iterations-finite flag; for nicp a finite
    # final loss is the equivalent signal
    solve_valid = (
        result.valid
        if hasattr(result, "valid")
        else jnp.isfinite(final_loss)
    )
    info = jnp.stack(
        [
            final_loss,
            jnp.sum(corr_valid).astype(jnp.float32),
            jnp.sum(node_visible).astype(jnp.float32),
            jnp.sum(motion_conf) / jnp.maximum(jnp.sum(tables.node_valid), 1),
            solve_valid.astype(jnp.float32),
        ]
    )
    if config.use_flow:
        next_rgbxyz = (
            cur_rgbxyz
            if cur_rgbxyz is not None
            else _rgbxyz_image(depth, color, intr)
        )
    else:
        next_rgbxyz = state.prev_rgbxyz
    new_state = FusionStepState(
        tsdf=new_tsdf,
        rotations=result.rotations,
        translations=result.translations,
        motion=motion_state,
        prev_rgbxyz=next_rgbxyz,
        frame_count=(
            state.frame_count + 1
            if state.frame_count is not None
            else None
        ),
    )
    return new_state, info


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnums=(1,)
)
def fused_register_chunk(
    config: FusedStepConfig,
    state: FusionStepState,
    tables: FusionTables,
    motion_params,
    depths: jnp.ndarray,  # [F, H, W]
    colors: jnp.ndarray,  # [F, H, W, 3]
    intr: Intrinsics,
    perception=None,
):
    """Scan F frames in ONE dispatch (sequential dependency preserved).

    Amortizes the per-dispatch host round trip the same way the motion
    demo's chunked path does; returns (state, infos [F, 4])."""

    def body(state, frame):
        depth, color = frame
        return _fused_register_frame_impl(
            config, state, tables, motion_params, depth, color, intr,
            perception,
        )

    return jax.lax.scan(body, state, (depths, colors))
