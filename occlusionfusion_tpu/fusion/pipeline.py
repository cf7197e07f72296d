"""DynamicFusion orchestrator: the end-to-end non-rigid fusion loop.

TPU-native re-design of the reference's main product
(``fusion_with_occlusion/fusion.py`` ``DynamicFusion``): per frame,
  1. deform the canonical model through the warp field,
  2. associate it with the target depth (projective correspondences; the
     learned Lepard/DeformNet sources plug into the same interface),
  3. derive per-node motion observations + visibility,
  4. complete occluded node motion with the LSTM-GNN (+ confidence),
  5. solve the warp field (N-ICP: ARAP + landmark + motion terms,
     warm-started from the previous frame),
  6. integrate the target frame into the TSDF through the warp.

State layout is TPU-first: the TSDF volume, skinning tables, node
transforms and motion history are resident device arrays at static padded
shapes; the host only decodes images, runs the keyframe graph build
(native C++), and reads back requested outputs. Graph growth
(``warpfield.py:487-583``) is not yet wired — the reference ships with it
disabled in the fusion loop too (``fusion.py:185``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.fusion.correspondence import (
    node_motion_observations,
    projective_correspondences,
)
from occlusionfusion_tpu.fusion.frame_loader import Frame
from occlusionfusion_tpu.fusion.motion_runner import (
    MotionCompletionRunner,
)
from occlusionfusion_tpu.graph.edgraph import (
    GraphConfig,
    build_graph_from_mesh,
)
from occlusionfusion_tpu.graph import native
from occlusionfusion_tpu.solvers.nicp import NICPConfig, NICPProblem, solve


@dataclass
class FusionConfig:
    vol_dim: tuple = (128, 128, 128)
    voxel_size: float = 0.005  # fusion.py:231-233 defaults
    trunc_margin_vox: float = 4.0
    node_coverage: float = 0.05
    max_nodes: int = 512
    max_points: int = 8192
    max_depth_diff: float = 0.1
    graph: GraphConfig = field(default_factory=GraphConfig)
    nicp: NICPConfig = field(default_factory=lambda: NICPConfig(iters=100))
    use_motion_model: bool = True
    # grow the graph onto newly observed surface every N frames (0 = off;
    # the reference ships growth disabled in its loop too, fusion.py:185)
    growth_interval: int = 0
    # warp solver for the fused path: "nicp" or "gn_dense"
    solver: str = "nicp"
    # voxel-warp impl for the fused path (see FusedStepConfig.lbs_impl);
    # "auto" precomputes the dense split-bf16 skinning matrix on TPU
    # when it fits dense_skin_max_bytes, else Pallas/XLA
    lbs_impl: str = "auto"
    dense_skin_max_bytes: int = 1 << 30
    # sparse bricked TSDF (fusion/bricks.py): 0 = dense grid; >0 = brick
    # edge in voxels; -1 (default) = auto — bricked (edge 8) at >= 128^3
    # virtual voxels, dense below. Only bricks within the truncation
    # band of observed surface (dilated brick_dilate bricks for
    # inter-keyframe motion) are allocated/warped/integrated — at the
    # reference's 128^3 default the active set is typically 5-15% of
    # the volume, and the dense 128^3 LBS program reproducibly fails
    # the axon remote compiler (CLAUDE.md), so bricking is the
    # production default at that scale. The active set refreshes at
    # growth keyframes (growth_interval). Free-space-carving deviation
    # quantified in tests/test_carving.py.
    brick_size: int = -1
    max_bricks: int = 2048
    brick_dilate: int = 1
    # explicit Gauss-Newton config for solver="gn_dense" (None = derive
    # weights from the nicp config)
    gn: object = None
    # optional learned scene-flow source (Lepard-style matcher); when set
    # (with lepard_params passed to DynamicFusion), matcher flow overrides
    # projective targets where the blend mask is confident
    use_lepard: bool = False
    lepard_max_target_points: int = 4096
    # run the matcher every K-th frame in the fused engine (lax.cond
    # branch — skipped frames pay none of its cost; the matcher corrects
    # slowly-accumulating tangential drift, so sub-frame-rate cadence is
    # an accuracy/speed knob; A/B with evaluate_dt4d --lepard_every)
    lepard_every: int = 1
    # target-subsample: "topk" hash-uniform (one 287k sort at the
    # envelope) or "strided" block-stratified argmax (sort-free)
    lepard_subsample: str = "topk"
    # optional optical-flow source (PWC-Net; flow_params required):
    # flow-lifted per-pixel 3D targets override projective association for
    # model points whose flowed sample is valid (run_model.py:115-217)
    use_flow: bool = False
    # MaskNet gating of flow correspondences (model.py:969-994 eval
    # threshold semantics): a flow sample only overrides projective
    # association where the predicted correspondence weight exceeds this
    # (requires mask_params; ignored otherwise)
    flow_mask_threshold: float = 0.35
    # eval-time patchwise-max mask thresholding (model.py:987-993): keep
    # only the best-weighted correspondence per PxP patch (per-patch
    # non-max suppression). 0 = off; mutually composable with the scalar
    # threshold (patch selection first, then the > threshold gate).
    flow_mask_patch: int = 0
    # how flow correspondences combine with projective association:
    # "fill" (default) = flow only where no valid projective target
    # exists; "override" = flow replaces projective wherever the mask
    # gate passes (the reference's behavior — measurably worse when the
    # flow net's pixel error exceeds projective depth accuracy);
    # "advect" = flow-guided projective hybrid: the projection is
    # advected by the flow and the target takes the EXACT along-ray
    # depth at the advected pixel (same-surface-gated bilinear) —
    # flow's tangential signal with projective's depth accuracy, with
    # fill-style lifted rescue where the depth association fails
    flow_mode: str = "fill"
    # advect-mode noise gate: only advect where the sampled flow
    # magnitude exceeds this many pixels — the flow net's ~1 px error
    # is pure tangential noise on quasi-static surface regions where
    # projective association is already exact; real tangential motion
    # (a rotating limb at the working scale is 2-3 px/frame) clears
    # the gate. 0 = advect everywhere the association succeeds.
    flow_advect_min_px: float = 0.0
    # solver weight multiplier for advected correspondences (their
    # tangential component carries flow noise; projective matches
    # keep weight 1)
    flow_advect_weight: float = 1.0
    # MaskNet threshold for the advect OVERRIDE specifically (fill
    # rescue keeps flow_mask_threshold): overriding an exact projective
    # target demands higher flow confidence than rescuing a point that
    # has no target at all. None = use flow_mask_threshold.
    flow_advect_mask_threshold: float | None = None
    # blend factor between the advected and the projective target where
    # BOTH are valid (target = alpha*advect + (1-alpha)*projective).
    # Both targets carry exact along-ray depth; they differ only
    # tangentially, so alpha scales the tangential correction — flow
    # noise is zero-mean per frame while tangential drift is
    # systematic, so a partial correction still converges drift while
    # injecting proportionally less noise. 1 = full advect.
    flow_advect_alpha: float = 1.0
    # run PWC+MaskNet at 1/N resolution (lift stays full-res): the
    # correlation pyramid at the reference's 448x640 dominates the
    # perception hot loop; 2 quarters its cost for ~proportional px
    # error (which the fill semantics tolerate)
    flow_downscale: int = 1
    # fused-path flow lift: "dense" (materialize [H,W] lifted fields,
    # object-path semantics) or "sparse" (lift only at the model
    # projections — skips image-scale gathers; see fused_step)
    flow_lift: str = "dense"
    # sparse-lift perception in bfloat16 (MXU-native; <0.1 px flow
    # delta measured on the rendered eval) and MaskNet at 1/N res
    flow_bf16: bool = False
    mask_downscale: int = 1
    # keyframe pose graph for long-sequence drift correction (north-star
    # subsystem, no reference counterpart): record a keyframe every N
    # frames (0 = off); loop closures re-register the current model
    # against earlier keyframes' stored depth within loop_radius
    keyframe_interval: int = 0
    max_keyframes: int = 64
    loop_radius: float = 0.3
    loop_align_iters: int = 5
    loop_min_inliers: float = 0.3
    # loop-closure gating: only keyframes at least this many keyframes
    # apart are candidates (temporally-adjacent "loops" just re-measure
    # odometry), and the rigid alignment must leave a residual below
    # this (a true revisit aligns tightly; non-rigid shape change does
    # not — rejecting it keeps deformation from masquerading as drift)
    loop_min_separation: int = 5
    loop_max_residual: float = 0.01
    # freeze graph components whose summed match weight drops below this
    # (reference gn_remove_clusters_with_few_matches, model.py:1143-1221);
    # 0 disables (the reference's fusion settings default it off too)
    min_cluster_matches: float = 0.0
    # re-localize (rigidly re-anchor the warp onto the current
    # observation) only as last-resort recovery: the model must be badly
    # off the surface (median residual above this) AND the rigid fix
    # must halve the residual — ordinary non-rigid tracking error is the
    # solver's job, not a rigid yank's
    relocalize_threshold: float = 0.02
    # wide-baseline recovery gates (track-lost relocalization): minimum
    # observed-depth pixels to attempt recovery, and the stricter final
    # inlier fraction a recovered pose must reach to be adopted
    relocalize_min_obs_px: int = 400
    relocalize_recover_inliers: float = 0.5
    # wide-baseline recovery master switch — DEFAULT OFF (the
    # documented end-state decision, docs/EVAL_MATRIX.md regime 3):
    # geometric recovery re-acquires the surface but cannot restore its
    # IDENTITY under rotational ambiguity, so it trades mid-sequence
    # ATE (247 -> 195 mm measured) for a WORSE final-frame EPE
    # (110 -> 278 mm) — a user tracking to the end of a clip is worse
    # off. Enable explicitly for mid-sequence-accuracy use cases; a
    # rotation-robust matcher (feature-seeded recovery,
    # relocalize_feat_min_points) is the prerequisite for lifting this
    # default.
    relocalize_recovery: bool = False
    # feature-based recovery: when the matcher is configured, a Kabsch
    # pose over its (coherence-filtered) blended scene flow seeds the
    # wide-baseline recovery ICP — carrying ROTATION, which geometric
    # centroid init cannot (the revisit clip's surface-identity
    # caveat). Requires at least this many blended-flow points to
    # trust the feature pose. Default 0 = OFF (opt-in): measured as a
    # net negative with current matchers (final-frame EPE 311.8 vs
    # 278.0 mm geometric-only, docs/EVAL_MATRIX.md regime 3) — the
    # documented ships-default-off decision.
    relocalize_feat_min_points: int = 0
    # skip re-anchoring when the pose-graph correction is below this
    # (rotation angle rad + translation m)
    min_correction: float = 1e-4

    def __post_init__(self):
        # an unknown flow_mode would silently fall through to override
        # semantics, which measurably doubles tracking error on
        # articulated clips — fail loudly instead
        if self.flow_mode not in ("fill", "override", "advect"):
            raise ValueError(
                f"flow_mode must be 'fill', 'override' or 'advect', got "
                f"{self.flow_mode!r}"
            )
        if self.flow_lift not in ("dense", "sparse"):
            raise ValueError(
                f"flow_lift must be 'dense' or 'sparse', got "
                f"{self.flow_lift!r}"
            )
        if self.lepard_every < 1:
            raise ValueError(
                f"lepard_every must be >= 1, got {self.lepard_every}"
            )
        if self.solver not in ("nicp", "gn_dense"):
            raise ValueError(
                f"solver must be 'nicp' or 'gn_dense', got {self.solver!r}"
            )


class DynamicFusion:
    def __init__(self, sequence, config: FusionConfig,
                 motion_params=None, lepard_params=None,
                 lepard_config=None, flow_params=None, mask_params=None):
        self.seq = sequence
        self.config = config
        self.intr = sequence.intrinsics
        self.motion_runner: Optional[MotionCompletionRunner] = None
        if config.use_motion_model and motion_params is not None:
            self.motion_runner = MotionCompletionRunner(
                motion_params, n0_cap=config.max_nodes
            )
        # park every perception checkpoint on device ONCE. Checkpoints
        # load as numpy pytrees (~200 leaves, tens of MB); passed raw as
        # jit arguments they are re-uploaded host->device on EVERY
        # dispatch — measured through the axon relay (scripts/
        # probe_param_upload.py, 2026-08-21): lepard 1881 ms/call,
        # pwc+mask 993 ms, motion 43 ms vs <1 ms device-resident. That
        # re-upload, amortized over the 16-frame chunk, was the entire
        # "in-scan perception overhead" of round 3 (118/62/2.7 ms/frame
        # — matching the +86-119/+34-44/+2 ms stage deltas).
        self.lepard_params = self._device_params(lepard_params)
        self.lepard_config = lepard_config
        if config.use_lepard and lepard_params is None:
            raise ValueError("use_lepard requires lepard_params")
        self.flow_params = self._device_params(flow_params)
        self.mask_params = self._device_params(mask_params)
        if config.use_flow and flow_params is None:
            raise ValueError("use_flow requires flow_params")
        self.prev_frame: Optional[Frame] = None
        self.frame_id = -1
        self.prev_R = None
        self.prev_t = None
        self.brick_grid = None

    def _device_params(self, tree):
        """Device-resident copy of a param pytree, cached by identity so
        the same host tree passed on every call uploads exactly once
        (numpy leaves as jit args re-upload per dispatch — see __init__
        note)."""
        if tree is None:
            return None
        cache = getattr(self, "_devparam_cache", None)
        if cache is None:
            cache = self._devparam_cache = {}
        hit = cache.get(id(tree))
        if hit is not None and hit[0] is tree:
            return hit[1]
        leaves = jax.tree.leaves(tree)
        if leaves and all(isinstance(x, jax.Array) for x in leaves):
            return tree  # already device-resident
        dev = jax.device_put(tree)
        cache[id(tree)] = (tree, dev)
        return dev

    # ------------------------------------------------------------------
    def initialize(self, frame: Frame):
        """Reference create_tsdf (fusion.py:48-103): integrate the source
        frame, extract the mesh, build the graph, skin everything."""
        cfg = self.config
        trunc = cfg.trunc_margin_vox * cfg.voxel_size
        self.tsdf_config = T.TSDFConfig(
            vol_dim=cfg.vol_dim,
            voxel_size=cfg.voxel_size,
            trunc_margin=trunc,
        )
        origin = T.volume_bounds_from_frame(
            frame.depth, self.intr, cfg.vol_dim, cfg.voxel_size
        )
        # resolve brick_size -1 = auto: bricked at the reference's
        # 128^3 envelope and above, dense below
        self.brick_size = cfg.brick_size
        if self.brick_size < 0:
            self.brick_size = (
                8 if int(np.prod(cfg.vol_dim)) >= 128**3 else 0
            )
        if self.brick_size:
            from occlusionfusion_tpu.fusion import bricks as BR

            self.brick_grid = BR.BrickGrid(
                vol_dim=cfg.vol_dim,
                voxel_size=cfg.voxel_size,
                brick=self.brick_size,
                max_bricks=cfg.max_bricks,
            )
            ids = BR.active_bricks_from_depth(
                self.brick_grid, np.asarray(origin), frame.depth,
                self.intr, trunc, dilate=cfg.brick_dilate,
            )
            self.brick_ids = BR.pack_brick_ids(self.brick_grid, ids)
            self.tsdf = BR.create_brick_volume(self.brick_grid, origin)
            vox_np, bvalid = BR.brick_voxel_points(
                self.brick_grid, np.asarray(origin), self.brick_ids
            )
            self.vox_points = jnp.asarray(vox_np)
            self.brick_valid = jnp.asarray(bvalid)
        else:
            self.brick_grid = None
            self.tsdf = T.create_volume(self.tsdf_config, origin)
            self.vox_points = T.voxel_world_points(
                self.tsdf_config, self.tsdf.origin
            )
            self.brick_valid = jnp.ones(self.vox_points.shape[0], bool)
        depth = jnp.asarray(frame.depth)
        color = jnp.asarray(frame.color)
        self.tsdf = T.integrate(
            self.tsdf_config,
            self.tsdf,
            self.vox_points,
            self.brick_valid,
            depth,
            color,
            self.intr,
        )

        # host: mesh + graph
        verts_vox, faces = self._extract_mesh_host()
        graph = build_graph_from_mesh(verts_vox, faces, cfg.graph)
        self.graph = graph
        n = graph.nodes.shape[0]
        cap = cfg.max_nodes
        assert n <= cap, f"{n} nodes exceed cap {cap}"
        nodes_p = np.zeros((cap, 3), np.float32)
        nodes_p[:n] = graph.nodes
        node_valid = np.zeros(cap, bool)
        node_valid[:n] = True
        edges_p = -np.ones((cap, graph.edges.shape[1]), np.int32)
        edges_p[:n] = graph.edges
        ew_p = np.zeros((cap, graph.edges.shape[1]), np.float32)
        ew_p[:n] = graph.edge_weights
        self.node_count = n
        self.nodes = jnp.asarray(nodes_p)
        self.node_valid = jnp.asarray(node_valid)
        self.edges = jnp.asarray(edges_p)
        self.edge_weights = jnp.asarray(ew_p)
        clusters_p = -np.ones(cap, np.int32)
        clusters_p[:n] = graph.clusters
        self.node_clusters = jnp.asarray(clusters_p)

        self.warp = W.create_warpfield(self.nodes, self.node_valid)

        # canonical model points: mesh vertices, subsampled/padded
        self._set_canonical_points(verts_vox)
        # voxel skinning table (re-used every integrate); in bricked
        # mode free-slot voxels are masked out of the warp + integrate
        self.vox_table = self._skin_vox()
        self.frame_id = frame.index
        self.prev_frame = frame
        if self.motion_runner is not None:
            self.motion_runner.reset()
        self.keyframes = []
        if cfg.keyframe_interval:
            self._record_keyframe(frame)

    def _skin_vox(self):
        table = W.skin(
            self.warp, self.vox_points, self.config.node_coverage
        )
        if self.brick_grid is not None:
            table = table._replace(valid=table.valid & self.brick_valid)
        return table

    def _extract_mesh_host(self):
        if self.brick_grid is not None:
            from occlusionfusion_tpu.fusion import bricks as BR

            tsdf_np, w_np = BR.scatter_to_dense(
                self.brick_grid,
                self.brick_ids,
                np.asarray(self.tsdf.tsdf),
                np.asarray(self.tsdf.weight),
            )
            mask = BR.truncated_region_mask_np(tsdf_np, w_np)
        else:
            tsdf_np = np.asarray(self.tsdf.tsdf)
            mask = np.asarray(
                T.truncated_region_mask(self.tsdf.tsdf, self.tsdf.weight)
            ).astype(np.uint8)
        verts_vox, faces = native.marching_cubes(tsdf_np, mask, iso=0.0)
        verts = (
            verts_vox * self.tsdf_config.voxel_size
            + np.asarray(self.tsdf.origin)[None, :]
        )
        return verts.astype(np.float32), faces

    def _set_canonical_points(self, verts: np.ndarray):
        cap = self.config.max_points
        n = verts.shape[0]
        if n > cap:
            sel = np.random.RandomState(0).choice(n, cap, replace=False)
            verts = verts[sel]
            n = cap
        pts = np.zeros((cap, 3), np.float32)
        pts[:n] = verts
        pvalid = np.zeros(cap, bool)
        pvalid[:n] = True
        self.model_points = jnp.asarray(pts)
        self.model_valid = jnp.asarray(pvalid)
        self.point_table = W.skin(
            self.warp, self.model_points, self.config.node_coverage
        )

    # ------------------------------------------------------------------
    def register_frame(self, frame: Frame):
        """One iteration of the hot loop (fusion.py:120-194)."""
        cfg = self.config
        depth = jnp.asarray(frame.depth)
        color = jnp.asarray(frame.color)
        # boundary pixels are excluded from correspondence search but
        # still integrated (the reference uses its boundary mask for
        # match validity only, model/dataset.py:212, model/model.py:202)
        corr_depth = depth
        if frame.boundary is not None:
            corr_depth = jnp.where(jnp.asarray(frame.boundary), 0.0, depth)

        # 1. deform model + nodes with current estimate
        deformed_pts = W.deform_points(
            self.warp, self.model_points, self.point_table
        )
        deformed_nodes = self.warp.deformed_nodes

        # 2. correspondences + node visibility (tsdf.py:599-638)
        targets, corr_valid = projective_correspondences(
            deformed_pts,
            self.model_valid & self.point_table.valid,
            corr_depth,
            self.intr,
            max_depth_diff=cfg.max_depth_diff,
        )
        node_visible, _ = T.check_visibility(
            deformed_nodes, depth, self.intr, self.tsdf_config.trunc_margin
        )
        node_visible = node_visible & self.node_valid
        # continuous correspondence weights the solver consumes
        # (model.py:1338 weights_k = source_weights * correspondence
        # weights): projective matches weigh 1, flow-sourced matches
        # weigh the MaskNet prediction
        corr_weight = corr_valid.astype(jnp.float32)

        # optional optical-flow source (run_model.py:115-217 equivalent):
        # flow predicted source->target at full res, lifted to per-pixel 3D
        # targets; model points sample their flowed target at their source
        # projection
        if self.config.use_flow and self.prev_frame is not None:
            from occlusionfusion_tpu.fusion.flow_correspondence import (
                flow_correspondences,
            )
            from occlusionfusion_tpu.geometry.camera import (
                backproject_depth,
                bilinear_sample,
            )

            def rgbxyz(f: Frame):
                xyz = backproject_depth(jnp.asarray(f.depth), self.intr)
                rgb = jnp.asarray(f.color).transpose(2, 0, 1) / 255.0
                return jnp.concatenate([rgb, xyz.transpose(2, 0, 1)], 0)

            flow_full, flow_targets, flow_valid, flow_weights = (
                flow_correspondences(
                    self.flow_params, rgbxyz(self.prev_frame), rgbxyz(frame),
                    mask_params=self.mask_params,
                    downscale=self.config.flow_downscale,
                )
            )
            if self.mask_params is not None and self.config.flow_mask_patch:
                from occlusionfusion_tpu.fusion.flow_correspondence import (
                    patchwise_max_weights,
                )

                flow_weights = patchwise_max_weights(
                    flow_weights, self.config.flow_mask_patch
                )
            # sample flowed targets at the deformed points' projections
            z = jnp.maximum(deformed_pts[:, 2], 1e-6)
            u = deformed_pts[:, 0] / z * self.intr.fx + self.intr.cx
            v = deformed_pts[:, 1] / z * self.intr.fy + self.intr.cy
            h_im, w_im = frame.depth.shape
            inb = (u >= 0) & (u <= w_im - 1) & (v >= 0) & (v <= h_im - 1)
            uv = jnp.stack([u, v], -1)
            sampled = bilinear_sample(flow_targets, uv)
            vsamp = bilinear_sample(
                flow_valid[..., None].astype(jnp.float32), uv
            )[:, 0]
            ok = inb & (vsamp > 0.5) & (deformed_pts[:, 2] > 0)
            if self.mask_params is not None:
                # MaskNet (model.py:969-994): the threshold decides
                # whether a flow sample overrides projective association;
                # the continuous prediction then weights the residual in
                # the solve (weights, not a gate — model.py:1338).
                # NMS'd fields are sampled nearest-neighbor (see
                # sample_weight_field).
                from occlusionfusion_tpu.fusion.flow_correspondence import (
                    sample_weight_field,
                )

                wsamp = sample_weight_field(
                    flow_weights, u, v,
                    nms_active=bool(self.config.flow_mask_patch),
                )
                ok = ok & (wsamp > self.config.flow_mask_threshold)
            if self.config.flow_mode == "fill":
                # flow RESCUES points with no valid projective target
                # (occlusion/disocclusion/large displacement) but never
                # overrides a valid one: a projective target is exact
                # along the ray while the lifted flow carries the flow
                # net's pixel error (~mm) everywhere — measured on the
                # arms clip, global override doubles tracking error
                ok = ok & ~corr_valid
            elif self.config.flow_mode == "advect":
                # flow-guided projective hybrid: advect each model
                # point's projection by the sampled flow, then take the
                # EXACT along-ray depth at the advected pixel via the
                # same-surface-gated bilinear association — flow
                # contributes the TANGENTIAL pixel displacement that
                # plain projective association cannot see (it always
                # re-associates along the ray, so on a fully-visible
                # surface fill-mode flow never engages and tangential
                # drift goes uncorrected), while the depth association
                # keeps projective's exact-depth property that makes
                # override-mode's bilinear 3-D lift lose. Advected
                # targets REPLACE projective where the depth
                # association succeeds; the lifted sample remains as a
                # fill rescue where it doesn't.
                from occlusionfusion_tpu.fusion.correspondence import (
                    depth_association_at_pixels,
                )

                fsamp = bilinear_sample(flow_full, uv)  # [P, 2] px
                uv2 = uv + fsamp
                adv_t, adv_dvalid = depth_association_at_pixels(
                    uv2[:, 0], uv2[:, 1], deformed_pts[:, 2],
                    corr_depth, self.intr, cfg.max_depth_diff,
                )
                gate = inb & (deformed_pts[:, 2] > 0)
                if self.mask_params is not None:
                    thr = (
                        cfg.flow_advect_mask_threshold
                        if cfg.flow_advect_mask_threshold is not None
                        else cfg.flow_mask_threshold
                    )
                    gate = gate & (wsamp > thr)
                if cfg.flow_advect_min_px > 0.0:
                    gate = gate & (
                        jnp.linalg.norm(fsamp, axis=-1)
                        >= cfg.flow_advect_min_px
                    )
                adv_ok = gate & adv_dvalid
                if cfg.flow_advect_alpha < 1.0:
                    # partial tangential correction where projective is
                    # also valid; full advect where it is the only target
                    a = jnp.float32(cfg.flow_advect_alpha)
                    adv_t = jnp.where(
                        corr_valid[:, None],
                        a * adv_t + (1.0 - a) * targets,
                        adv_t,
                    )
                # fill rescue where advection failed: lifted target for
                # points with no projective association (fill's win)
                fill_ok = ok & ~adv_ok & ~corr_valid
                targets = jnp.where(
                    adv_ok[:, None], adv_t,
                    jnp.where(fill_ok[:, None], sampled, targets),
                )
                w_flow = (
                    jnp.clip(wsamp, 0.0, 1.0)
                    if self.mask_params is not None
                    else jnp.ones_like(fsamp[:, 0])
                )
                corr_weight = jnp.where(
                    adv_ok, w_flow * cfg.flow_advect_weight, corr_weight
                )
                corr_weight = jnp.where(fill_ok, w_flow, corr_weight)
                ok = adv_ok | fill_ok
            if self.config.flow_mode != "advect":
                if self.mask_params is not None:
                    corr_weight = jnp.where(
                        ok, jnp.clip(wsamp, 0.0, 1.0), corr_weight
                    )
                else:
                    corr_weight = jnp.maximum(
                        corr_weight, ok.astype(jnp.float32)
                    )
                targets = jnp.where(ok[:, None], sampled, targets)
            corr_valid = corr_valid | ok

        # optional learned scene flow (run_lepard.py:39-78 equivalent):
        # matcher flow replaces projective targets where confidently
        # blended — this is the component that recovers tangential motion
        # projective association is blind to. lepard_every > 1 runs it at
        # reduced cadence (drift correction, not frame-to-frame tracking)
        if self.config.use_lepard and (
            frame.index % self.config.lepard_every == 0
        ):
            from occlusionfusion_tpu.fusion.fused_step import (
                _deterministic_target_subsample,
            )
            from occlusionfusion_tpu.models.lepard import scene_flow

            # same device-side deterministic subsample as the fused
            # engine (engines agree; lepard_subsample A/Bs apply here)
            tgt_pcd, tgt_valid = _deterministic_target_subsample(
                depth, self.intr, self.config.lepard_max_target_points,
                method=self.config.lepard_subsample,
            )
            flow, flow_mask, _ = scene_flow(
                self.lepard_params,
                self.lepard_config,
                deformed_pts,
                self.model_valid & self.point_table.valid,
                jnp.asarray(tgt_pcd),
                jnp.asarray(tgt_valid),
            )
            lepard_targets = deformed_pts + flow
            targets = jnp.where(flow_mask[:, None], lepard_targets, targets)
            corr_valid = corr_valid | flow_mask
            corr_weight = jnp.maximum(
                corr_weight, flow_mask.astype(jnp.float32)
            )

        # 2d. freeze match-starved graph components (model.py:1143-1221)
        solve_mask = self.node_valid
        if cfg.min_cluster_matches:
            from occlusionfusion_tpu.fusion.correspondence import (
                cluster_match_filter,
            )

            solve_mask, corr_weight = cluster_match_filter(
                self.point_table.anchors,
                self.point_table.weights,
                corr_weight,
                self.node_clusters,
                self.node_valid,
                cfg.min_cluster_matches,
            )
            corr_valid = corr_valid & (corr_weight > 0)

        # 3. per-node motion observations
        node_motion, node_observed = node_motion_observations(
            deformed_pts,
            targets,
            corr_valid,
            self.point_table.anchors,
            self.point_table.weights,
            deformed_nodes,
            node_visible,
        )

        # 4. occlusion-aware motion completion
        if self.motion_runner is not None:
            motion_np, conf_np = self.motion_runner.run_frame(
                node_pos=np.asarray(deformed_nodes)[: self.node_count],
                node_motion=np.asarray(node_motion)[: self.node_count],
                visible=np.asarray(node_observed)[: self.node_count],
                nn_indexes=[
                    self.graph.pyramid[f"nn_index_l{l}"] for l in range(4)
                ],
                down_idxs=[
                    self.graph.pyramid[f"down_sample_idx{i}"] for i in (1, 2, 3)
                ],
                up_idxs=[
                    self.graph.pyramid[f"up_sample_idx{i}"] for i in (1, 2, 3)
                ],
            )
            cap = cfg.max_nodes
            completed = np.zeros((cap, 3), np.float32)
            completed[: self.node_count] = motion_np
            confidence = np.zeros(cap, np.float32)
            confidence[: self.node_count] = conf_np
            motion_targets = deformed_nodes + jnp.asarray(completed)
            motion_conf = jnp.asarray(confidence)
        else:
            motion_targets = deformed_nodes + node_motion
            motion_conf = node_observed.astype(jnp.float32)

        # 5. warp-field solve (canonical -> target), warm started
        P_cap = self.model_points.shape[0]
        idx = jnp.arange(P_cap)
        problem = NICPProblem(
            source_points=self.model_points,
            point_anchors=self.point_table.anchors,
            point_weights=self.point_table.weights,
            point_valid=self.model_valid & self.point_table.valid,
            nodes=self.nodes,
            node_valid=self.node_valid,
            edges=self.edges,
            edge_weights=self.edge_weights,
            target_points=targets,
            landmark_src=idx,
            landmark_tgt=idx,
            landmark_valid=corr_weight,
            motion_targets=motion_targets,
            motion_confidence=motion_conf,
        )
        if cfg.solver == "gn_dense":
            from occlusionfusion_tpu.solvers.gauss_newton import (
                GNConfig,
                GNProblem,
            )
            from occlusionfusion_tpu.solvers.gauss_newton_dense import (
                solve_dense,
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
                intrinsics=jnp.asarray(
                    [self.intr.fx, self.intr.fy, self.intr.cx, self.intr.cy],
                    jnp.float32,
                ),
            )
            gn_cfg = cfg.gn if cfg.gn is not None else GNConfig(
                iters=6,
                w_point=cfg.nicp.w_ldmk,
                w_arap=cfg.nicp.w_arap,
                w_motion=cfg.nicp.w_motion / 100.0,
            )
            result = solve_dense(
                gn_problem,
                gn_cfg,
                init_rotations=self.prev_R,
                init_translations=self.prev_t,
            )
        else:
            result = solve(
                problem,
                cfg.nicp,
                init_rotations=self.prev_R,
                init_translations=self.prev_t,
            )
        self.prev_R = result.rotations
        self.prev_t = result.translations
        self.warp = W.update_transforms(
            self.warp, result.rotations, result.translations
        )

        # 6. integrate the target frame through the warp
        warped_vox = W.deform_points(self.warp, self.vox_points, self.vox_table)
        self.tsdf = T.integrate(
            self.tsdf_config,
            self.tsdf,
            warped_vox,
            self.vox_table.valid,
            depth,
            color,
            self.intr,
        )
        self.frame_id = frame.index
        self.prev_frame = frame
        _floss = float(
            result.final_loss
            if hasattr(result, "final_loss")
            else result.residual_history[-1]
        )
        info = {
            "final_loss": _floss,
            "n_correspondences": int(jnp.sum(corr_valid)),
            "n_visible_nodes": int(jnp.sum(node_visible)),
            "n_new_nodes": 0,
            # reference valid-solve accounting (model.py:1611-1615)
            "solve_valid": bool(
                result.valid if hasattr(result, "valid")
                else np.isfinite(_floss)
            ),
        }
        # track-loss state (drives wide-baseline relocalization; see
        # _relocalize): tracking is LOST once a frame finds (almost) no
        # correspondences — the object left the frustum / total
        # occlusion. Sticky until a successful recovery clears it: a
        # later frame can report plenty of correspondences while the
        # model sits on the wrong surface (sliver collapse), so a high
        # count alone must NOT clear the state.
        if info["n_correspondences"] < 16:
            self.track_lost = True

        # 7. optional graph growth onto newly observed surface
        if (
            cfg.growth_interval
            and frame.index % cfg.growth_interval == 0
        ):
            info["n_new_nodes"] = self._grow(frame)

        # 8. optional keyframe bookkeeping: observation-grounded
        # re-localization + pose-graph trajectory maintenance
        if (
            cfg.keyframe_interval
            and frame.index % cfg.keyframe_interval == 0
        ):
            self._record_keyframe(frame)
            info["pose_correction"] = self._relocalize(self.keyframes[-1])
            info["reloc_feat_matches"] = getattr(
                self, "reloc_feat_matches", -1
            )
            info["loop_closures"] = self._pose_graph_update()
        return info

    # ------------------------------------------------------------------
    # keyframe pose graph (fusion/pose_graph.py + fusion/loop_closure.py)

    def _record_keyframe(self, frame: Frame):
        """Estimate the model's global rigid pose (Kabsch canonical ->
        deformed over valid nodes) and store it with the observation:
        the depth image plus a padded subsample of its backprojected
        points (the loop-closure source — measurements must come from
        observations, not from the possibly-drifted model state)."""
        from occlusionfusion_tpu.geometry.kabsch import weighted_kabsch

        w = self.node_valid.astype(jnp.float32)
        R, t = weighted_kabsch(
            self.warp.node_positions, self.warp.deformed_nodes, weights=w
        )
        depth = np.asarray(frame.depth)
        v, u = np.nonzero(depth > 0)
        d = depth[v, u]
        fx, fy = float(self.intr.fx), float(self.intr.fy)
        cx, cy = float(self.intr.cx), float(self.intr.cy)
        obs = np.stack(
            [(u - cx) / fx * d, (v - cy) / fy * d, d], axis=-1
        ).astype(np.float32)
        cap = self.config.max_points
        sel = np.random.RandomState(frame.index).permutation(len(obs))[:cap]
        pts = np.zeros((cap, 3), np.float32)
        pts[: len(sel)] = obs[sel]
        pvalid = np.zeros(cap, bool)
        pvalid[: len(sel)] = True
        self.keyframes.append(
            {
                "frame": frame.index,
                "R": np.asarray(R),
                "t": np.asarray(t),
                "depth": depth,
                "points": pts,
                "pvalid": pvalid,
            }
        )
        if len(self.keyframes) > self.config.max_keyframes:
            self.keyframes = self.keyframes[-self.config.max_keyframes :]

    def _pose_graph_update(self) -> int:
        """Find loop closures for the newest keyframe and optimize the
        keyframe trajectory (exported via trajectory()). Returns the
        number of accepted loop closures."""
        from occlusionfusion_tpu.fusion.loop_closure import (
            rigid_depth_alignment,
        )
        from occlusionfusion_tpu.fusion.pose_graph import (
            PoseGraph,
            optimize_pose_graph,
        )

        cfg = self.config
        k = len(self.keyframes) - 1
        if k < 2:
            return 0
        kf = self.keyframes[k]
        obs_k = jnp.asarray(kf["points"])
        obs_k_valid = jnp.asarray(kf["pvalid"])
        loops = []
        for i in range(k - max(cfg.loop_min_separation, 2) + 1):
            kf_i = self.keyframes[i]
            if np.linalg.norm(kf_i["t"] - kf["t"]) > cfg.loop_radius:
                continue
            # estimate-free measurement: register keyframe k's OBSERVED
            # surface against keyframe i's observation.
            # T_align maps surface_k onto surface_i  =>  T_i * T_k^-1
            align = rigid_depth_alignment(
                obs_k,
                obs_k_valid,
                jnp.asarray(kf_i["depth"]),
                self.intr,
                iters=cfg.loop_align_iters,
                max_depth_diff=cfg.max_depth_diff,
            )
            if (
                float(align.inlier_fraction) < cfg.loop_min_inliers
                or float(align.residual) > cfg.loop_max_residual
            ):
                continue
            loops.append(
                (
                    i,
                    np.asarray(align.rotation),
                    np.asarray(align.translation),
                    float(align.inlier_fraction),
                )
            )
        if not loops:
            return 0

        # --- assemble the padded graph
        K = cfg.max_keyframes
        E = 2 * cfg.max_keyframes
        poses_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        poses_t = np.zeros((K, 3), np.float32)
        pose_valid = np.zeros(K, bool)
        for a, f in enumerate(self.keyframes):
            poses_R[a], poses_t[a], pose_valid[a] = f["R"], f["t"], True
        edge_i = np.zeros(E, np.int32)
        edge_j = np.zeros(E, np.int32)
        edge_R = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        edge_t = np.zeros((E, 3), np.float32)
        edge_valid = np.zeros(E, bool)
        edge_w = np.zeros(E, np.float32)
        e = 0

        def rel(Ra, ta, Rb, tb):
            """T_a^-1 * T_b."""
            return Ra.T @ Rb, Ra.T @ (tb - ta)

        for a in range(k):  # odometry backbone (estimate-consistent prior)
            fa, fb = self.keyframes[a], self.keyframes[a + 1]
            edge_i[e], edge_j[e] = a, a + 1
            edge_R[e], edge_t[e] = rel(fa["R"], fa["t"], fb["R"], fb["t"])
            edge_valid[e], edge_w[e] = True, 1.0
            e += 1
        for i, Rm, tm, frac in loops:
            # T_align = T_i * T_k^-1 (from observations alone), so the
            # edge measurement T_i^-1 T_k = T_i^-1 T_align^-1 T_i,
            # conjugated by the stored estimate of T_i
            Ri, ti = self.keyframes[i]["R"], self.keyframes[i]["t"]
            Rmi, tmi = Rm.T, -Rm.T @ tm  # T_align^-1
            Ra = Ri.T @ Rmi @ Ri
            ta = Ri.T @ (Rmi @ ti + tmi - ti)
            edge_i[e], edge_j[e] = i, k
            edge_R[e], edge_t[e] = Ra, ta
            edge_valid[e], edge_w[e] = True, 2.0 * frac
            e += 1

        graph = PoseGraph(
            poses_R=jnp.asarray(poses_R),
            poses_t=jnp.asarray(poses_t),
            pose_valid=jnp.asarray(pose_valid),
            edge_i=jnp.asarray(edge_i),
            edge_j=jnp.asarray(edge_j),
            edge_R=jnp.asarray(edge_R),
            edge_t=jnp.asarray(edge_t),
            edge_valid=jnp.asarray(edge_valid),
            edge_weight=jnp.asarray(edge_w),
        )
        opt_R, opt_t, _ = optimize_pose_graph(graph)
        opt_R = np.asarray(opt_R)
        opt_t = np.asarray(opt_t)
        # adopt the optimized trajectory (exported via trajectory();
        # future odometry edges reference the corrected history)
        for a in range(len(self.keyframes)):
            self.keyframes[a]["R"] = opt_R[a]
            self.keyframes[a]["t"] = opt_t[a]
        return len(loops)

    def _relocalize(self, kf: dict) -> float:
        """Observation-grounded warp re-anchoring: align the current
        deformed model against the CURRENT keyframe observation. When
        tracking is healthy this is ~identity (the per-frame solver keeps
        the model on the observation and non-rigid motion is modeled by
        the warp itself); a rigid residual means the solver has drifted
        off the surface, and left-composing it pulls the model back.
        Rigid trajectory bookkeeping is the pose graph's job; warp
        corrections must come from the current observation only —
        keyframe-relative rigid summaries conflate non-rigid deformation
        with drift (a lesson encoded in the non-rigid CLI check)."""
        from occlusionfusion_tpu.fusion.loop_closure import (
            rigid_depth_alignment,
        )

        cfg = self.config
        deformed_pts = W.deform_points(
            self.warp, self.model_points, self.point_table
        )
        pvalid = self.model_valid & self.point_table.valid
        # wide-baseline recovery (centroid init + wide association band)
        # is armed ONLY from the track-lost state — a partially-visible
        # object also has a low inlier fraction, and recovery from that
        # state collapses the whole model onto the visible sliver
        # (observed: a 2.4-magnitude wrong correction on the revisit
        # clip's half-out frames). Losing the object entirely first is
        # the discriminator.
        recovering = bool(getattr(self, "track_lost", False))
        if recovering and not cfg.relocalize_recovery:
            # end-state guard (default): a geometric recovery cannot
            # restore surface identity under rotational ambiguity and
            # measurably degrades final-frame EPE — stay lost unless
            # recovery is explicitly enabled (see FusionConfig)
            return 0.0
        if recovering:
            # a substantial observation is also required — recovering
            # against a sliver is as bad as not recovering
            n_obs = int(np.count_nonzero(np.asarray(kf["depth"]) > 0))
            if n_obs < cfg.relocalize_min_obs_px:
                return 0.0
        # feature-based recovery seed: the matcher's blended scene flow
        # gives a rigid (Kabsch) pose hypothesis that carries ROTATION —
        # centroid init cannot, and a lost pose re-acquired with the
        # wrong orientation puts the model on the surface with the wrong
        # identity (docs/EVAL_MATRIX.md regime-3 caveat). Geometric ICP
        # then refines from the feature pose.
        feat_init = None
        self.reloc_feat_matches = -1  # trace: -1 = path not taken
        if (
            recovering
            and self.lepard_params is not None
            and self.lepard_config is not None
            and cfg.relocalize_feat_min_points > 0
        ):
            from occlusionfusion_tpu.fusion.fused_step import (
                _deterministic_target_subsample,
            )
            from occlusionfusion_tpu.geometry.kabsch import weighted_kabsch
            from occlusionfusion_tpu.models.lepard import scene_flow

            tgt_pcd, tgt_valid = _deterministic_target_subsample(
                jnp.asarray(kf["depth"]), self.intr,
                self.config.lepard_max_target_points,
                method=self.config.lepard_subsample,
            )
            flow, fmask, _ = scene_flow(
                self.lepard_params,
                self.lepard_config,
                deformed_pts,
                pvalid,
                jnp.asarray(tgt_pcd),
                jnp.asarray(tgt_valid),
            )
            n_feat = int(jnp.sum(fmask))
            self.reloc_feat_matches = n_feat
            if n_feat >= cfg.relocalize_feat_min_points:
                fR, ft = weighted_kabsch(
                    deformed_pts,
                    deformed_pts + flow,
                    weights=fmask.astype(jnp.float32),
                )
                feat_init = (fR, ft)
        align = rigid_depth_alignment(
            deformed_pts,
            pvalid,
            jnp.asarray(kf["depth"]),
            self.intr,
            iters=cfg.loop_align_iters,
            max_depth_diff=cfg.max_depth_diff,
            coarse_init=recovering,
            feat_init=feat_init,
        )
        # a fully-lost pose has ~zero INITIAL inliers and its masked
        # median initial_residual degenerates to 0.0 — which used to
        # read as "healthy, nothing to correct" and kept relocalization
        # from ever firing on the leave-and-revisit regime. The
        # healthy/improvement gates therefore only apply when NOT
        # recovering; recovery instead demands a strictly higher final
        # overlap before adopting the new pose.
        min_final = (
            max(cfg.loop_min_inliers, cfg.relocalize_recover_inliers)
            if recovering else cfg.loop_min_inliers
        )
        if float(align.inlier_fraction) < min_final:
            return 0.0  # final pose still off the surface: no evidence
        if not recovering and (
            float(align.initial_residual) < cfg.relocalize_threshold
            or float(align.residual) >= 0.5 * float(align.initial_residual)
        ):
            return 0.0
        if recovering:
            self.track_lost = False  # recovery accepted
        dR = np.asarray(align.rotation)
        dt = np.asarray(align.translation)
        angle = float(
            np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
        )
        magnitude = angle + float(np.linalg.norm(dt))
        if magnitude < cfg.min_correction:
            return magnitude
        self.warp = W.left_compose_rigid(
            self.warp, jnp.asarray(dR), jnp.asarray(dt)
        )
        self.prev_R = self.warp.rotations
        self.prev_t = self.warp.translations
        return magnitude

    def trajectory(self):
        """Optimized keyframe trajectory: (frame_ids [K], R [K, 3, 3],
        t [K, 3]) — the ATE/export artifact."""
        if not getattr(self, "keyframes", None):
            return np.zeros(0, np.int32), np.zeros((0, 3, 3)), np.zeros((0, 3))
        ids = np.asarray([f["frame"] for f in self.keyframes], np.int32)
        R = np.stack([f["R"] for f in self.keyframes])
        t = np.stack([f["t"] for f in self.keyframes])
        return ids, R, t

    def _refresh_bricks(self, frame: Frame) -> int:
        """Keyframe active-set refresh for the bricked volume: keep every
        currently active brick (it holds integrated data) and activate
        canonical bricks whose *warped* centers land in the truncation
        band of the current observation. Integrated data is carried into
        the new slot layout with one device gather. Returns the number of
        newly activated bricks."""
        from occlusionfusion_tpu.fusion import bricks as BR

        cfg = self.config
        grid = self.brick_grid
        origin = np.asarray(self.tsdf.origin)
        trunc = self.tsdf_config.trunc_margin
        # occupancy of the observation in CURRENT space
        obs_pts = BR._backproject_valid(frame.depth, self.intr)
        occ_ids = BR.active_bricks_from_points(
            grid, origin, obs_pts, trunc, dilate=cfg.brick_dilate
        )
        occ = np.zeros(int(np.prod(grid.grid_dim)), bool)
        occ[occ_ids] = True
        # canonical brick centers warped to current space (new-surface
        # bricks sit outside node coverage and pass through unwarped —
        # exactly where their observations are)
        GX, GY, GZ = grid.grid_dim
        bs = grid.brick * grid.voxel_size
        cx, cy, cz = np.meshgrid(
            np.arange(GX), np.arange(GY), np.arange(GZ), indexing="ij"
        )
        centers = (
            np.stack([cx, cy, cz], -1).reshape(-1, 3) + 0.5
        ) * bs + origin
        centers_j = jnp.asarray(centers.astype(np.float32))
        ctable = W.skin(self.warp, centers_j, cfg.node_coverage)
        warped_centers = np.asarray(
            W.deform_points(self.warp, centers_j, ctable)
        )
        q = np.floor((warped_centers - origin) / bs).astype(np.int64)
        inb = (
            (q >= 0).all(1)
            & (q[:, 0] < GX) & (q[:, 1] < GY) & (q[:, 2] < GZ)
        )
        lin = q[:, 0] * GY * GZ + q[:, 1] * GZ + q[:, 2]
        wanted = np.zeros(len(centers), bool)
        wanted[inb] = occ[lin[inb]]
        old = np.asarray(self.brick_ids)
        keep = old[old >= 0]
        new_ids = np.union1d(keep, np.flatnonzero(wanted).astype(np.int32))
        if len(new_ids) > grid.max_bricks:
            # capacity: existing bricks win (they hold data); newly
            # wanted ones are dropped deterministically from the far end
            extra = np.setdiff1d(new_ids, keep)
            room = grid.max_bricks - len(keep)
            new_ids = np.union1d(keep, extra[:room])
        n_new = len(new_ids) - len(keep)
        if n_new == 0:
            return 0
        packed = BR.pack_brick_ids(grid, new_ids)
        perm = BR.remap_slots(old, packed)
        self.tsdf = BR.apply_remap(self.tsdf, perm)
        self.brick_ids = packed
        vox_np, bvalid = BR.brick_voxel_points(grid, origin, packed)
        self.vox_points = jnp.asarray(vox_np)
        self.brick_valid = jnp.asarray(bvalid)
        self.vox_table = self._skin_vox()
        return n_new

    def _grow(self, frame: Frame) -> int:
        """Extend the graph onto surface not covered by any node
        (warpfield.py:487-583 equivalent; see fusion/graph_growth.py)."""
        from occlusionfusion_tpu.fusion.graph_growth import grow_graph

        cfg = self.config
        # bricked volume: refresh the active-brick set first so bricks
        # covering newly observed surface exist before the mesh extract
        if self.brick_grid is not None:
            self._refresh_bricks(frame)
        # candidates come from the *canonical* mesh: integration has just
        # written any newly observed surface into the canonical volume
        verts, _ = self._extract_mesh_host()
        sel = np.random.RandomState(frame.index).permutation(len(verts))[:20000]
        res = grow_graph(
            self.warp,
            self.node_count,
            self.edges,
            self.edge_weights,
            verts[sel],
            np.ones(len(sel), bool),
            cfg.node_coverage,
        )
        if res.n_new:
            old_count = self.node_count
            self.warp = res.warp
            self.node_count = res.node_count
            self.edges = res.edges
            self.edge_weights = res.edge_weights
            self.nodes = res.warp.node_positions
            self.node_valid = res.warp.node_valid
            # new nodes join the component of their nearest old node
            # (growth attaches to existing surface by construction)
            clusters = np.array(self.node_clusters)  # writable copy
            nodes_np = np.asarray(self.nodes)
            new_ids = np.arange(old_count, self.node_count)
            if len(new_ids):
                d = np.linalg.norm(
                    nodes_np[new_ids, None] - nodes_np[None, :old_count],
                    axis=-1,
                )
                clusters[new_ids] = clusters[np.argmin(d, axis=1)]
                self.node_clusters = jnp.asarray(clusters)
            # re-skin the caches against the grown graph
            self.vox_table = self._skin_vox()
            self.point_table = W.skin(
                self.warp, self.model_points, cfg.node_coverage
            )
            # rebuild the motion-model pyramid over the grown node set
            # (the GNN would otherwise keep routing messages through the
            # pre-growth pyramid and never see the new nodes)
            if self.motion_runner is not None:
                from occlusionfusion_tpu.graph.edgraph import (
                    build_pyramid_from_nodes,
                )

                self.graph.pyramid = build_pyramid_from_nodes(
                    np.asarray(self.nodes[: self.node_count]),
                    cfg.graph.node_coverage,
                    edges=np.asarray(self.edges[: self.node_count]),
                )
        return res.n_new

    # ------------------------------------------------------------------
    # fused single-dispatch path (fusion/fused_step.py)

    def build_fused(self, motion_params=None):
        """Assemble the device-resident tables + state for the fused
        one-dispatch-per-frame path. Call after initialize()."""
        from occlusionfusion_tpu.fusion.fused_step import (
            FusedStepConfig,
            FusionStepState,
            FusionTables,
        )
        from occlusionfusion_tpu.fusion.motion_runner import (
            _packed_layout,
            init_state,
            level_sizes_for,
            pack_frame,
        )

        cfg = self.config
        cap = cfg.max_nodes
        motion_levels = level_sizes_for(cap)
        if motion_params is not None and cfg.use_motion_model:
            # pack the (static) pyramid into the device-resident int vector
            dummy = np.zeros((self.node_count, 3), np.float32)
            ints, _ = pack_frame(
                dummy, dummy, np.zeros(self.node_count, bool),
                [self.graph.pyramid[f"nn_index_l{l}"] for l in range(4)],
                [self.graph.pyramid[f"down_sample_idx{i}"] for i in (1, 2, 3)],
                [self.graph.pyramid[f"up_sample_idx{i}"] for i in (1, 2, 3)],
                level_sizes=motion_levels,
            )
            pyramid_ints = jnp.asarray(ints)
        else:
            _, pack_len = _packed_layout(motion_levels)
            pyramid_ints = jnp.zeros((pack_len,), jnp.int32)
        # dense precomputed skinning matrix for the voxel warp: on TPU
        # this turns the in-scan LBS into a pure dense matmul (the
        # gather/one-hot alternatives cost 5.2/3.3 ms per frame at
        # 64^3/512); skipped on CPU (tests) and when it would not fit
        from occlusionfusion_tpu.ops.lbs import (
            dense_skin_bytes,
            precompute_dense_skin,
        )

        want_dense = cfg.lbs_impl in ("auto", "dense") and (
            jax.default_backend() == "tpu" or cfg.lbs_impl == "dense"
        )
        vox_dense = (None, None)
        if want_dense and dense_skin_bytes(
            self.vox_points.shape[0], cap
        ) <= cfg.dense_skin_max_bytes:
            ds = precompute_dense_skin(
                self.vox_table.anchors,
                self.vox_table.weights,
                self.vox_table.valid,
                cap,
            )
            vox_dense = (ds.s_hi, ds.s_lo)
        # NB: the compact-pair scatter plan (PairScatterPlan) measured
        # SLOWER in the full assembly despite the isolated scatter being
        # faster (9.3 vs 7.3 ms/iter at cap 512 — the [N*N] expand
        # scatter-set + lax.cond fallback eat the win; profile_plan.py),
        # so production keeps the direct fused segment_sum.
        gn_plan = None
        tables = FusionTables(
            vox_points=self.vox_points,
            vox_anchors=self.vox_table.anchors,
            vox_weights=self.vox_table.weights,
            vox_valid=self.vox_table.valid,
            model_points=self.model_points,
            model_valid=self.model_valid,
            point_anchors=self.point_table.anchors,
            point_weights=self.point_table.weights,
            point_valid=self.point_table.valid,
            nodes=self.nodes,
            node_valid=self.node_valid,
            edges=self.edges,
            edge_weights=self.edge_weights,
            pyramid_ints=pyramid_ints,
            n_nodes=jnp.int32(self.node_count),
            vox_dense_hi=vox_dense[0],
            vox_dense_lo=vox_dense[1],
            gn_scatter_plan=gn_plan,
            node_clusters=(
                self.node_clusters if cfg.min_cluster_matches else None
            ),
        )
        # learned perception in-dispatch: params ride one pytree arg;
        # the previous frame's RGB-XYZ image seeds the flow source
        use_flow = cfg.use_flow and self.flow_params is not None
        use_lepard = cfg.use_lepard and self.lepard_params is not None
        self.perception = None
        prev_rgbxyz = None
        if use_flow or use_lepard:
            self.perception = {}
            if use_flow:
                self.perception["flow"] = self.flow_params
                self.perception["mask"] = self.mask_params
            if use_lepard:
                self.perception["lepard"] = self.lepard_params
        if use_flow:
            from occlusionfusion_tpu.fusion.fused_step import _rgbxyz_image

            prev_rgbxyz = _rgbxyz_image(
                jnp.asarray(self.prev_frame.depth),
                jnp.asarray(self.prev_frame.color),
                self.intr,
            )
        # copy into the state: fused_register_frame donates these buffers,
        # so the object-style fields must keep their own copies
        state = FusionStepState(
            tsdf=jax.tree.map(lambda x: jnp.array(x, copy=True), self.tsdf),
            rotations=jnp.array(self.warp.rotations, copy=True),
            translations=jnp.array(self.warp.translations, copy=True),
            motion=init_state(cap),
            prev_rgbxyz=prev_rgbxyz,
            # absolute index of the NEXT frame the engine will register
            # (frame_id is the last registered frame) — so the fused
            # cadence gate fires on exactly the same absolute frames as
            # the stepwise path's ``frame.index % lepard_every`` even
            # after a mid-sequence growth/keyframe table rebuild
            frame_count=(
                jnp.int32(self.frame_id + 1)
                if cfg.lepard_every > 1 else None
            ),
        )
        step_config = FusedStepConfig(
            tsdf=self.tsdf_config,
            nicp=cfg.nicp,
            max_depth_diff=cfg.max_depth_diff,
            use_motion_model=cfg.use_motion_model and motion_params is not None,
            solver=cfg.solver,
            gn=cfg.gn,
            lbs_impl=cfg.lbs_impl,
            motion_levels=motion_levels,
            use_flow=use_flow,
            flow_mask_threshold=cfg.flow_mask_threshold,
            flow_mask_patch=cfg.flow_mask_patch,
            flow_mode=cfg.flow_mode,
            flow_advect_min_px=cfg.flow_advect_min_px,
            flow_advect_weight=cfg.flow_advect_weight,
            flow_advect_mask_threshold=cfg.flow_advect_mask_threshold,
            flow_advect_alpha=cfg.flow_advect_alpha,
            flow_downscale=cfg.flow_downscale,
            flow_lift=cfg.flow_lift,
            flow_bf16=cfg.flow_bf16,
            mask_downscale=cfg.mask_downscale,
            use_lepard=use_lepard,
            lepard=self.lepard_config if use_lepard else None,
            lepard_max_target_points=cfg.lepard_max_target_points,
            lepard_every=cfg.lepard_every,
            lepard_subsample=cfg.lepard_subsample,
            min_cluster_matches=cfg.min_cluster_matches,
        )
        return step_config, state, tables

    def register_frame_fused(self, step_config, state, tables, frame: Frame,
                             motion_params=None):
        """One fused dispatch; caller owns the state pytree."""
        from occlusionfusion_tpu.fusion.fused_step import fused_register_frame

        return fused_register_frame(
            step_config,
            state,
            tables,
            self._device_params(motion_params),
            jnp.asarray(frame.depth),
            jnp.asarray(frame.color),
            self._device_params(self.intr),
            getattr(self, "perception", None),
        )

    def run_fused(self, start: int = 0, end: int | None = None,
                  skip: int = 1, chunk: int = 16, motion_params=None,
                  keyframe_cb=None):
        """Drive the whole sequence through the fused/chunked engine —
        the SAME code path bench.py measures (one lax.scan dispatch per
        ``chunk`` frames). Host work between chunks: frame decode plus
        optional keyframe bookkeeping via ``keyframe_cb(self, frame)``
        (pose graph / growth are host-side keyframe ops by design).

        Returns a list of per-frame info dicts."""
        from occlusionfusion_tpu.fusion.fused_step import (
            fused_register_chunk,
        )

        end = end if end is not None else len(self.seq)
        self.initialize(self.seq.load(start))
        sc, state, tables = self.build_fused(motion_params)
        # upload the motion checkpoint once — numpy leaves as jit args
        # re-upload per dispatch (see __init__ note)
        motion_params = self._device_params(motion_params)
        ids = list(range(start + skip, end, skip))
        infos = []
        kint = self.config.keyframe_interval
        for lo in range(0, len(ids), chunk):
            chunk_ids = ids[lo : lo + chunk]
            frames = [self.seq.load(i) for i in chunk_ids]
            depths = jnp.stack([jnp.asarray(f.depth) for f in frames])
            colors = jnp.stack([jnp.asarray(f.color) for f in frames])
            state, out = fused_register_chunk(
                sc, state, tables, motion_params, depths, colors,
                self._device_params(self.intr),
                getattr(self, "perception", None),
            )
            out_np = np.asarray(out)
            if (out_np[:, 1] < 16).any():
                self.track_lost = True  # see register_frame
            for j, i in enumerate(chunk_ids):
                infos.append(
                    {
                        "frame": i,
                        "final_loss": float(out_np[j, 0]),
                        "n_correspondences": int(out_np[j, 1]),
                        "n_visible_nodes": int(out_np[j, 2]),
                        "mean_confidence": float(out_np[j, 3]),
                        "solve_valid": bool(out_np[j, 4] > 0.5),
                    }
                )
            self.frame_id = chunk_ids[-1]
            self.prev_frame = frames[-1]
            gint = self.config.growth_interval
            if gint and any(i % gint == 0 for i in chunk_ids):
                # graph growth is a keyframe host op: adopt the resident
                # state, grow, rebuild the device tables (same padded
                # caps -> no recompile), carry motion history + flow
                # source forward
                self.adopt_fused_state(
                    jax.tree.map(lambda x: jnp.array(x, copy=True), state)
                )
                n_new = self._grow(frames[-1])
                infos[-1]["n_new_nodes"] = n_new
                if n_new:
                    old_motion = state.motion
                    old_prev = state.prev_rgbxyz
                    sc, state, tables = self.build_fused(motion_params)
                    state = state._replace(
                        motion=old_motion, prev_rgbxyz=old_prev
                    )
            if kint and any(i % kint == 0 for i in chunk_ids):
                self.adopt_fused_state(
                    jax.tree.map(lambda x: jnp.array(x, copy=True), state)
                )
                self._record_keyframe(frames[-1])
                infos[-1]["pose_correction"] = self._relocalize(
                    self.keyframes[-1]
                )
                infos[-1]["reloc_feat_matches"] = getattr(
                    self, "reloc_feat_matches", -1
                )
                infos[-1]["loop_closures"] = self._pose_graph_update()
                # re-anchoring may have rigidly corrected the warp;
                # carry it back into the resident fused state
                state = state._replace(
                    rotations=jnp.array(self.warp.rotations, copy=True),
                    translations=jnp.array(
                        self.warp.translations, copy=True
                    ),
                )
            if keyframe_cb is not None:
                keyframe_cb(self, frames[-1])
        self.adopt_fused_state(state)
        return infos

    def adopt_fused_state(self, state):
        """Copy a fused-path state back into the object-style fields."""
        self.tsdf = state.tsdf
        self.warp = W.update_transforms(
            self.warp, state.rotations, state.translations
        )
        self.prev_R = state.rotations
        self.prev_t = state.translations

    # ------------------------------------------------------------------
    def run(self, start: int = 0, end: int | None = None, skip: int = 1):
        end = end if end is not None else len(self.seq)
        self.initialize(self.seq.load(start))
        infos = []
        for i in range(start + skip, end, skip):
            infos.append(self.register_frame(self.seq.load(i)))
        return infos

    def save_state(self, path: str):
        """Persist the resumable fusion state (reference parity:
        ``tsdf.py:682-702`` volume pickle + the per-frame npy artifacts
        that double as resume points, SURVEY §5). One flat npz pytree:
        canonical volume (incl. brick table), graph, warp transforms,
        and model points. The motion-GNN history ring is deliberately
        not persisted — it re-fills within 16 frames (its warmup
        semantics match a fresh sequence start at the resume frame)."""
        from occlusionfusion_tpu.utils.snapshot import save_pytree

        tree = {
            "tsdf": dict(self.tsdf._asdict()),
            "rotations": self.warp.rotations,
            "translations": self.warp.translations,
            "nodes": self.nodes,
            "node_valid": self.node_valid,
            "edges": self.edges,
            "edge_weights": self.edge_weights,
            "node_clusters": self.node_clusters,
            "node_count": np.asarray(self.node_count, np.int32),
            "model_points": self.model_points,
            "model_valid": self.model_valid,
            "frame_id": np.asarray(self.frame_id, np.int32),
            "vol_dim": np.asarray(self.config.vol_dim, np.int32),
            "voxel_size": np.asarray(self.config.voxel_size, np.float32),
        }
        if self.brick_grid is not None:
            tree["brick_ids"] = np.asarray(self.brick_ids)
        if self.motion_runner is not None:
            # persist the GNN history ring (the reference's resume also
            # restores history — it re-reads the per-frame node npys,
            # run_motion_model.py:78-79)
            tree["motion_state"] = dict(self.motion_runner.state._asdict())
        save_pytree(path, tree)

    def load_state(self, path: str):
        """Resume from ``save_state`` output: rebuild device state and
        all derived tables (skinning, voxel points) under the current
        config, which must match the snapshot's volume geometry."""
        from occlusionfusion_tpu.fusion import bricks as BR
        from occlusionfusion_tpu.utils.snapshot import load_params

        cfg = self.config
        tree = load_params(path)
        assert tuple(int(x) for x in tree["vol_dim"]) == tuple(
            cfg.vol_dim
        ), "snapshot volume dims do not match the config"
        trunc = cfg.trunc_margin_vox * cfg.voxel_size
        self.tsdf_config = T.TSDFConfig(
            vol_dim=cfg.vol_dim, voxel_size=cfg.voxel_size,
            trunc_margin=trunc,
        )
        td = tree["tsdf"]
        self.tsdf = T.TSDFState(
            tsdf=jnp.asarray(td["tsdf"]),
            weight=jnp.asarray(td["weight"]),
            color=jnp.asarray(td["color"]),
            origin=jnp.asarray(td["origin"]),
        )
        if "brick_ids" in tree:
            assert cfg.brick_size != 0, (
                "snapshot is bricked but config.brick_size == 0"
            )
            # the brick edge is implied by the stored [MB, B, B, B]
            # volume shape (authoritative under brick_size = -1 auto)
            self.brick_size = int(np.asarray(td["tsdf"]).shape[1])
            self.brick_grid = BR.BrickGrid(
                vol_dim=cfg.vol_dim, voxel_size=cfg.voxel_size,
                brick=self.brick_size, max_bricks=cfg.max_bricks,
            )
            self.brick_ids = np.asarray(tree["brick_ids"], np.int32)
            vox_np, bvalid = BR.brick_voxel_points(
                self.brick_grid, np.asarray(td["origin"]), self.brick_ids
            )
            self.vox_points = jnp.asarray(vox_np)
            self.brick_valid = jnp.asarray(bvalid)
        else:
            self.brick_grid = None
            self.vox_points = T.voxel_world_points(
                self.tsdf_config, self.tsdf.origin
            )
            self.brick_valid = jnp.ones(self.vox_points.shape[0], bool)
        self.nodes = jnp.asarray(tree["nodes"])
        self.node_valid = jnp.asarray(tree["node_valid"])
        self.edges = jnp.asarray(tree["edges"])
        self.edge_weights = jnp.asarray(tree["edge_weights"])
        if "node_clusters" in tree:
            self.node_clusters = jnp.asarray(tree["node_clusters"])
        else:  # pre-cluster snapshot: one component
            self.node_clusters = jnp.where(
                jnp.asarray(tree["node_valid"]), 0, -1
            ).astype(jnp.int32)
        self.node_count = int(tree["node_count"])
        self.warp = W.WarpFieldState(
            node_positions=self.nodes,
            node_valid=self.node_valid,
            rotations=jnp.asarray(tree["rotations"]),
            translations=jnp.asarray(tree["translations"]),
        )
        self.prev_R = self.warp.rotations
        self.prev_t = self.warp.translations
        self.model_points = jnp.asarray(tree["model_points"])
        self.model_valid = jnp.asarray(tree["model_valid"])
        self.point_table = W.skin(
            self.warp, self.model_points, cfg.node_coverage
        )
        self.vox_table = self._skin_vox()
        self.frame_id = int(tree["frame_id"])
        if self.motion_runner is not None:
            self.motion_runner.reset()
            if "motion_state" in tree:
                from occlusionfusion_tpu.fusion.motion_runner import (
                    MotionRunnerState,
                )

                self.motion_runner.state = MotionRunnerState(
                    **{
                        k: jnp.asarray(v)
                        for k, v in tree["motion_state"].items()
                    }
                )
            # rebuild the host graph pyramid for the motion model
            from types import SimpleNamespace

            from occlusionfusion_tpu.graph.edgraph import (
                build_pyramid_from_nodes,
            )

            self.graph = SimpleNamespace(
                pyramid=build_pyramid_from_nodes(
                    np.asarray(self.nodes[: self.node_count]),
                    cfg.graph.node_coverage,
                    edges=np.asarray(self.edges[: self.node_count]),
                )
            )
        self.keyframes = []

    def get_deformed_mesh(self):
        """Marching cubes on the canonical TSDF, warped to current frame."""
        verts, faces = self._extract_mesh_host()
        table = W.skin(self.warp, jnp.asarray(verts), self.config.node_coverage)
        warped = W.deform_points(self.warp, jnp.asarray(verts), table)
        return np.asarray(warped), faces
