#!/usr/bin/env python
"""Train the Lepard-style matcher with the focal correspondence loss.

The fork strips the Lepard weights (``.MISSING_LARGE_BLOBS``), so the
matcher is trained from scratch. Data sources, in priority order:
  --data     4DMatch npz root (the reference's training set layout)
  (default)  synthetic pairs: random clouds under full-SO(3) rigid motion
             plus a smooth low-frequency non-rigid warp, with noise and
             partial overlap — the regime the fusion loop actually sees
             (deformed model vs partially observed target depth PCD).

Training recipe per the round-2 roadmap: rotation augmentation, linear
warmup + cosine decay, periodic held-out eval (coarse match accuracy +
inlier ratio) and checkpointing. Loss values are fetched only at log
points (a per-step device->host fetch costs 40-70 ms through the axon
relay, CLAUDE.md).

  python scripts/train_lepard.py --steps 2000 --out checkpoints/lepard_trained.npz
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def random_rotation(rng, max_angle: float = np.pi):
    """Random rotation with angle ~ U(0, max_angle) about a random axis.

    Full SO(3) is NOT the fusion loop's regime — the matcher registers
    the deformed model against the *next* frame's depth, so inter-frame
    rotations are bounded; training with bounded angles (ramped by the
    curriculum) matches deployment and actually converges."""
    axis = rng.randn(3).astype(np.float32)
    axis /= np.linalg.norm(axis) + 1e-9
    ang = rng.uniform(0, max_angle)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
         [-axis[1], axis[0], 0]], np.float32)
    return (np.eye(3, dtype=np.float32) + np.sin(ang) * K
            + (1 - np.cos(ang)) * (K @ K))


def surface_cloud(rng, n):
    """Points on a random smooth closed surface (radially-modulated
    sphere) — surface-like local neighborhoods, matching what KPConv
    sees in deployment (TSDF mesh vertices / depth backprojections),
    unlike volumetric gaussian noise."""
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    r = np.full(n, 0.35, np.float32)
    for _ in range(3):
        k = rng.randn(3).astype(np.float32) * rng.uniform(1.0, 4.0)
        r += (0.1 * rng.rand() * np.sin(v @ k + rng.uniform(0, 2 * np.pi))
              ).astype(np.float32)
    return v * r[:, None]


def smooth_warp(rng, pts, amplitude=0.04, n_waves=3):
    """Low-frequency trigonometric displacement field (smooth non-rigid)."""
    disp = np.zeros_like(pts)
    for _ in range(n_waves):
        k = rng.randn(3).astype(np.float32) * rng.uniform(2.0, 6.0)
        phase = rng.uniform(0, 2 * np.pi)
        a = rng.randn(3).astype(np.float32)
        a *= amplitude / (np.linalg.norm(a) + 1e-9) * rng.rand()
        disp += np.sin(pts @ k + phase)[:, None] * a
    return pts + disp.astype(np.float32)


def synthetic_pair(rng, n=192, cap=256, nonrigid=True, overlap=0.8,
                   noise=0.005, max_angle=np.pi / 3,
                   warp_amplitude=0.04, scale_range=(0.3, 1.3)):
    """Pair with known correspondences: smooth-surface cloud -> smooth
    warp -> bounded rigid -> noise; a random half-space of the target is
    dropped (partial overlap) and replaced with distractor points.

    Global scale augmentation (``scale_range``): the KPConv pyramid's
    first_voxel is FIXED at deployment, so the matcher must work across
    object sizes — without this the shipped checkpoint matched 0.35-
    radius training clouds but produced ~0 valid matches on the 0.12-
    radius DT4D eval blob."""
    if n > cap:
        raise ValueError(
            f"synthetic_pair: points ({n}) must be <= cap ({cap}); "
            "raise --cap or lower --points"
        )
    s = rng.uniform(*scale_range)
    src = surface_cloud(rng, n) * np.float32(s)
    warped = (smooth_warp(rng, src, amplitude=warp_amplitude * s)
              if nonrigid else src)
    R = random_rotation(rng, max_angle)
    t = rng.randn(3).astype(np.float32) * (0.1 * s)
    tgt = (warped @ R.T + t + rng.randn(n, 3) * noise).astype(np.float32)

    # partial overlap: drop target points on one side of a random plane
    normal = rng.randn(3).astype(np.float32)
    normal /= np.linalg.norm(normal)
    scores = (tgt - tgt.mean(0)) @ normal
    keep = scores <= np.quantile(scores, overlap)
    kept_idx = np.nonzero(keep)[0]
    n_tgt = len(kept_idx)
    # distractors: points near the kept surface but without a source match
    n_extra = min(cap - n_tgt, max(n // 8, 1))
    extra = (tgt[rng.choice(kept_idx, n_extra)] +
             rng.randn(n_extra, 3).astype(np.float32) * 0.08)

    src_p = np.zeros((cap, 3), np.float32)
    src_p[:n] = src
    sm = np.zeros(cap, bool)
    sm[:n] = True
    tgt_p = np.zeros((cap, 3), np.float32)
    tgt_p[:n_tgt] = tgt[kept_idx]
    tgt_p[n_tgt : n_tgt + n_extra] = extra
    tm = np.zeros(cap, bool)
    tm[: n_tgt + n_extra] = True

    # correspondences: src index -> position in the kept target list
    inv = -np.ones(n, np.int64)
    inv[kept_idx] = np.arange(n_tgt)
    cs = np.zeros(cap, np.int32)
    ct = np.zeros(cap, np.int32)
    cm = np.zeros(cap, bool)
    m = 0
    for i in range(n):
        if inv[i] >= 0 and m < cap:
            cs[m], ct[m], cm[m] = i, inv[i], True
            m += 1
    return src_p, sm, tgt_p, tm, cs, ct, cm


def rendered_cloud_pair(rng, n=192, cap=256, shapes=("blob", "limbs", "arms"),
                        n_verts=4000, H=160, W=160, match_tol=0.015,
                        normalize_radius=0.3, max_gap=2,
                        rot_deg=0.0, return_aux=False):
    """Domain-matched matcher pair: source/target clouds backprojected
    from splat-rendered depth of the procedural deforming shapes, GT
    correspondences from the known vertex motion (a source point matches
    the target-cloud point nearest to its vertex's true target position,
    if within ``match_tol`` — occluded regions stay unmatched, which is
    the truth the matcher must learn to handle). Both clouds are
    normalized exactly as ``scene_flow`` does at inference (joint
    centroid, RMS radius -> ``normalize_radius``), so training sees the
    deployed scale distribution. Same return layout as
    ``synthetic_pair``.

    ``rot_deg``: relative-rotation augmentation — the target cloud (and
    the true target positions) are additionally rotated by a random
    rotation with angle up to ``rot_deg`` about the target centroid.
    The fusion loop's frame-to-frame matching sees bounded rotations,
    but wide-baseline RELOCALIZATION (the regime-3 rotational-ambiguity
    cap, docs/EVAL_MATRIX.md) needs the matcher to hold under large
    relative rotation; 180 covers full SO(3).

    ``return_aux``: also return (labels_src [cap], labels_tgt [cap],
    gt_pos [cap, 3], gt_pos_mask [cap]) — per-point surface-identity
    labels (``synthetic_shapes.surface_labels``) and the true
    (normalized-space) target-frame position of every source point.
    These power bridge-negative supervision: a target point
    geometrically near a source point's true position but on a
    DIFFERENT surface is exactly the confident-but-wrong bridge match
    the arms regime produces."""
    from occlusionfusion_tpu.data.deformingthings4d import frame_vertices
    from occlusionfusion_tpu.data.synthetic_shapes import (
        _backproject,
        np_render,
        shape_clip,
    )
    from occlusionfusion_tpu.geometry.camera import Intrinsics

    intr = Intrinsics(
        np.float32(300.0), np.float32(300.0),
        np.float32(W / 2), np.float32(H / 2),
    )
    shape = shapes[rng.randint(len(shapes))]
    n_frames = 10
    verts, _, offs = shape_clip(
        shape, n_frames, n_verts, seed=int(rng.randint(1 << 31)),
        rotate_deg=float(rng.uniform(0.0, 6.0)),
    )
    center = verts.mean(0)
    off = np.asarray([0.0, 0.0, 1.5], np.float32)
    s = float(rng.uniform(0.8, 1.25))
    i = int(rng.randint(0, n_frames - 1 - max_gap))
    j = i + 1 + int(rng.randint(max_gap))
    v_i = (frame_vertices(verts, offs, i) - center) * s + off
    v_j = (frame_vertices(verts, offs, j) - center) * s + off
    zeros = np.zeros((n_verts, 3), np.float32)
    d1, _, m1, win = np_render(v_i, zeros, intr, (H, W), splat_radius=2)
    d2, _, m2, win2 = np_render(v_j, zeros, intr, (H, W), splat_radius=2)

    src_xyz = _backproject(d1, intr)
    ys, xs = np.nonzero(m1 & (win < n_verts))
    pick_s = rng.choice(len(ys), min(n, len(ys)), replace=False)
    src_vid = win[ys[pick_s], xs[pick_s]]
    src = src_xyz[ys[pick_s], xs[pick_s]].astype(np.float32)
    gt_tgt_pos = v_j[src_vid]

    tgt_xyz = _backproject(d2, intr)
    ty, tx = np.nonzero(m2 & (win2 < n_verts))
    pick_t = rng.choice(len(ty), min(cap, len(ty)), replace=False)
    tgt_vid = win2[ty[pick_t], tx[pick_t]]
    tgt = tgt_xyz[ty[pick_t], tx[pick_t]].astype(np.float32)

    if rot_deg > 0.0:
        # relative-rotation augmentation about the target centroid; the
        # true target positions rotate with the target frame
        Raug = random_rotation(rng, np.deg2rad(rot_deg))
        tc = tgt.mean(0)
        tgt = ((tgt - tc) @ Raug.T + tc).astype(np.float32)
        gt_tgt_pos = ((gt_tgt_pos - tc) @ Raug.T + tc).astype(np.float32)

    # GT correspondence: nearest kept target point to the true target
    # position, gated by match_tol (metric space)
    d = np.linalg.norm(gt_tgt_pos[:, None] - tgt[None], axis=-1)
    nn = d.argmin(1)
    ok = d[np.arange(len(nn)), nn] < match_tol

    # inference-matching normalization (scene_flow normalize_radius)
    both = np.concatenate([src, tgt])
    c = both.mean(0)
    rms = np.sqrt(np.mean(np.sum((both - c) ** 2, -1)))
    sc = normalize_radius / max(rms, 1e-6)
    src = (src - c) * sc
    tgt = (tgt - c) * sc
    gt_tgt_pos = ((gt_tgt_pos - c) * sc).astype(np.float32)

    ns, nt = len(src), len(tgt)
    src_p = np.zeros((cap, 3), np.float32)
    src_p[:ns] = src
    sm = np.zeros(cap, bool)
    sm[:ns] = True
    tgt_p = np.zeros((cap, 3), np.float32)
    tgt_p[:nt] = tgt
    tm = np.zeros(cap, bool)
    tm[:nt] = True
    cs = np.zeros(cap, np.int32)
    ct = np.zeros(cap, np.int32)
    cm = np.zeros(cap, bool)
    k = 0
    for a in range(ns):
        if ok[a] and k < cap:
            cs[k], ct[k], cm[k] = a, nn[a], True
            k += 1
    if not return_aux:
        return src_p, sm, tgt_p, tm, cs, ct, cm
    from occlusionfusion_tpu.data.synthetic_shapes import surface_labels

    vlbl = surface_labels(shape, verts)
    lbl_s = np.zeros(cap, np.int32)
    lbl_s[:ns] = vlbl[src_vid]
    lbl_t = np.zeros(cap, np.int32)
    lbl_t[:nt] = vlbl[tgt_vid]
    gtp = np.zeros((cap, 3), np.float32)
    gtp[:ns] = gt_tgt_pos
    gtm = np.zeros(cap, bool)
    gtm[:ns] = True
    return src_p, sm, tgt_p, tm, cs, ct, cm, lbl_s, lbl_t, gtp, gtm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--data", default=None, help="4DMatch root (optional)")
    ap.add_argument("--out", default="checkpoints/lepard_trained.npz")
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--rigid_only", action="store_true")
    ap.add_argument("--max_angle_deg", type=float, default=60.0,
                    help="max rigid rotation of synthetic pairs (the "
                         "fusion loop sees bounded inter-frame motion)")
    ap.add_argument("--levels", default="256,96,48,24",
                    help="KPConv pyramid level sizes (comma list). The "
                         "coarse level (last entry) sets the match-anchor "
                         "density — the shipped 24-anchor pyramid caps "
                         "blended flow accuracy at ~10 mm (ROADMAP #4); "
                         "e.g. 512,256,128,64 for a finer matcher")
    ap.add_argument("--first_voxel", type=float, default=0.06,
                    help="level-0 subsample voxel (m); shrink together "
                         "with denser --levels so level 0 actually fills")
    ap.add_argument("--points", type=int, default=192,
                    help="synthetic cloud density (pre-subsample)")
    ap.add_argument("--cap", type=int, default=256,
                    help="padded input size of synthetic pairs")
    ap.add_argument("--max_neighbors", default=None,
                    help="per-level neighbor limits (comma list), e.g. "
                         "from a CPU --calibrate_neighbors run; through "
                         "the axon relay the unjitted calibration probe "
                         "dispatches op-by-op (minutes per cloud), so "
                         "calibrate off-TPU and pass the limits here")
    ap.add_argument("--full_depth", action="store_true",
                    help="reference-depth KPFCN (3 strided stages x2 "
                         "resnetb + decoder; kpconv.full_depth_config)")
    ap.add_argument("--calibrate_neighbors", action="store_true",
                    help="calibrate per-level neighbor limits from sample "
                         "clouds before training (reference "
                         "dataloader.py:563 calibrate_neighbors); ignored "
                         "with --resume (limits live in the side-car)")
    ap.add_argument("--scale_range", default="0.3,1.3",
                    help="global scale augmentation range of synthetic "
                         "pairs. The wide default predates inference-"
                         "time scale normalization (scene_flow "
                         "normalize_radius rescales clouds to RMS 0.3 "
                         "~ the scale-1.0 curriculum cloud); with it, "
                         "narrow ranges (e.g. 0.9,1.1) concentrate "
                         "capacity at the deployed scale")
    ap.add_argument("--shapes", default="blob,limbs,arms",
                    help="comma list of procedural shapes for "
                         "--rendered_frac pairs (uniformly sampled); "
                         "bias toward arms to harden the matcher "
                         "against articulated self-occlusion")
    ap.add_argument("--bridge_boost", type=float, default=0.0,
                    help="extra negative-loss weight on cross-surface "
                         "bridge cells (target anchors near a source "
                         "anchor's TRUE position but on a different "
                         "surface label); needs --rendered_frac pairs "
                         "(they carry surface identity). 0 = off")
    ap.add_argument("--bridge_radius", type=float, default=0.08,
                    help="canonical-space radius defining 'near' for "
                         "bridge negatives")
    ap.add_argument("--rendered_rot_deg", type=float, default=0.0,
                    help="relative-rotation augmentation of rendered "
                         "pairs (max angle; 180 = full SO(3)) — for "
                         "wide-baseline relocalization robustness")
    ap.add_argument("--rendered_frac", type=float, default=0.0,
                    help="fraction of training pairs drawn from rendered "
                         "depth-cloud pairs of the procedural shapes "
                         "(domain-matched: backprojected splat depth, "
                         "occlusion-true correspondences, inference-"
                         "normalized scale) instead of the abstract "
                         "curriculum")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None,
                    help="checkpoint npz to continue from (params only; "
                         "the config side-car must match --full_depth)")
    ap.add_argument("--warm_start", default=None,
                    help="checkpoint npz whose PARAMS seed training while "
                         "the pyramid comes from --levels/--first_voxel "
                         "(KPConv/transformer weights are "
                         "pyramid-independent, so a coarse-trained matcher "
                         "warm-starts a finer one)")
    args = ap.parse_args()

    # flag-consistency guards (silent interactions bit us in round 1):
    # --max_neighbors would silently discard a --calibrate_neighbors
    # result; --resume replaces the config wholesale from the side-car,
    # so pyramid flags passed with it are dead; comma-list lengths must
    # match or the mismatch surfaces as an IndexError inside the pyramid
    if args.points > args.cap:
        ap.error(f"--points ({args.points}) must be <= --cap ({args.cap})")
    if args.max_neighbors and args.calibrate_neighbors:
        ap.error(
            "--max_neighbors and --calibrate_neighbors are mutually "
            "exclusive (the override would discard the calibration)"
        )
    if args.max_neighbors and (
        len(args.max_neighbors.split(",")) != len(args.levels.split(","))
    ):
        ap.error(
            f"--max_neighbors has {len(args.max_neighbors.split(','))} "
            f"entries but --levels has {len(args.levels.split(','))}"
        )
    if args.resume:
        for flag, default in (
            ("levels", ap.get_default("levels")),
            ("first_voxel", ap.get_default("first_voxel")),
            ("max_neighbors", ap.get_default("max_neighbors")),
            ("full_depth", ap.get_default("full_depth")),
        ):
            if getattr(args, flag) != default:
                ap.error(
                    f"--{flag} is ignored with --resume (the config is "
                    "restored from the checkpoint side-car); use "
                    "--warm_start to seed params into a new pyramid"
                )

    import jax

    if _os.environ.get("TRAIN_CPU") == "1":  # shape-shakeout runs off-TPU
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from occlusionfusion_tpu.models import kpconv as K
    from occlusionfusion_tpu.models.lepard import (
        LepardConfig,
        init_lepard_params,
        lepard_match,
    )
    from occlusionfusion_tpu.models.checkpoint import save_lepard_checkpoint
    from occlusionfusion_tpu.models.deform_loss import focal_correspondence_loss
    from occlusionfusion_tpu.ops.knn import knn_lax

    levels = tuple(int(x) for x in args.levels.split(","))
    pyramid = K.PyramidConfig(level_sizes=levels, first_voxel=args.first_voxel)
    pair_kw = dict(
        n=args.points, cap=args.cap,
        scale_range=tuple(float(x) for x in args.scale_range.split(",")),
    )
    if args.calibrate_neighbors and not args.resume:
        cal_rng = np.random.RandomState(20_000 + args.seed)

        def sample_clouds(n_samples=24):
            for _ in range(n_samples):
                src_p, sm, tgt_p, tm, *_ = synthetic_pair(cal_rng, **pair_kw)
                yield src_p, sm
                yield tgt_p, tm

        if args.data:
            from occlusionfusion_tpu.data.fourdmatch import FourDMatchDataset

            ds = FourDMatchDataset(args.data)

            def sample_clouds(n_samples=24):
                for i in range(min(n_samples, len(ds))):
                    s = ds[i]
                    yield s["source"], s["source_mask"]
                    yield s["target"], s["target_mask"]

        pyramid = K.calibrate_neighbor_limits(sample_clouds(), pyramid)
        print(f"calibrated max_neighbors: {pyramid.max_neighbors}", flush=True)
    if args.max_neighbors:
        pyramid = pyramid._replace(
            max_neighbors=tuple(int(x) for x in args.max_neighbors.split(","))
        )
    cfg = LepardConfig(
        kpfcn=K.full_depth_config(pyramid=pyramid) if args.full_depth
        else K.KPFCNConfig(pyramid=pyramid)
    )
    params = init_lepard_params(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )

        params, cfg = load_lepard_checkpoint(args.resume)
        print(f"resumed params from {args.resume}")
    elif args.warm_start:
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )

        warm_params, warm_cfg = load_lepard_checkpoint(args.warm_start)

        # adopt the checkpoint's ARCHITECTURE (depth/width — the params
        # must fit it) and replace only the pyramid from the flags:
        # KPConv/transformer weights are pyramid-independent, which is
        # the whole point of warm-starting into a finer pyramid
        if args.full_depth and warm_cfg.kpfcn != K.full_depth_config(
            pyramid=warm_cfg.kpfcn.pyramid
        ):
            raise SystemExit(
                "--full_depth conflicts with the --warm_start "
                "checkpoint's architecture"
            )
        cfg = warm_cfg._replace(
            kpfcn=warm_cfg.kpfcn._replace(pyramid=pyramid)
        )
        params = init_lepard_params(jax.random.PRNGKey(args.seed), cfg)

        # checkpoints store dict keys as strings ('0') where fresh init
        # uses ints (0); match leaves by normalized path instead
        def _pathmap(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {
                tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp): v
                for kp, v in flat
            }

        warm_by_path = _pathmap(warm_params)
        init_by_path = _pathmap(params)
        if set(warm_by_path) != set(init_by_path) or any(
            warm_by_path[k].shape != init_by_path[k].shape
            for k in init_by_path
        ):
            raise SystemExit(
                "--warm_start params do not match the requested "
                "architecture (use matching --full_depth etc.)"
            )
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [
                warm_by_path[
                    tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
                ]
                for kp, _ in leaves
            ],
        )
        if warm_cfg.kpfcn.kp_layout != cfg.kpfcn.kp_layout:
            raise SystemExit("--warm_start kp_layout mismatch")
        print(f"warm-started params from {args.warm_start} "
              f"(pyramid {warm_cfg.kpfcn.pyramid.level_sizes} -> "
              f"{cfg.kpfcn.pyramid.level_sizes})")
    warmup = min(args.warmup, max(args.steps // 5, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1), end_value=args.lr * 0.02,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=1e-5)
    )
    opt_state = optimizer.init(params)

    dataset = None
    if args.data:
        from occlusionfusion_tpu.data.fourdmatch import FourDMatchDataset

        dataset = FourDMatchDataset(args.data)

    def gt_matrix(m, src, tgt, gt_corr_src, gt_corr_tgt, corr_mask):
        _, src_coarse_idx = knn_lax(src[gt_corr_src], m.src_points, k=1,
                                    valid=m.src_valid)
        _, tgt_coarse_idx = knn_lax(tgt[gt_corr_tgt], m.tgt_points, k=1,
                                    valid=m.tgt_valid)
        S = m.src_points.shape[0]
        T_ = m.tgt_points.shape[0]
        gt = jnp.zeros((S, T_))
        gt = gt.at[src_coarse_idx[:, 0], tgt_coarse_idx[:, 0]].max(
            corr_mask.astype(jnp.float32)
        )
        return gt

    def loss_fn(params, src, sm, tgt, tm, gt_corr_src, gt_corr_tgt,
                corr_mask, lbl_s, lbl_t, gtp, gtm):
        m = lepard_match(params, cfg, src, sm, tgt, tm)
        gt = gt_matrix(m, src, tgt, gt_corr_src, gt_corr_tgt, corr_mask)
        valid = m.src_valid[:, None] & m.tgt_valid[None, :]
        neg_w = None
        if args.bridge_boost > 0.0:
            # surface identity at the coarse anchors = identity of the
            # nearest input point; bridge cell = target anchor within
            # bridge_radius of the source anchor's TRUE warped position
            # but labeled a different surface (and not the GT cell)
            _, sidx = knn_lax(m.src_points, src, k=1, valid=sm)
            _, tidx = knn_lax(m.tgt_points, tgt, k=1, valid=tm)
            lblc_s = lbl_s[sidx[:, 0]]
            lblc_t = lbl_t[tidx[:, 0]]
            gtp_c = gtp[sidx[:, 0]]
            gtm_c = gtm[sidx[:, 0]] & m.src_valid
            d2 = jnp.sum(
                (m.tgt_points[None, :, :] - gtp_c[:, None, :]) ** 2, -1
            )
            bridge = (
                (d2 < args.bridge_radius**2)
                & (lblc_s[:, None] != lblc_t[None, :])
                & gtm_c[:, None]
                & m.tgt_valid[None, :]
                & (gt < 0.5)
            )
            neg_w = 1.0 + args.bridge_boost * bridge.astype(jnp.float32)
        return focal_correspondence_loss(
            m.confidence, gt, valid, neg_weight=neg_w
        )

    @jax.jit
    def train_step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, src, sm, tgt, tm, cs, ct, cm, *aux):
        m = lepard_match(params, cfg, src, sm, tgt, tm)
        gt = gt_matrix(m, src, tgt, cs, ct, cm)
        has_gt = (jnp.sum(gt, axis=1) > 0) & m.src_valid
        pred = jnp.argmax(m.confidence, axis=1)
        hit = gt[jnp.arange(gt.shape[0]), pred] > 0
        acc = jnp.sum(hit & has_gt) / jnp.maximum(jnp.sum(has_gt), 1)
        # inlier ratio of thresholded mutual matches
        match_hit = gt[jnp.arange(gt.shape[0]), m.match_tgt] > 0
        n_match = jnp.maximum(jnp.sum(m.match_valid), 1)
        inlier = jnp.sum(match_hit & m.match_valid) / n_match
        return acc, inlier, jnp.sum(m.match_valid)

    max_angle = np.deg2rad(args.max_angle_deg)

    def neutral_aux(cap):
        # no surface identity / no true positions -> bridge term is a
        # no-op for this batch
        return (
            np.zeros(cap, np.int32), np.zeros(cap, np.int32),
            np.zeros((cap, 3), np.float32), np.zeros(cap, bool),
        )

    def batch_from(rng, frac=1.0):
        if dataset is not None:
            s = dataset[rng.randint(len(dataset))]
            base = tuple(s[k] for k in (
                "source", "source_mask", "target", "target_mask",
                "corr_src", "corr_tgt", "corr_mask"))
            return tuple(
                jnp.asarray(x)
                for x in base + neutral_aux(len(s["source"]))
            )
        if args.rendered_frac and rng.rand() < args.rendered_frac:
            return tuple(jnp.asarray(x) for x in rendered_cloud_pair(
                rng, n=args.points, cap=args.cap,
                shapes=tuple(args.shapes.split(",")),
                rot_deg=args.rendered_rot_deg,
                return_aux=True,
            ))
        # curriculum: rotation magnitude and warp amplitude ramp up over
        # the first half of training
        ramp = min(1.0, frac * 2.0)
        return tuple(jnp.asarray(x) for x in synthetic_pair(
            rng, nonrigid=not args.rigid_only, **pair_kw,
            max_angle=np.deg2rad(10.0) + ramp * max(
                max_angle - np.deg2rad(10.0), 0.0),
            warp_amplitude=0.01 + 0.03 * ramp,
        ) + neutral_aux(args.cap))

    rng = np.random.RandomState(args.seed)
    val_rng = np.random.RandomState(10_000 + args.seed)
    val_batches = [batch_from(val_rng) for _ in range(8)]

    t0 = time.perf_counter()
    loss = None
    for step in range(args.steps):
        params, opt_state, loss = train_step(
            params, opt_state, *batch_from(rng, step / max(args.steps, 1)))
        if step % args.eval_every == 0 or step == args.steps - 1:
            accs, inls, nms = [], [], []
            for vb in val_batches:
                a, i, nm = eval_step(params, *vb)
                accs.append(float(a)); inls.append(float(i)); nms.append(float(nm))
            print(
                f"step {step}: loss {float(loss):.4f} "
                f"val acc {np.mean(accs):.3f} inlier {np.mean(inls):.3f} "
                f"matches {np.mean(nms):.1f} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        if args.save_every and step and step % args.save_every == 0:
            save_lepard_checkpoint(args.out, params, cfg)
    save_lepard_checkpoint(args.out, params, cfg)
    print(f"saved {args.out} (+ .json config side-car)")


if __name__ == "__main__":
    main()
