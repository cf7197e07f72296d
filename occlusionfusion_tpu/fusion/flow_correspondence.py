"""Optical-flow-based correspondences (the DeformNet-runner data path).

Re-design of ``fusion_with_occlusion/run_model.py``
(``estimate_optical_flow:70-113`` + ``get_predicted_location:115-217``):
run PWC-Net between the source and target RGB-D frames, lift the 2-D flow
to 3-D per-pixel targets by bilinearly sampling the target point image at
the flowed pixel locations, and read off per-node predicted locations
through the pixel anchors. Feeds the same NICPProblem/GNProblem landmark
interface as the projective and Lepard sources — the three scene-flow
sources are interchangeable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.camera import bilinear_sample
from occlusionfusion_tpu.models.pwcnet import masknet_forward, pwcnet_forward


@functools.partial(jax.jit, static_argnames=("flow_scale", "downscale"))
def flow_correspondences(
    pwc_params,
    source_rgbxyz: jnp.ndarray,  # [6, H, W] source RGB + point image
    target_rgbxyz: jnp.ndarray,  # [6, H, W]
    flow_scale: float = 20.0,
    mask_params=None,
    downscale: int = 1,
):
    """Returns (flow [H, W, 2] full-res pixels, target_points [H, W, 3],
    valid [H, W], weights [H, W]).

    Mirrors the reference lift: flow predicted at quarter resolution is
    upsampled x4 and scaled x20 (``model.py:898-930``), then the target
    XYZ image is bilinearly sampled at the flowed pixels
    (``model.py:941-954``); a sample is valid when source depth and the
    sampled target depth are positive.

    With ``mask_params`` the MaskNet head predicts per-pixel
    correspondence weights from the decoder features + both RGB-XYZ
    images (``model.py:969-994``) — the landmark-validity weighting the
    Gauss-Newton solver consumes. Without it, weights are 1 where valid.

    ``downscale`` runs PWC (and MaskNet) at 1/ds resolution — the
    correlation pyramid's cost falls ~ds^2 while the lift and the
    returned fields stay full-res (flow values rescaled by ds). The
    reference pins 448x640 (options.py:13-18); at the envelope that
    makes PWC the hot-loop bottleneck.
    """
    H, W = source_rgbxyz.shape[1:]
    ds = int(downscale)
    Hd, Wd = H // ds, W // ds
    if ds > 1:
        src_d = jax.image.resize(
            source_rgbxyz, (6, Hd, Wd), method="bilinear"
        )
        tgt_d = jax.image.resize(
            target_rgbxyz, (6, Hd, Wd), method="bilinear"
        )
    else:
        src_d, tgt_d = source_rgbxyz, target_rgbxyz
    # PWC's 6-level pyramid needs dims divisible by 64 (the reference
    # fixes its input at 448x640, options.py:13-18); zero-pad
    # bottom/right and crop the flow back
    Hp = -(-Hd // 64) * 64
    Wp = -(-Wd // 64) * 64
    src_p = jnp.pad(src_d, ((0, 0), (0, Hp - Hd), (0, Wp - Wd)))
    tgt_p = jnp.pad(tgt_d, ((0, 0), (0, Hp - Hd), (0, Wp - Wd)))
    im1 = src_p[None, :3].transpose(0, 2, 3, 1)
    im2 = tgt_p[None, :3].transpose(0, 2, 3, 1)
    flow_q, feat = pwcnet_forward(pwc_params, im1, im2)
    flow = (
        jax.image.resize(flow_q[0], (Hp, Wp, 2), method="bilinear")
        * flow_scale
    )[:Hd, :Wd]
    if ds > 1:
        # per-axis rescale: when H or W is not divisible by ds the
        # truncated Hd=H//ds gives a resize ratio H/Hd != ds, so scale
        # each flow component by its own true ratio
        flow = jax.image.resize(
            flow, (H, W, 2), method="bilinear"
        ) * jnp.array([W / Wd, H / Hd], jnp.float32)
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    uv = jnp.stack([u + flow[..., 0], v + flow[..., 1]], axis=-1)
    target_xyz = target_rgbxyz[3:].transpose(1, 2, 0)  # [H, W, 3]
    sampled = bilinear_sample(target_xyz, uv.reshape(-1, 2)).reshape(H, W, 3)
    inb = (
        (uv[..., 0] >= 0)
        & (uv[..., 0] <= W - 1)
        & (uv[..., 1] >= 0)
        & (uv[..., 1] <= H - 1)
    )
    src_depth = source_rgbxyz[5]
    valid = inb & (src_depth > 0) & (sampled[..., 2] > 0)
    if mask_params is not None:
        weights = masknet_forward(
            mask_params,
            feat,
            src_p[None].transpose(0, 2, 3, 1),
            tgt_p[None].transpose(0, 2, 3, 1),
        )[0, :Hd, :Wd, 0]
        if ds > 1:
            weights = jax.image.resize(weights, (H, W), method="bilinear")
        weights = jnp.where(valid, weights, 0.0)
    else:
        weights = valid.astype(jnp.float32)
    return flow, sampled, valid, weights


@functools.partial(jax.jit, static_argnames=("patch_size",))
def patchwise_max_weights(
    weights: jnp.ndarray,  # [H, W] MaskNet correspondence weights
    patch_size: int,
) -> jnp.ndarray:
    """Eval-time patchwise-max thresholding (``model/model.py:987-993``):
    within every ``patch_size``-square, keep only the pixel(s) attaining
    the patch's max weight (zero the rest) — per-patch non-max
    suppression that feeds the solver one confident correspondence per
    neighborhood instead of many mediocre ones. TPU-native: one
    ``reduce_window`` max + nearest upsample by repeat (H, W padded up
    to patch multiples; pad band weight 0 never wins a patch unless the
    whole patch is 0, in which case selection is a no-op there)."""
    H, W = weights.shape
    p = patch_size
    Hp = -(-H // p) * p
    Wp = -(-W // p) * p
    w = jnp.pad(weights, ((0, Hp - H), (0, Wp - W)))
    pooled = jax.lax.reduce_window(
        w, -jnp.inf, jax.lax.max, (p, p), (p, p), "VALID"
    )
    up = jnp.repeat(jnp.repeat(pooled, p, axis=0), p, axis=1)[:H, :W]
    selected = jnp.abs(weights - up) <= 1e-8
    return jnp.where(selected, weights, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "flow_scale", "downscale", "bf16", "mask_downscale", "return_uv2"
    ),
)
def flow_targets_at_points(
    pwc_params,
    source_rgbxyz: jnp.ndarray,  # [6, H, W]
    target_rgbxyz: jnp.ndarray,  # [6, H, W]
    uv: jnp.ndarray,  # [P, 2] full-res query pixels (model projections)
    flow_scale: float = 20.0,
    mask_params=None,
    downscale: int = 1,
    bf16: bool = False,
    mask_downscale: int = 1,
    return_uv2: bool = False,
):
    """Sparse lift: flow-derived 3-D targets at ``uv`` only.

    The fused engine consumes flow correspondences at the model points'
    projections (``fused_step.py`` 2b), not on the pixel grid — the
    dense lift materializes [H,W] target/valid fields (H*W*4-corner
    gathers of the target point image) only for them to be re-sampled
    at P << H*W locations. Here the quarter-res PWC flow is sampled
    directly at uv/4 and only P target lookups happen. First-order
    identical to sampling the dense lift (flow is smooth where the
    mask gate passes; discontinuities are gated by valid/MaskNet).

    Returns (targets [P, 3], valid [P], weights [P]); with
    ``return_uv2`` also the advected full-res pixels [P, 2] (the
    ``flow_mode='advect'`` consumer does its own exact-depth
    association there instead of taking the bilinear 3-D lift).
    """
    H, W = source_rgbxyz.shape[1:]
    ds = int(downscale)
    Hd, Wd = H // ds, W // ds
    if ds > 1:
        src_d = jax.image.resize(
            source_rgbxyz, (6, Hd, Wd), method="bilinear"
        )
        tgt_d = jax.image.resize(
            target_rgbxyz, (6, Hd, Wd), method="bilinear"
        )
    else:
        src_d, tgt_d = source_rgbxyz, target_rgbxyz
    Hp = -(-Hd // 64) * 64
    Wp = -(-Wd // 64) * 64
    src_p = jnp.pad(src_d, ((0, 0), (0, Hp - Hd), (0, Wp - Wd)))
    tgt_p = jnp.pad(tgt_d, ((0, 0), (0, Hp - Hd), (0, Wp - Wd)))
    im1 = src_p[None, :3].transpose(0, 2, 3, 1)
    im2 = tgt_p[None, :3].transpose(0, 2, 3, 1)
    if bf16:
        # perception nets in bfloat16: the MXU's native dtype (2x+ the
        # f32 conv throughput, half the HBM traffic). The output flow is
        # a smooth regressed field consumed through MaskNet/depth gates;
        # bf16's ~3 decimal digits cost <0.1 px at the working
        # magnitudes (A/B: evaluate_dt4d --flow_bf16 vs without).
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t
        )
        pwc_params = cast(pwc_params)
        mask_params = cast(mask_params) if mask_params is not None else None
        im1, im2 = im1.astype(jnp.bfloat16), im2.astype(jnp.bfloat16)
        src_p = src_p.astype(jnp.bfloat16)
        tgt_p = tgt_p.astype(jnp.bfloat16)
    flow_q, feat = pwcnet_forward(pwc_params, im1, im2)  # [1, Hp/4, Wp/4, 2]
    flow_q = flow_q.astype(jnp.float32)
    # full-res pixel (u,v) -> quarter-res (downscaled) grid coordinate.
    # jax.image.resize uses half-pixel centers: out[i] samples
    # in[(i+0.5)*scale-0.5]; the downscale composition therefore maps a
    # full-res pixel to uv_d = (uv+0.5)/ds - 0.5 on the 1/ds grid, and
    # that to q = (uv_d+0.5)/4 - 0.5 on the quarter grid — matching the
    # dense path's resize chain exactly (a plain uv/ds is offset by
    # 0.125*(1-1/ds) quarter-px, ~0.5 full-res px at ds=2)
    uv_d = (uv + 0.5) / ds - 0.5 if ds > 1 else uv
    q = (uv_d + 0.5) / 4.0 - 0.5
    # x flow_scale yields (downscaled-)full-res pixel units — the x4
    # spatial upsample is folded into the reference's x20 convention
    # (model.py:898-930), exactly as the dense path's resize+scale
    fq = bilinear_sample(flow_q[0], q) * flow_scale
    # per-axis ratio to true full-res pixels (handles H % ds != 0)
    fx = fq[:, 0] * (W / Wd if ds > 1 else 1.0)
    fy = fq[:, 1] * (H / Hd if ds > 1 else 1.0)
    uv2 = jnp.stack([uv[:, 0] + fx, uv[:, 1] + fy], -1)
    target_xyz = target_rgbxyz[3:].transpose(1, 2, 0)
    targets = bilinear_sample(target_xyz, uv2)
    inb = (
        (uv2[:, 0] >= 0) & (uv2[:, 0] <= W - 1)
        & (uv2[:, 1] >= 0) & (uv2[:, 1] <= H - 1)
    )
    src_depth = source_rgbxyz[5]
    sdep = bilinear_sample(src_depth[..., None], uv)[:, 0]
    # mirror the dense path's vsamp gate: at depth silhouettes the
    # bilinear target sample mixes z=0 background into a still-positive
    # z; sampling the per-pixel validity field and thresholding rejects
    # those corrupted boundary targets
    tgt_valid_map = (target_rgbxyz[5] > 0).astype(jnp.float32)
    tvsamp = bilinear_sample(tgt_valid_map[..., None], uv2)[:, 0]
    valid = inb & (sdep > 0) & (targets[:, 2] > 0) & (tvsamp > 0.5)
    if mask_params is not None:
        s6 = src_p[None].transpose(0, 2, 3, 1)
        t6 = tgt_p[None].transpose(0, 2, 3, 1)
        mfeat = feat
        mds = int(mask_downscale)
        if mds > 1:
            # MaskNet at 1/mds resolution: the weight field is a smooth
            # confidence gate — its convs (which run at FULL padded res
            # in the reference, model.py:23-56) cost /mds^2 while the
            # per-point sample below interpolates the same smooth field
            s6 = jax.image.resize(
                s6, (1, Hp // mds, Wp // mds, 6), method="bilinear"
            )
            t6 = jax.image.resize(
                t6, (1, Hp // mds, Wp // mds, 6), method="bilinear"
            )
            fH, fW = feat.shape[1], feat.shape[2]
            mfeat = jax.image.resize(
                feat, (1, fH // mds, fW // mds, feat.shape[3]),
                method="bilinear",
            )
        weights_map = masknet_forward(mask_params, mfeat, s6, t6)[
            0, :, :, 0
        ].astype(jnp.float32)
        # sample the (padded, downscaled) weight map at uv_d with the
        # same half-pixel-center composition as the flow sample above
        scale_uv = (uv_d + 0.5) / mds - 0.5 if mds > 1 else uv_d
        w = bilinear_sample(weights_map[..., None], scale_uv)[:, 0]
        weights = jnp.where(valid, w, 0.0)
    else:
        weights = valid.astype(jnp.float32)
    if return_uv2:
        return targets, valid, weights, uv2
    return targets, valid, weights


def sample_weight_field(
    weights: jnp.ndarray,  # [H, W] MaskNet correspondence weights
    u: jnp.ndarray,  # [P] projected pixel x
    v: jnp.ndarray,  # [P] projected pixel y
    nms_active: bool,
) -> jnp.ndarray:
    """Sample the MaskNet weight field at projected point locations.

    Bilinear for the continuous field; nearest-neighbor once the field
    has been patchwise-NMS'd — bilinear sampling of an NMS'd field
    attenuates the isolated survivors toward zero between them, making
    any downstream threshold far stricter than the reference's
    pixel-grid selection (``model/model.py:989-994``)."""
    h, w = weights.shape
    if nms_active:
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        return weights[vi, ui]
    uv = jnp.stack([u, v], -1)
    return bilinear_sample(weights[..., None], uv)[:, 0]


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def predicted_node_locations(
    target_points: jnp.ndarray,  # [H, W, 3] flow-lifted targets
    valid: jnp.ndarray,  # [H, W]
    pixel_anchors: jnp.ndarray,  # [H, W, K] node ids (-1 invalid)
    pixel_weights: jnp.ndarray,  # [H, W, K]
    num_nodes: int,
):
    """Per-node predicted target location: skinning-weighted mean of the
    flow targets of the pixels anchored to each node
    (``run_model.py:115-217``'s node-target reduction).

    Returns (locations [N, 3], observed [N])."""
    n = num_nodes
    K = pixel_anchors.shape[-1]
    flat_anchor = pixel_anchors.reshape(-1)
    flat_w = (pixel_weights * valid[..., None]).reshape(-1)
    flat_w = jnp.where(flat_anchor >= 0, flat_w, 0.0)
    flat_anchor = jnp.maximum(flat_anchor, 0)
    flat_pts = jnp.repeat(target_points.reshape(-1, 3), K, axis=0)
    num = jax.ops.segment_sum(
        flat_pts * flat_w[:, None], flat_anchor, num_segments=n
    )
    den = jax.ops.segment_sum(flat_w, flat_anchor, num_segments=n)
    observed = den > 1e-6
    locations = jnp.where(
        observed[:, None], num / jnp.maximum(den[:, None], 1e-6), 0.0
    )
    return locations, observed
