"""Projective data association + per-node motion observations.

Round-1 scene-flow source for the fusion loop: classic dynamic-fusion
projective correspondences (deformed model point -> backprojected target
pixel along its line of sight), replacing the reference's
DeformNet-optical-flow / Lepard landmark sources
(``fusion.py:137-145``, ``run_model.py:115-217``) until the learned
matcher stack is wired in. The per-node motion observations feeding the
motion-completion GNN are skinning-weighted averages of the point
correspondences anchored to each node (a flow-free surrogate for
``run_model.get_predicted_location``'s per-node targets).

Everything is static-shape, masked, and jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.camera import Intrinsics, backproject_depth


@functools.partial(jax.jit, static_argnames=("max_depth_diff", "bilinear"))
def projective_correspondences(
    deformed_points: jnp.ndarray,  # [P, 3] current model in camera frame
    point_valid: jnp.ndarray,  # [P]
    depth_im: jnp.ndarray,  # [H, W]
    intr: Intrinsics,
    max_depth_diff: float = 0.1,
    bilinear: bool = True,
):
    """Returns (targets [P, 3], valid [P]).

    A correspondence is valid when the deformed point projects in-frame
    onto observed depth within ``max_depth_diff`` along z.

    With ``bilinear=True`` (default) the observed depth at the continuous
    projection (u, v) is a validity-weighted bilinear blend of the four
    surrounding pixels, and only corners on the *same surface* as the
    predicted point (|d_corner − z| < max_depth_diff) contribute — so the
    blend never mixes foreground and background across a depth edge. The
    target is backprojected at the continuous (u, v), removing the
    half-pixel quantization noise floor of nearest-pixel association
    (the reference's bilinear target sampling: ``model/model.py:941-954``).
    ``bilinear=False`` keeps the original nearest-pixel association.
    """
    H, W = depth_im.shape
    z = deformed_points[:, 2]
    ok = z > 1e-6
    zs = jnp.where(ok, z, 1.0)
    u = deformed_points[:, 0] / zs * intr.fx + intr.cx
    v = deformed_points[:, 1] / zs * intr.fy + intr.cy

    if not bilinear:
        px = jnp.round(u).astype(jnp.int32)
        py = jnp.round(v).astype(jnp.int32)
        inb = (px >= 0) & (px < W) & (py >= 0) & (py < H) & ok
        pxc = jnp.clip(px, 0, W - 1)
        pyc = jnp.clip(py, 0, H - 1)
        d = depth_im[pyc, pxc]
        close = jnp.abs(d - z) < max_depth_diff
        valid = point_valid & inb & (d > 0) & close
        tx = (pxc.astype(jnp.float32) - intr.cx) / intr.fx * d
        ty = (pyc.astype(jnp.float32) - intr.cy) / intr.fy * d
        targets = jnp.stack([tx, ty, d], axis=-1)
        targets = jnp.where(valid[:, None], targets, deformed_points)
        return targets, valid

    targets, dvalid = depth_association_at_pixels(
        u, v, z, depth_im, intr, max_depth_diff
    )
    valid = point_valid & ok & dvalid
    targets = jnp.where(valid[:, None], targets, deformed_points)
    return targets, valid


def depth_association_at_pixels(
    u: jnp.ndarray,  # [P] query pixel x (continuous)
    v: jnp.ndarray,  # [P] query pixel y
    z_ref: jnp.ndarray,  # [P] predicted depth the association must match
    depth_im: jnp.ndarray,  # [H, W]
    intr: Intrinsics,
    max_depth_diff: float,
):
    """Same-surface-gated bilinear depth association at arbitrary query
    pixels: the observed depth at continuous (u, v) is a validity-
    weighted bilinear blend of the four surrounding pixels where only
    corners consistent with ``z_ref`` (|d − z_ref| < max_depth_diff)
    vote — the blend never mixes foreground and background across a
    depth edge, so the returned target carries the EXACT along-ray
    depth of the observed surface rather than a corrupted 3-D lift.

    Serves both the classic projective association (query = the point's
    own projection) and the flow-advected hybrid (query = projection
    advected by optical flow — ``flow_mode='advect'``), which injects
    flow's tangential information while keeping projective depth
    accuracy (the reference's flow source lifts bilinearly from the
    target point image instead, ``run_model.py:115-217``, which is
    exactly the corrupted-lift failure the advect mode avoids).

    Returns (targets [P, 3] backprojected at (u, v), valid [P])."""
    H, W = depth_im.shape
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    fu = u - x0.astype(jnp.float32)
    fv = v - y0.astype(jnp.float32)
    num = jnp.zeros_like(z_ref)
    den = jnp.zeros_like(z_ref)
    for dy, dx, wgt in (
        (0, 0, (1.0 - fu) * (1.0 - fv)),
        (0, 1, fu * (1.0 - fv)),
        (1, 0, (1.0 - fu) * fv),
        (1, 1, fu * fv),
    ):
        cx_ = x0 + dx
        cy_ = y0 + dy
        inb = (cx_ >= 0) & (cx_ < W) & (cy_ >= 0) & (cy_ < H)
        dc = depth_im[jnp.clip(cy_, 0, H - 1), jnp.clip(cx_, 0, W - 1)]
        # same-surface gate: a corner only votes if its depth is already
        # consistent with the predicted point, so edges don't blend.
        good = inb & (dc > 0) & (jnp.abs(dc - z_ref) < max_depth_diff)
        w = jnp.where(good, wgt, 0.0)
        num = num + w * dc
        den = den + w
    d = num / jnp.maximum(den, 1e-12)
    valid = (den > 1e-6) & (jnp.abs(d - z_ref) < max_depth_diff)
    tx = (u - intr.cx) / intr.fx * d
    ty = (v - intr.cy) / intr.fy * d
    targets = jnp.stack([tx, ty, d], axis=-1)
    return targets, valid


@jax.jit
def node_motion_observations(
    deformed_points: jnp.ndarray,  # [P, 3]
    targets: jnp.ndarray,  # [P, 3]
    corr_valid: jnp.ndarray,  # [P]
    point_anchors: jnp.ndarray,  # [P, K]
    point_weights: jnp.ndarray,  # [P, K]
    deformed_nodes: jnp.ndarray,  # [N, 3]
    node_visible: jnp.ndarray,  # [N]
):
    """Per-node observed motion: skinning-weighted mean displacement of the
    valid correspondences anchored to each node.

    Returns (node_motion [N, 3], observed [N] bool).
    """
    n = deformed_nodes.shape[0]
    disp = targets - deformed_points  # [P, 3]
    w = point_weights * corr_valid[:, None]  # [P, K]
    flat_anchor = point_anchors.reshape(-1)
    flat_w = w.reshape(-1)
    flat_disp = jnp.repeat(disp, point_anchors.shape[1], axis=0)
    num = jax.ops.segment_sum(
        flat_disp * flat_w[:, None], flat_anchor, num_segments=n
    )
    den = jax.ops.segment_sum(flat_w, flat_anchor, num_segments=n)
    observed = (den > 1e-6) & node_visible
    motion = jnp.where(
        observed[:, None], num / jnp.maximum(den[:, None], 1e-6), 0.0
    )
    return motion, observed


def cluster_match_filter(
    point_anchors: jnp.ndarray,  # [P, K] node ids
    point_weights: jnp.ndarray,  # [P, K] skinning weights
    corr_weight: jnp.ndarray,  # [P] correspondence weights in [0, 1]
    node_clusters: jnp.ndarray,  # [N] component id per node (-1 padded)
    node_valid: jnp.ndarray,  # [N]
    min_cluster_weight: float,
):
    """Freeze match-starved graph components (reference
    ``model/model.py:1143-1221``): sum each match's skinning weights onto
    its anchor nodes, reduce per connected component, and mark every node
    of a component below ``min_cluster_weight`` as frozen. Matches
    anchored to any frozen node are dropped too (their residuals would
    otherwise drag the frozen component's neighbors).

    The reference physically removes the nodes and reindexes
    (``:1192-1221``); with static shapes the TPU design freezes them via
    ``solve_node_mask`` instead — a starved component keeps its previous
    transforms rather than exploding on garbage associations.

    Returns (node_solve_mask [N] bool, corr_weight' [P])."""
    n = node_clusters.shape[0]
    w = point_weights * corr_weight[:, None]
    match_w_node = jax.ops.segment_sum(
        w.reshape(-1),
        jnp.maximum(point_anchors, 0).reshape(-1),
        num_segments=n,
    ) * node_valid.astype(jnp.float32)
    cid = jnp.clip(node_clusters, 0, n - 1)
    cluster_w = jax.ops.segment_sum(match_w_node, cid, num_segments=n)
    cluster_ok = cluster_w >= min_cluster_weight
    node_ok = cluster_ok[cid] & node_valid & (node_clusters >= 0)
    corr_ok = jnp.all(node_ok[jnp.maximum(point_anchors, 0)], axis=1)
    return node_ok, corr_weight * corr_ok.astype(jnp.float32)
