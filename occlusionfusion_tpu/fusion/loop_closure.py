"""Keyframe loop-closure measurement: rigid projective ICP.

North-star subsystem (no reference counterpart — the reference tracks
every frame against one canonical model and accumulates drift,
SURVEY §5 "failure detection/recovery"): keyframes store their depth
observation; a loop closure re-registers the *current* deformed model
against an earlier keyframe's depth with a few rigid
projective-association + weighted-Kabsch rounds. The resulting SE(3)
is an estimate-independent measurement tying the two keyframe poses,
consumed by fusion/pose_graph.py.

The whole ICP runs as ONE jitted lax.scan (static iteration count, no
per-iteration host round trips — through the axon relay a host loop
would cost ~45 ms/iter in dispatch alone).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.fusion.correspondence import projective_correspondences
from occlusionfusion_tpu.geometry.kabsch import weighted_kabsch


class RigidAlignment(NamedTuple):
    rotation: jnp.ndarray  # [3, 3]
    translation: jnp.ndarray  # [3]
    inlier_fraction: jnp.ndarray  # scalar: valid matches / valid points
    residual: jnp.ndarray  # scalar: median |aligned - target| over inliers
    initial_residual: jnp.ndarray  # scalar: same at identity pose — the
    # "was anything off?" gate (symmetric shapes have rotation null
    # spaces; only correct when the model is measurably off the surface).
    # CAVEAT: a fully-lost pose has ZERO initial inliers and the masked
    # median degenerates to 0.0 — always read it together with
    # initial_inlier_fraction (0 inliers => "healthy-looking" 0.0
    # residual is meaningless; that exact confusion kept relocalization
    # from ever firing on the leave-and-revisit regime)
    initial_inlier_fraction: jnp.ndarray = None  # scalar, at identity


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "max_depth_diff", "coarse_init", "coarse_band",
    ),
)
def rigid_depth_alignment(
    points: jnp.ndarray,  # [P, 3] current model points (camera frame)
    point_valid: jnp.ndarray,  # [P]
    depth_im: jnp.ndarray,  # [H, W] the stored keyframe observation
    intr,
    iters: int = 5,
    max_depth_diff: float = 0.1,
    coarse_init: bool = True,
    coarse_inlier_threshold: float = 0.25,
    coarse_band: float = 0.25,
    feat_init: tuple | None = None,  # optional (R [3,3], t [3]) feature
    # pose (e.g. Kabsch over Lepard matches) used INSTEAD of the
    # centroid translation as the lost-state recovery start — a
    # feature pose carries rotation, which geometric centroid init
    # cannot (the revisit clip's surface-identity caveat)
) -> RigidAlignment:
    """Estimate the rigid (R, t) mapping ``points`` onto the surface
    observed in ``depth_im``: iterate projective association and
    weighted Kabsch over the valid matches.

    Projective ICP only converges from inside its association basin
    (``max_depth_diff``); a lost model — the leave-and-revisit regime,
    where the object left the frustum and tracking froze — sits far
    outside it and the identity start finds no inliers at all. With
    ``coarse_init`` (default), when the identity pose's inlier fraction
    is below ``coarse_inlier_threshold`` the solve prepends a
    wide-baseline recovery stage: translation init from the model
    centroid to the observed-cloud centroid, then ``iters`` ICP rounds
    with the wide ``coarse_band`` association gate, before the nominal
    fine rounds. A healthy start (fraction above the threshold) skips
    the recovery stage entirely, so loop-closure measurements between
    overlapping keyframes are unchanged."""

    # SE(3) accumulation must stay in f32 on TPU (default matmul is
    # bf16; a composed R drifts off SO(3) within a few iterations)
    mm = functools.partial(jnp.einsum, precision="highest")

    def masked_median(x, mask):
        big = jnp.where(mask, x, jnp.inf)
        srt = jnp.sort(big)
        idx = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) // 2, 0)
        med = srt[idx]
        return jnp.where(jnp.isfinite(med), med, 0.0)

    def make_step(band):
        def step(carry, _):
            R, t = carry
            cur = mm("pj,ij->pi", points, R) + t
            targets, ok = projective_correspondences(
                cur, point_valid, depth_im, intr, max_depth_diff=band
            )
            # Cauchy reweighting: silhouette-adjacent pixels have steep
            # depth gradients (cm-scale target noise) and would
            # otherwise dominate the point-to-point Kabsch
            dist = jnp.linalg.norm(cur - targets, axis=-1)
            s = jnp.maximum(masked_median(dist, ok), 1e-6)
            w = ok.astype(jnp.float32) / (
                1.0 + jnp.square(dist / (3.0 * s))
            )
            dR, dt = weighted_kabsch(cur, targets, weights=w)
            R = mm("ij,jk->ik", dR, R)
            t = mm("ij,j->i", dR, t) + dt
            return (R, t), None

        return step

    def median_residual(pts):
        targets, ok = projective_correspondences(
            pts, point_valid, depth_im, intr, max_depth_diff=max_depth_diff
        )
        err = masked_median(jnp.linalg.norm(pts - targets, axis=-1), ok)
        frac = jnp.sum(ok.astype(jnp.float32)) / jnp.maximum(
            jnp.sum(point_valid.astype(jnp.float32)), 1.0
        )
        return err, frac

    r0, frac0 = median_residual(points)
    init_R = jnp.eye(3, dtype=points.dtype)
    init_t = jnp.zeros(3, points.dtype)
    if coarse_init:
        from occlusionfusion_tpu.geometry.camera import backproject_depth

        obs = backproject_depth(depth_im, intr).reshape(-1, 3)
        obs_ok = (depth_im.reshape(-1) > 0).astype(jnp.float32)
        obs_c = jnp.sum(obs * obs_ok[:, None], 0) / jnp.maximum(
            jnp.sum(obs_ok), 1.0
        )
        pw = point_valid.astype(jnp.float32)
        pts_c = jnp.sum(points * pw[:, None], 0) / jnp.maximum(
            jnp.sum(pw), 1.0
        )
        lost = (frac0 < coarse_inlier_threshold) & (jnp.sum(obs_ok) > 0)
        start_R = init_R
        start_t = jnp.where(lost, obs_c - pts_c, 0.0)
        if feat_init is not None:
            fR, ft = feat_init
            start_R = jnp.where(lost, fR, start_R)
            start_t = jnp.where(lost, ft, start_t)
        (cR, ct), _ = jax.lax.scan(
            make_step(coarse_band), (start_R, start_t), None, length=iters
        )
        # adopt the recovery pose only when lost — a healthy start keeps
        # the identity init and the wide-band rounds are discarded
        init_R = jnp.where(lost, cR, init_R)
        init_t = jnp.where(lost, ct, init_t)
    (R, t), _ = jax.lax.scan(
        make_step(max_depth_diff), (init_R, init_t), None, length=iters
    )
    final = mm("pj,ij->pi", points, R) + t
    err, frac = median_residual(final)
    return RigidAlignment(
        rotation=R, translation=t, inlier_fraction=frac, residual=err,
        initial_residual=r0, initial_inlier_fraction=frac0,
    )
