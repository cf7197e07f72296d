"""Evaluation metrics: the reference's full metric suite in JAX.

Mirrors ``model/loss.py:281-352`` (EPE 2D / 3D / warp, Graph Error 3D),
``model/evaluate.py:13-214`` (valid-solve ratio evaluation loop contract)
and ``lepard/models/loss.py:192,396,428`` (NFMR, inlier ratio,
registration recall). All masked/padded and jittable so they can run
on-device inside evaluation scans.
"""

from __future__ import annotations

import jax.numpy as jnp


def epe_2d(pred_flow, gt_flow, mask):
    """Mean L2 endpoint error over valid pixels; flows [..., 2]."""
    err = jnp.linalg.norm(pred_flow - gt_flow, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def epe_3d(pred, gt, mask):
    """Mean L2 error over valid 3D points (EPE 3D / EPE warp / Graph Error
    3D are all this, applied to scene-flow points, warped points, or graph
    node positions respectively)."""
    err = jnp.linalg.norm(pred - gt, axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def accuracy_at(pred, gt, mask, threshold: float):
    """Fraction of valid points with error below threshold (AccS/AccR
    style metrics)."""
    err = jnp.linalg.norm(pred - gt, axis=-1)
    ok = (err < threshold).astype(jnp.float32) * mask.astype(jnp.float32)
    return jnp.sum(ok) / jnp.maximum(jnp.sum(mask), 1.0)


def nfmr(pred_flow, gt_flow, mask, threshold: float = 0.04):
    """Non-rigid Feature Matching Recall (``lepard/models/loss.py:192``):
    fraction of valid points whose predicted flow lands within threshold
    of the ground-truth flow."""
    return accuracy_at(pred_flow, gt_flow, mask, threshold)


def inlier_ratio(
    warped_src, tgt, match_src, match_tgt, match_valid, threshold: float = 0.04
):
    """Fraction of predicted matches within threshold after warping
    (``lepard/models/loss.py:396``)."""
    d = jnp.linalg.norm(warped_src[match_src] - tgt[match_tgt], axis=-1)
    ok = (d < threshold).astype(jnp.float32) * match_valid.astype(jnp.float32)
    return jnp.sum(ok) / jnp.maximum(jnp.sum(match_valid), 1.0)


def registration_recall(R_pred, t_pred, R_gt, t_gt, rot_thresh_deg=15.0,
                        trans_thresh=0.1):
    """Rigid registration success (``lepard/models/loss.py:428``):
    rotation geodesic angle and translation error under thresholds."""
    trace = jnp.trace(R_pred.T @ R_gt)
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos))
    terr = jnp.linalg.norm(t_pred - t_gt)
    return (ang < rot_thresh_deg) & (terr < trans_thresh)


def valid_solve_ratio(valid_flags):
    """Fraction of frames whose solver produced a usable solution
    (``model/evaluate.py`` valid-solve accounting)."""
    v = valid_flags.astype(jnp.float32)
    return jnp.sum(v) / jnp.maximum(v.size, 1)
