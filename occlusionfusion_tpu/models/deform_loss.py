"""Training losses for the neural-tracking stack (DeformLoss) and the
Lepard matcher (focal correspondence loss).

Mirrors ``model/loss.py`` (``DeformLoss:9`` with lambdas flow=5, graph=2,
warp=2, mask=1000 from ``settings/custom_settings.py:57-61``; RobustL1
``:163``; BatchGraphL2 ``:125``) and ``lepard/models/loss.py``
(``MatchMotionLoss:47`` focal correspondence loss ``:286+``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax


class DeformLossWeights(NamedTuple):
    lambda_flow: float = 5.0
    lambda_graph: float = 2.0
    lambda_warp: float = 2.0
    lambda_mask: float = 1000.0


def robust_l1(pred, gt, mask, eps: float = 1e-3):
    """sqrt(|x|^2 + eps^2)-style robust L1 (``model/loss.py:163``)."""
    diff = pred - gt
    err = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps * eps)
    m = mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def graph_l2(pred_translations, gt_translations, node_mask):
    """Mean squared node-translation error (``model/loss.py:125``)."""
    diff = pred_translations - gt_translations
    err = jnp.sum(diff * diff, axis=-1)
    m = node_mask.astype(jnp.float32)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def deform_loss(
    weights: DeformLossWeights,
    flow_pred, flow_gt, flow_mask,
    node_trans_pred, node_trans_gt, node_mask,
    warped_pred, warped_gt, warp_mask,
    mask_pred=None, mask_gt=None, mask_valid=None,
):
    """Combined training loss (``model/loss.py:27-71``)."""
    total = weights.lambda_flow * robust_l1(flow_pred, flow_gt, flow_mask)
    total += weights.lambda_graph * graph_l2(
        node_trans_pred, node_trans_gt, node_mask
    )
    total += weights.lambda_warp * robust_l1(warped_pred, warped_gt, warp_mask)
    if mask_pred is not None:
        bce = optax.sigmoid_binary_cross_entropy(mask_pred, mask_gt)
        m = mask_valid.astype(jnp.float32)
        total += weights.lambda_mask * jnp.sum(bce * m) / jnp.maximum(
            jnp.sum(m), 1.0
        )
    return total


def focal_correspondence_loss(
    conf: jnp.ndarray,  # [S, T] match confidence
    gt_matches: jnp.ndarray,  # [S, T] binary ground-truth correspondence
    valid: jnp.ndarray,  # [S, T]
    alpha: float = 0.25,
    gamma: float = 2.0,
    neg_weight: jnp.ndarray | None = None,  # [S, T] negative-term scale
):
    """Focal BCE over the correspondence matrix
    (``lepard/models/loss.py:286+``): down-weights easy negatives so the
    sparse positive matches dominate.

    ``neg_weight`` scales the negative term per cell — bridge-negative
    supervision passes >1 on cross-surface-identity pairs that are
    geometrically near in the target frame (the confident-but-wrong
    bridges focal BCE alone treats as easy negatives, since nothing in
    a match-level loss distinguishes "near and wrong surface" from
    "far and obviously wrong")."""
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    pos = -alpha * ((1 - conf) ** gamma) * jnp.log(conf) * gt_matches
    neg = -(1 - alpha) * (conf**gamma) * jnp.log(1 - conf) * (1 - gt_matches)
    if neg_weight is not None:
        neg = neg * neg_weight
    m = valid.astype(jnp.float32)
    loss = (pos + neg) * m
    return jnp.sum(loss) / jnp.maximum(jnp.sum(gt_matches * m), 1.0)
