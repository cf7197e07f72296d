"""Warp-field optimization cost terms (pure JAX, padded/masked).

TPU-native re-implementation of the reference's N-ICP cost suite
(``NonRigidICP/model/loss.py``): ARAP, landmark, truncated chamfer,
silhouette, projective depth, occlusion-fusion motion, and smoothness.
All terms take static-shape padded arrays with validity masks so the whole
objective jits once and differentiates via autodiff.

Deviations from the reference (documented, deliberate):
  * motion cost weights by confidence^2, the form the paper and the
    reference's own tests use — the fork's ``loss.py:299`` accidentally
    weights by target *location*^2 (SURVEY.md §0).
  * chamfer subsampling uses an explicit PRNG key (no hidden global
    randomness under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.ops.knn import knn_lax


def arap_cost(
    rotations: jnp.ndarray,  # [N, 3, 3]
    translations: jnp.ndarray,  # [N, 3] (pivoted)
    nodes: jnp.ndarray,  # [N, 3]
    edges: jnp.ndarray,  # [N, K] int32, -1 padded
    edge_weights: jnp.ndarray,  # [N, K], 0 on padding
) -> jnp.ndarray:
    """sum_ij w_ij || R_i (g_j - g_i) + g_i + t_i - (g_j + t_j) ||^2
    (``loss.py:221-245``)."""
    e = jnp.maximum(edges, 0)
    g_i = nodes[:, None]
    g_j = nodes[e]
    t_j = translations[e]
    rotated = jnp.einsum(
        "nij,nkj->nki", rotations, g_j - g_i, precision="highest"
    )
    resid = rotated + g_i + translations[:, None] - g_j - t_j
    per_edge = jnp.sum(resid * resid, axis=-1)
    w = jnp.where(edges >= 0, edge_weights, 0.0)
    return jnp.sum(w * per_edge)


def landmark_cost(
    warped: jnp.ndarray,  # [P, 3]
    targets: jnp.ndarray,  # [M, 3]
    src_idx: jnp.ndarray,  # [L] into warped
    tgt_idx: jnp.ndarray,  # [L] into targets
    mask: jnp.ndarray | None = None,  # [L]
) -> jnp.ndarray:
    """sum over correspondences of squared distance (``loss.py:267-273``).

    ``mask`` may be boolean (gate) or float (continuous correspondence
    weights, the MaskNet-as-weights semantic of ``model.py:1338``)."""
    diff = warped[src_idx] - targets[tgt_idx]
    sq = jnp.sum(diff * diff, axis=-1)
    if mask is not None:
        sq = sq * mask.astype(sq.dtype)
    return jnp.sum(sq)


def truncated_chamfer_cost(
    key: jax.Array,
    src: jnp.ndarray,  # [P, 3]
    tgt: jnp.ndarray,  # [Q, 3]
    src_valid: jnp.ndarray | None = None,
    tgt_valid: jnp.ndarray | None = None,
    samples: int = 1000,
    trunc: float = 0.3,
) -> jnp.ndarray:
    """Symmetric truncated chamfer over random subsamples
    (``loss.py:275-292``; squared distances beyond ``trunc`` are zeroed,
    mirroring compute_truncated_chamfer_distance)."""
    k1, k2 = jax.random.split(key)
    P, Q = src.shape[0], tgt.shape[0]
    si = jax.random.randint(k1, (min(samples, P),), 0, P)
    ti = jax.random.randint(k2, (min(samples, Q),), 0, Q)
    s = src[si]
    t = tgt[ti]
    sv = src_valid[si] if src_valid is not None else None
    tv = tgt_valid[ti] if tgt_valid is not None else None
    d2_st, _ = knn_lax(s, t, k=1, valid=tv)
    d2_ts, _ = knn_lax(t, s, k=1, valid=sv)
    d2_st = jnp.where(d2_st[:, 0] < trunc, d2_st[:, 0], 0.0)
    d2_ts = jnp.where(d2_ts[:, 0] < trunc, d2_ts[:, 0], 0.0)
    if sv is not None:
        d2_st = jnp.where(sv, d2_st, 0.0)
    if tv is not None:
        d2_ts = jnp.where(tv, d2_ts, 0.0)
    return jnp.sum(d2_st) + jnp.sum(d2_ts)


def motion_cost(
    nodes: jnp.ndarray,  # [N, 3]
    translations: jnp.ndarray,  # [N, 3]
    target_locations: jnp.ndarray,  # [N, 3] predicted deformed positions
    confidence: jnp.ndarray,  # [N]
    node_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Confidence-weighted deformed-node target residual:
    mean(conf^2 * ||g + t - target||^2). Correct (paper / test) form of
    ``loss.py:295-304``."""
    resid = nodes + translations - target_locations
    per = confidence[:, None] ** 2 * (resid * resid)
    if node_valid is not None:
        per = jnp.where(node_valid[:, None], per, 0.0)
        denom = jnp.maximum(jnp.sum(node_valid) * 3, 1)
    else:
        denom = per.size
    return jnp.sum(per) / denom


def silhouette_cost(
    src_mask: jnp.ndarray, tgt_mask: jnp.ndarray
) -> jnp.ndarray:
    """Penalize source silhouette outside the target silhouette
    (``loss.py:258-266``)."""
    src = src_mask.astype(jnp.float32)
    outside = jnp.where(~tgt_mask, src, 0.0)
    denom = jnp.maximum(jnp.sum(~tgt_mask), 1)
    return jnp.sum(outside * outside) / denom


def projective_depth_cost(
    src_depth: jnp.ndarray, tgt_depth: jnp.ndarray
) -> jnp.ndarray:
    """Mean squared depth difference where both maps observe
    (``loss.py:248-256``)."""
    both = (src_depth > 0) & (tgt_depth > 0)
    err = jnp.where(both, (src_depth - tgt_depth) ** 2, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(both), 1)


def smoothness_cost(current: jnp.ndarray, previous: jnp.ndarray) -> jnp.ndarray:
    """mean((x - x_prev)^2) temporal smoothness
    (``registration_fusion.py:277-279``)."""
    return jnp.mean((current - previous) ** 2)
