"""Embedded-deformation warp (linear blend skinning over graph nodes).

TPU-native core of the warp field: y = sum_k w_k (R_k (x - g_k) + g_k + t_k)
— the pivoted form of ``NonRigidICP/model/geometry.py:9`` (ED_warp). The
reference has three separate implementations (torch batched, numba-CUDA,
numba-CPU — ``fusion_with_occlusion/warpfield.py:208-305``); here there is
exactly one, expressed as gathers + einsum so XLA fuses it, and it is the
lax "twin" the Pallas LBS kernel (ops/lbs.py) is tested against.

All inputs are statically shaped; padded anchors carry zero weight.
"""

from __future__ import annotations

import jax.numpy as jnp


def ed_warp(
    points: jnp.ndarray,
    node_positions: jnp.ndarray,
    node_rotations: jnp.ndarray,
    node_translations: jnp.ndarray,
    anchors: jnp.ndarray,
    anchor_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Warp points through the embedded-deformation graph.

    Args:
      points: [P, 3] canonical points.
      node_positions: [N, 3] canonical node positions g.
      node_rotations: [N, 3, 3] per-node rotations R.
      node_translations: [N, 3] per-node translations t.
      anchors: [P, K] int32 node indices (padded entries may be any valid
        index; their weight must be 0).
      anchor_weights: [P, K] skinning weights (rows sum to 1 for reachable
        points, 0 for unreachable ones — unreachable points map to the
        weighted-zero position, callers keep their own validity mask).

    Returns:
      [P, 3] warped points.
    """
    g = node_positions[anchors]  # [P, K, 3]
    R = node_rotations[anchors]  # [P, K, 3, 3]
    t = node_translations[anchors]  # [P, K, 3]
    local = points[:, None, :] - g  # [P, K, 3]
    rotated = jnp.einsum("pkij,pkj->pki", R, local, precision="highest")
    blended = jnp.sum(anchor_weights[..., None] * (rotated + g + t), axis=1)
    return blended


def ed_warp_normals(
    normals: jnp.ndarray,
    node_rotations: jnp.ndarray,
    anchors: jnp.ndarray,
    anchor_weights: jnp.ndarray,
    renormalize: bool = True,
) -> jnp.ndarray:
    """Rotate normals through the blended node rotations.

    Mirrors ``warpfield.py:312-345`` (deform_normals): n' = sum_k w_k R_k n,
    optionally renormalized.
    """
    R = node_rotations[anchors]  # [P, K, 3, 3]
    rotated = jnp.einsum("pkij,pj->pki", R, normals, precision="highest")
    blended = jnp.sum(anchor_weights[..., None] * rotated, axis=1)
    if renormalize:
        norm = jnp.linalg.norm(blended, axis=-1, keepdims=True)
        blended = blended / jnp.maximum(norm, 1e-8)
    return blended
