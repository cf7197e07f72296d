"""Skinning weights from K-nearest graph nodes.

Mirrors the reference warp field's skinning contract
(``fusion_with_occlusion/warpfield.py:83-129``): 4-NN Gaussian weights
w = exp(-d^2 / (2 sigma^2)) with sigma = node_coverage, anchors further
than ``cutoff_sigmas * sigma`` dropped, rows renormalized; a point with no
surviving anchor is "unreachable" (all-zero weights) and the caller treats
it via the returned validity mask.

KNN itself comes from ops/knn.py (Pallas kernel with a lax twin).
"""

from __future__ import annotations

import jax.numpy as jnp

from occlusionfusion_tpu.ops.knn import knn


def skinning_weights(
    points: jnp.ndarray,
    node_positions: jnp.ndarray,
    node_valid: jnp.ndarray | None,
    node_coverage: float,
    k: int = 4,
    cutoff_sigmas: float = 4.0,
    require_all_anchors: bool = False,
    norm_eps: float = 1e-12,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute per-point anchors + normalized Gaussian skinning weights.

    Args:
      points: [P, 3].
      node_positions: [N, 3] (padded rows allowed).
      node_valid: optional [N] bool mask of real nodes.
      node_coverage: Gaussian sigma (meters).
      k: anchors per point (reference GRAPH_K=4, ``csrc/cpu/graph_proc.h:8``).
      cutoff_sigmas: drop anchors beyond this many sigmas.
      require_all_anchors: if True, a point is reachable only when *all* k
        anchors lie within the cutoff (the warp field's stricter contract,
        ``warpfield.py:122``); otherwise any surviving anchor suffices.
      norm_eps: epsilon added to the weight-sum denominator (the warp
        field uses 1e-6, ``warpfield.py:128``).

    Returns:
      anchors [P, k] int32, weights [P, k] f32 (rows sum to ~1 or 0),
      reachable [P] bool.
    """
    dists2, anchors = knn(points, node_positions, k=k, valid=node_valid)
    sigma2 = node_coverage * node_coverage
    cutoff2 = (cutoff_sigmas * node_coverage) ** 2
    in_range = dists2 <= cutoff2
    w = jnp.where(in_range, jnp.exp(-dists2 / (2.0 * sigma2)), 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    if require_all_anchors:
        reachable = jnp.all(in_range, axis=-1)
    else:
        reachable = total[..., 0] > 1e-12
    w = jnp.where(reachable[..., None], w / (total + norm_eps), 0.0)
    return anchors, w, reachable
