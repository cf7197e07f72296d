"""Closed-form rigid alignment (Kabsch / weighted Procrustes) in JAX.

TPU-native equivalent of the reference's two rigid solvers:
``motion_complete_utils.py:301-308`` (rigid_icp, unweighted Kabsch used by
the motion-completion preprocessing) and
``lepard/models/procrustes.py:17-44`` (batched weighted SVD Procrustes).
Both are a single 3x3 SVD — trivially cheap, kept in f32 and fully jittable
so they can live inside the per-frame fused step.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find (R, t) minimizing sum_i w_i || R src_i + t - dst_i ||^2.

    Args:
      src: [..., N, 3] source points.
      dst: [..., N, 3] target points.
      weights: optional [..., N] non-negative weights (masks double as
        weights — pass the validity mask to solve over a padded array).

    Returns:
      (R [..., 3, 3], t [..., 3]).
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None]
    wsum = jnp.sum(w, axis=-2) + eps
    c_src = jnp.sum(w * src, axis=-2) / wsum
    c_dst = jnp.sum(w * dst, axis=-2) / wsum
    src_c = src - c_src[..., None, :]
    dst_c = dst - c_dst[..., None, :]
    # 3x3 cross-covariance; HIGHEST precision so the TPU MXU doesn't drop
    # to bf16 on the geometry path
    H = jnp.einsum("...ni,...nj->...ij", w * src_c, dst_c, precision="highest")
    U, _, Vt = jnp.linalg.svd(H)
    # R maps src -> dst: R = V diag(1,1,d) U^T with d = det(V U^T)
    V = jnp.swapaxes(Vt, -1, -2)
    d = jnp.linalg.det(
        jnp.einsum(
            "...ij,...kj->...ik", V, U, precision="highest"
        )
    )
    D = jnp.zeros_like(H) + jnp.eye(3, dtype=src.dtype)
    D = D.at[..., 2, 2].set(d)
    R = jnp.einsum(
        "...ij,...jk,...lk->...il", V, D, U, precision="highest"
    )
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src, precision="highest")
    return R, t


def kabsch(src: jnp.ndarray, dst: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unweighted rigid alignment; see :func:`weighted_kabsch`."""
    return weighted_kabsch(src, dst, None)
