"""Recursive Schur-complement SPD inversion — an MXU-shaped linear
solver for the dense Gauss-Newton normal equations.

Why: XLA's Cholesky on TPU factors by sequential 128-wide panels — for
the [6N, 6N] ED-graph systems (N = 128..512 node caps) the factorization
is latency-bound, not FLOP-bound, and dominates the fused per-frame cost
(ROADMAP perf item 2; the reference hits the same wall with its LU solve,
``model/model.py:1450-1491``, but hides it in a 200-iteration Adam loop).

This solver trades ~6x the FLOPs for a log-depth chain of large matmuls:

  M = [[A, B], [B^T, D]],  S = D - B^T A^-1 B        (SPD Schur)
  M^-1 = [[A^-1 + W S^-1 W^T, -W S^-1], [-(W S^-1)^T, S^-1]],
  W = A^-1 B

recursing on A and S down to a leaf solved by one small LU. Every step
is a [n/2]^3 matmul that lands on the MXU; total sequential op count is
O(leaf-count) instead of O(n / panel). The LM damping added to the GN
system bounds the condition number, which keeps the explicit inverse
numerically safe in f32 (validated against Cholesky in
tests/test_gauss_newton_dense.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def spd_schur_inverse(M: jnp.ndarray, leaf: int = 96) -> jnp.ndarray:
    """Inverse of a well-conditioned SPD matrix by recursive 2x2 block
    Schur complements (all matmuls, precision=highest)."""
    n = M.shape[0]
    if n <= leaf:
        return jnp.linalg.inv(M)
    h = (n // 2 + 5) // 6 * 6  # split on a 6-dof node boundary
    if h >= n:
        return jnp.linalg.inv(M)
    A = M[:h, :h]
    B = M[:h, h:]
    D = M[h:, h:]
    Ai = spd_schur_inverse(A, leaf)
    W = jnp.matmul(Ai, B, precision="highest")  # A^-1 B
    S = D - jnp.matmul(B.T, W, precision="highest")
    Si = spd_schur_inverse(S, leaf)
    WSi = jnp.matmul(W, Si, precision="highest")
    TL = Ai + jnp.matmul(WSi, W.T, precision="highest")
    top = jnp.concatenate([TL, -WSi], axis=1)
    bot = jnp.concatenate([-WSi.T, Si], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def spd_schur_solve(M: jnp.ndarray, rhs: jnp.ndarray,
                    leaf: int = 96) -> jnp.ndarray:
    """Solve M x = rhs for SPD M via the recursive inverse (one extra
    matvec; the inverse is the reusable artifact)."""
    Minv = spd_schur_inverse(M, leaf)
    return jnp.matmul(Minv, rhs, precision="highest")
