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

import jax
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


def _block_size(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= target and a multiple of 6
    (falls back to 6, then to whatever divides)."""
    best = 1
    b = 6
    while b <= min(target, n):
        if n % b == 0:
            best = b
        b += 6
    if best > 1:
        return best
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return n


def newton_schulz_inverse(
    M: jnp.ndarray, block: int = 96, iters: int = 12
) -> jnp.ndarray:
    """Approximate inverse of a damped-SPD matrix by Newton-Schulz
    iteration seeded with the exact block-Jacobi inverse.

    Chain shape: ONE batched small-block ``inv`` + ``2 * iters`` full-size
    matmuls — a fixed, short dependency chain of MXU work, against
    Cholesky's sequential-panel factorization and the Schur recursion's
    per-leaf LU chain (both latency-bound on TPU at ED-graph sizes,
    ROADMAP perf item 2).

      X0 = alpha * blockdiag(D_i^-1),  alpha = 1 / ||X0' M||_inf
      X  <- X(2I - MX)                 (error I - X M squares each step)

    The infinity-norm scaling guarantees every eigenvalue of ``X0 M``
    lies in (0, 1], so the iteration is unconditionally convergent for
    SPD ``M``; the LM damping the GN solver adds bounds the condition
    number, which bounds the iteration count for a given accuracy.
    """
    n = M.shape[0]
    b = _block_size(n, block)
    m = n // b
    idx = jnp.arange(m)
    D = M.reshape(m, b, m, b)[idx, :, idx, :]  # [m, b, b]
    Di = jnp.linalg.inv(D)
    # T = blockdiag(Di) @ M without materializing the blockdiag
    T = jnp.einsum(
        "mij,mjk->mik", Di, M.reshape(m, b, n), precision="highest"
    ).reshape(n, n)
    alpha = 1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(T), axis=1)), 1e-20)
    X = jnp.zeros((m, b, m, b), M.dtype).at[idx, :, idx, :].set(
        alpha * Di
    ).reshape(n, n)

    def body(X, _):
        P = jnp.matmul(M, X, precision="highest")
        X = 2.0 * X - jnp.matmul(X, P, precision="highest")
        return X, None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X


def newton_schulz_solve(
    M: jnp.ndarray, rhs: jnp.ndarray, block: int = 96, iters: int = 12
) -> jnp.ndarray:
    """Solve M x = rhs (damped SPD) via the Newton-Schulz inverse."""
    X = newton_schulz_inverse(M, block=block, iters=iters)
    return jnp.matmul(X, rhs, precision="highest")
