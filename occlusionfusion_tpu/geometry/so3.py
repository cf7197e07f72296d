"""SO(3)/SE(3) maps in pure JAX.

TPU-native replacement for the rotation machinery the reference pulls from
lietorch (``NonRigidICP/model/registration_fusion.py:196-219``) and kornia
(``model/model.py:1522-1526``): exponential/log maps with numerically safe
small-angle branches (implemented with ``jnp.where`` on safe operands so the
whole thing jits and differentiates cleanly), plus quaternion conversions.

Deliberately matmul-free: Rodrigues is expressed through the outer product
w w^T (W^2 = w w^T - theta^2 I), so on TPU everything rides the VPU in full
f32 — a 3x3 ``@`` would hit the MXU at default (bfloat16) precision and
silently cost ~1e-3 of rotation accuracy.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle vector -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] skew-symmetric matrix -> [..., 3] vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _outer(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] outer product w w^T (elementwise, no MXU)."""
    return w[..., :, None] * w[..., None, :]


def _sin_over_x(x2: jnp.ndarray) -> jnp.ndarray:
    """sin(sqrt(x2))/sqrt(x2), safe at 0 (x2 = theta^2 >= 0)."""
    small = x2 < 1e-8
    x2s = jnp.where(small, 1.0, x2)
    x = jnp.sqrt(x2s)
    return jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(x) / x)


def _one_minus_cos_over_x2(x2: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(sqrt(x2)))/x2, safe at 0."""
    small = x2 < 1e-8
    x2s = jnp.where(small, 1.0, x2)
    return jnp.where(small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(jnp.sqrt(x2s))) / x2s)


def _x_minus_sin_over_x3(x2: jnp.ndarray) -> jnp.ndarray:
    """(x - sin(x))/x^3 with x = sqrt(x2), safe at 0."""
    small = x2 < 1e-8
    x2s = jnp.where(small, 1.0, x2)
    x = jnp.sqrt(x2s)
    return jnp.where(small, 1.0 / 6.0 - x2 / 120.0, (x - jnp.sin(x)) / (x2s * x))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map: [..., 3] -> [..., 3, 3] rotation matrix.

    R = cos(t) I + sin(t)/t W + (1-cos(t))/t^2 w w^T,  t = |w|.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    a = _sin_over_x(theta2)[..., None, None]
    b = _one_minus_cos_over_x2(theta2)
    cos_t = (1.0 - b * theta2)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return cos_t * eye + a * hat(w) + b[..., None, None] * _outer(w)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: [..., 3, 3] rotation matrix -> [..., 3] axis-angle.

    Safe for angles in [0, pi); near pi accuracy degrades gracefully
    (sufficient for the incremental rotations the solvers produce).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small, 1.0, 2.0 * sin_theta),
    )
    return factor[..., None] * vee(R - jnp.swapaxes(R, -1, -2))


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SE(3) exp: [..., 6] (omega | v) -> (R [..., 3, 3], t [..., 3]).

    t = V v with V = I + (1-cos)/t^2 W + (t-sin)/t^3 W^2, expanded through
    W^2 = w w^T - t^2 I to stay matmul-free.
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    R = so3_exp(w)
    b = _one_minus_cos_over_x2(theta2)
    c = _x_minus_sin_over_x3(theta2)
    # V = (1 - c t^2) I + b W + c w w^T
    diag = (1.0 - c * theta2)[..., None] * v
    cross = b[..., None] * jnp.cross(w, v)
    outer = c[..., None] * w * jnp.sum(w * v, axis=-1, keepdims=True)
    t = diag + cross + outer
    return R, t


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) unit quaternion -> [..., 3, 3] rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> [..., 4] (w, x, y, z) quaternion.

    Branchless Shepperd-style selection of the numerically best of the four
    candidate quaternions (jit-safe: all four are computed, the max-pivot
    one is selected with take_along_axis).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    piv_w = 1 + tr
    piv_x = 1 + m00 - m11 - m22
    piv_y = 1 - m00 + m11 - m22
    piv_z = 1 - m00 - m11 + m22
    # candidate rows carry the raw pivot so that after the 0.5/sqrt(pivot)
    # scale the pivot component becomes sqrt(pivot)/2 = S/4
    qw = jnp.stack([piv_w, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, piv_x, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, piv_y, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, piv_z], axis=-1)
    pivots = jnp.stack([piv_w, piv_x, piv_y, piv_z], axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 candidates, 4]
    scale = 0.5 / safe_sqrt(pivots)[..., None]
    cand = cand * scale
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
