"""Pallas LBS voxel-warp kernel (one-hot-weights matmul formulation).

TPU-native replacement for the reference's numba-CUDA LBS kernel
(``warpfield.py:234-266``, device fn ``:607-630``). The key algebraic
re-design: linear blend skinning is *linear in the node transforms* —

    y = sum_k w_k (R_k x + t_k) = (sum_k w_k R_k) x + sum_k w_k t_k

so with origin-form transforms packed as a [N, 12] matrix T, the per-point
blended transform is ``S @ T`` where S is the [P, N] sparse skinning
matrix (4 non-zeros per row). The Pallas kernel materializes S only
block-by-block in VMEM (built from anchors/weights with 4 iota-compares)
and rides the MXU for the [TILE, N] x [N, 12] contraction — no gathers at
all, unlike the XLA twin (geometry/edwarp.py) which gathers [P, K]
transform rows.

Semantics match fusion/warpfield.deform_points: invalid points pass
through unwarped; weights are the normalized skinning weights.

Measured on a v5e chip (262k points, 512 nodes, slope+readback):
standalone, the XLA gather+einsum twin and this kernel are comparable
(XLA can hoist/fuse the gathers). Inside the per-frame ``lax.scan`` of
the fused fusion step the picture inverts: the warp varies per frame,
XLA cannot hoist the [V, K] transform-row gathers, and the twin costs
~5.2 ms/frame, while this kernel's gather-free one-hot MXU contraction
is warp-independent in structure. The production fused step therefore
dispatches to this kernel on TPU (``fusion/fused_step.py`` lbs_impl).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occlusionfusion_tpu.fusion.warpfield import WarpFieldState, to_origin_form


def _pack_transforms(state: WarpFieldState) -> jnp.ndarray:
    """[N, 12]: rows of R (origin form) then t."""
    R, t_origin = to_origin_form(state)
    return jnp.concatenate([R.reshape(-1, 9), t_origin], axis=-1)


def _lbs_kernel(pts_ref, anchors_ref, weights_ref, valid_ref, T_ref, out_ref,
                *, n_nodes: int, k: int):
    pts = pts_ref[:]  # [TILE, 4] (xyz + pad)
    TILE = pts.shape[0]
    # build the block of the sparse skinning matrix S [TILE, N]
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, n_nodes), 1)
    S = jnp.zeros((TILE, n_nodes), jnp.float32)
    for kk in range(k):
        a = anchors_ref[:, kk][:, None]  # [TILE, 1]
        w = weights_ref[:, kk][:, None]
        S = S + jnp.where(node_ids == a, w, 0.0)
    # hand-rolled bf16 split (Mosaic lowers only DEFAULT/HIGHEST; plain
    # DEFAULT is ~2^-8 relative = mm-scale error at metre scale, and
    # HIGHEST is a 6-pass contraction). T arrives pre-split with
    # [T_hi | T_lo] packed into the lane dimension, so 2 bf16 passes
    # give ~2^-17 relative (the dropped S_lo @ T_lo term) — the same
    # construction as DenseSkin / the gn_assembly node table.
    S_hi = S.astype(jnp.bfloat16)
    S_lo = (S - S_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    hi = jax.lax.dot_general(
        S_hi, T_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    lo = jax.lax.dot_general(
        S_lo, T_ref[:], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    blended = hi[:, :12] + hi[:, 12:24] + lo[:, :12]
    # y = B_R x + B_t
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    ox = blended[:, 0] * x + blended[:, 1] * y + blended[:, 2] * z + blended[:, 9]
    oy = blended[:, 3] * x + blended[:, 4] * y + blended[:, 5] * z + blended[:, 10]
    oz = blended[:, 6] * x + blended[:, 7] * y + blended[:, 8] * z + blended[:, 11]
    warped = jnp.stack([ox, oy, oz], axis=-1)
    valid = valid_ref[:, 0][:, None] > 0
    out_ref[:, :3] = jnp.where(valid, warped, pts[:, :3])
    out_ref[:, 3] = jnp.zeros_like(ox)


def lbs_warp_pallas(
    points: jnp.ndarray,  # [P, 3]
    anchors: jnp.ndarray,  # [P, K]
    weights: jnp.ndarray,  # [P, K]
    valid: jnp.ndarray,  # [P]
    state: WarpFieldState,
    # tile=2048 OOMs the 16MB scoped VMEM at 512 nodes (one-hot block +
    # 6-pass HIGHEST contraction); 1024 fits with headroom
    tile: int = 1024,
) -> jnp.ndarray:
    """Warp points through the field; Pallas kernel, MXU inner product."""
    P, K = anchors.shape
    N = state.node_positions.shape[0]
    n_pad = -(-N // 128) * 128
    T = _pack_transforms(state)
    # zero rows for padding nodes: S columns beyond N never referenced,
    # but pad T to n_pad for lane alignment; hi/lo bf16 halves packed
    # side-by-side in the lane dimension (cols 0:12 hi, 12:24 lo)
    T = jnp.pad(T, ((0, n_pad - N), (0, 0)))
    T_hi = T.astype(jnp.bfloat16)
    T_lo = (T - T_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    T = jnp.concatenate([T_hi, T_lo], axis=1)  # [n_pad, 24] bf16
    T = jnp.pad(T, ((0, 0), (0, 128 - 24)))  # lane-align columns

    p_pad = -(-P // tile) * tile
    pts4 = jnp.pad(points.astype(jnp.float32), ((0, p_pad - P), (0, 1)))
    anc = jnp.pad(anchors.astype(jnp.int32), ((0, p_pad - P), (0, 0)))
    wts = jnp.pad(weights.astype(jnp.float32), ((0, p_pad - P), (0, 0)))
    vld = jnp.pad(
        valid.astype(jnp.float32)[:, None], ((0, p_pad - P), (0, 0))
    )

    out = pl.pallas_call(
        functools.partial(_lbs_kernel, n_nodes=n_pad, k=K),
        grid=(p_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((p_pad, 4), jnp.float32),
    )(pts4, anc, wts, vld, T)
    return out[:P, :3]


class DenseSkin(NamedTuple):
    """Precomputed dense skinning matrix, split for 1-pass bf16 matmuls.

    The skinning matrix S [P, N] (4 non-zeros per row) depends only on
    the skin table — it is *warp-independent* and fixed between keyframe
    graph rebuilds. Precomputing it turns the per-frame LBS into a plain
    dense ``S @ T`` that XLA maps straight onto the MXU with NO per-frame
    one-hot build and NO gathers — the per-frame cost is just streaming S
    from HBM once per term.

    bf16 split for f32-grade accuracy at 1-pass-per-term cost:
    ``S @ T ~= S_hi @ T_hi + S_hi @ T_lo + S_lo @ T_hi`` (the dropped
    ``S_lo @ T_lo`` term is ~2^-18 relative — microns at metre scale).
    The two S_hi terms share one HBM read by packing [T_hi | T_lo] into
    the output lanes of a single dot.
    """

    s_hi: jnp.ndarray  # [P, N_pad] bf16
    s_lo: jnp.ndarray  # [P, N_pad] bf16


def dense_skin_bytes(n_points: int, n_nodes: int) -> int:
    n_pad = -(-n_nodes // 128) * 128
    return 2 * n_points * n_pad * 2


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def precompute_dense_skin(
    anchors: jnp.ndarray,  # [P, K]
    weights: jnp.ndarray,  # [P, K]
    valid: jnp.ndarray,  # [P]
    n_nodes: int,
) -> DenseSkin:
    """Materialize the [P, N_pad] skinning matrix as bf16 hi/lo halves.

    Runs once per keyframe (table rebuild); rows of invalid points are
    zero (the warp applies a validity passthrough at the end anyway).
    """
    P, K = anchors.shape
    n_pad = -(-n_nodes // 128) * 128
    ids = jax.lax.broadcasted_iota(jnp.int32, (P, n_pad), 1)
    S = jnp.zeros((P, n_pad), jnp.float32)
    for k in range(K):
        S = S + jnp.where(
            ids == anchors[:, k : k + 1], weights[:, k : k + 1], 0.0
        )
    S = jnp.where(valid[:, None], S, 0.0)
    s_hi = S.astype(jnp.bfloat16)
    s_lo = (S - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return DenseSkin(s_hi=s_hi, s_lo=s_lo)


def lbs_warp_dense(
    points: jnp.ndarray,  # [P, 3]
    valid: jnp.ndarray,  # [P]
    dense: DenseSkin,
    state: WarpFieldState,
) -> jnp.ndarray:
    """Warp points via the precomputed dense skinning matrix (2 MXU
    passes over S, no gathers, no one-hot build). Matches
    ``warpfield.deform_points`` to ~1e-5 relative."""
    n_pad = dense.s_hi.shape[1]
    T = _pack_transforms(state)  # [N, 12] f32
    T = jnp.pad(T, ((0, n_pad - T.shape[0]), (0, 0)))
    T_hi = T.astype(jnp.bfloat16)
    T_lo = (T - T_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # one read of s_hi covers both hi terms: [T_hi | T_lo] in the lanes
    T2 = jnp.concatenate([T_hi, T_lo], axis=1)  # [n_pad, 24]
    hi = jnp.dot(dense.s_hi, T2, preferred_element_type=jnp.float32)
    lo = jnp.dot(dense.s_lo, T_hi, preferred_element_type=jnp.float32)
    blended = hi[:, :12] + hi[:, 12:] + lo  # [P, 12]
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    ox = blended[:, 0] * x + blended[:, 1] * y + blended[:, 2] * z + blended[:, 9]
    oy = blended[:, 3] * x + blended[:, 4] * y + blended[:, 5] * z + blended[:, 10]
    oz = blended[:, 6] * x + blended[:, 7] * y + blended[:, 8] * z + blended[:, 11]
    warped = jnp.stack([ox, oy, oz], axis=-1)
    return jnp.where(valid[:, None], warped, points)


def lbs_warp_lax(
    points, anchors, weights, valid, state: WarpFieldState
) -> jnp.ndarray:
    """XLA twin (gather + einsum) — the equivalence oracle."""
    from occlusionfusion_tpu.fusion.warpfield import SkinTable, deform_points

    return deform_points(
        state, points, SkinTable(anchors, weights, valid)
    )
