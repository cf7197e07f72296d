"""Warp field: per-node SE(3) transforms + skinning caches, as a pytree.

TPU-native re-design of ``fusion_with_occlusion/warpfield.py``
(``WarpField``): holds the embedded-deformation graph's per-node rigid
transforms (canonical -> current frame) and the cached skinning tables for
the TSDF volume and meshes, and deforms points/normals through them.

Where the reference dispatches between three LBS implementations
(torch-ED / numba-CUDA / numba-CPU, ``warpfield.py:270-305``), this module
has exactly one: geometry.edwarp over statically-shaped padded arrays
(the Pallas fused voxel path lives in ops/tsdf integration).

Transform convention: node transforms are stored in the *pivoted* form
(y = R (x - g) + g + t), which is what the solvers estimate; the
reference's origin-relative form (``warpfield.py:422-449``,
t_origin = -R g + g + t) is available via the conversion helpers for
parity tests. Unreachable points (not all anchors within coverage,
``warpfield.py:122``) are left UNDEFORMED, matching
``warpfield.py:225-231``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.edwarp import ed_warp, ed_warp_normals
from occlusionfusion_tpu.geometry.skinning import skinning_weights

GRAPH_K = 4  # anchors per point (csrc/cpu/graph_proc.h:8)


class SkinTable(NamedTuple):
    anchors: jnp.ndarray  # [P, K] int32
    weights: jnp.ndarray  # [P, K] f32
    valid: jnp.ndarray  # [P] bool


class WarpFieldState(NamedTuple):
    node_positions: jnp.ndarray  # [N, 3] canonical
    node_valid: jnp.ndarray  # [N] bool (padding mask)
    rotations: jnp.ndarray  # [N, 3, 3] canonical -> current
    translations: jnp.ndarray  # [N, 3] pivoted translations

    @property
    def deformed_nodes(self) -> jnp.ndarray:
        """g + t (pivoted form evaluated at the node itself)."""
        return self.node_positions + self.translations


def create_warpfield(node_positions, node_valid) -> WarpFieldState:
    n = node_positions.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    return WarpFieldState(
        node_positions=jnp.asarray(node_positions, jnp.float32),
        node_valid=jnp.asarray(node_valid, bool),
        rotations=eye,
        translations=jnp.zeros((n, 3), jnp.float32),
    )


def skin(
    state: WarpFieldState, points: jnp.ndarray, node_coverage: float
) -> SkinTable:
    """Build the 4-anchor Gaussian skinning table for a point set
    (``warpfield.py:83-129`` contract: all anchors must lie within
    4*node_coverage, +1e-6 normalization)."""
    anchors, weights, valid = skinning_weights(
        points,
        state.node_positions,
        state.node_valid,
        node_coverage,
        k=GRAPH_K,
        require_all_anchors=True,
        norm_eps=1e-6,
    )
    return SkinTable(anchors=anchors, weights=weights, valid=valid)


def deform_points(
    state: WarpFieldState, points: jnp.ndarray, table: SkinTable
) -> jnp.ndarray:
    """Warp points; unreachable points pass through unchanged."""
    warped = ed_warp(
        points,
        state.node_positions,
        state.rotations,
        state.translations,
        table.anchors,
        table.weights,
    )
    return jnp.where(table.valid[:, None], warped, points)


def deform_normals(
    state: WarpFieldState, normals: jnp.ndarray, table: SkinTable
) -> jnp.ndarray:
    rotated = ed_warp_normals(
        normals, state.rotations, table.anchors, table.weights
    )
    return jnp.where(table.valid[:, None], rotated, normals)


def update_transforms(
    state: WarpFieldState, rotations: jnp.ndarray, translations: jnp.ndarray
) -> WarpFieldState:
    """Replace node transforms with a new solver estimate
    (canonical -> target), cf. ``warpfield.py:389-418``."""
    return state._replace(rotations=rotations, translations=translations)


def left_compose_rigid(
    state: WarpFieldState, R: jnp.ndarray, t: jnp.ndarray
) -> WarpFieldState:
    """Apply a global rigid (R, t) after the warp (pose-graph
    re-anchoring). Pivoted form y = R_n(x - g) + g + t_n composes to
    R_n' = R R_n, t_n' = R (g + t_n) + t - g."""
    g = state.node_positions
    new_R = jnp.einsum("ij,njk->nik", R, state.rotations, precision="highest")
    new_t = (g + state.translations) @ R.T + t - g
    return state._replace(rotations=new_R, translations=new_t)


def to_origin_form(state: WarpFieldState):
    """Pivoted (R, t) -> origin-relative t' = -R g + g + t
    (``warpfield.py:438-449``)."""
    g = state.node_positions
    Rg = jnp.einsum("nij,nj->ni", state.rotations, g, precision="highest")
    return state.rotations, state.translations + g - Rg


def from_origin_form(node_positions, rotations, translations_origin):
    """Origin-relative -> pivoted t = t' - g + R g
    (``warpfield.py:422-436``)."""
    Rg = jnp.einsum("nij,nj->ni", rotations, node_positions, precision="highest")
    return rotations, translations_origin - node_positions + Rg
