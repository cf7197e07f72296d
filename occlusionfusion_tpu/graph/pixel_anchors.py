"""Pixel anchors: per-pixel skinning tables for image-space solvers.

Mirrors the reference's two variants
(``csrc/cpu/graph_proc.cpp:533`` geodesic / ``:610`` euclidean): every
valid pixel of a depth frame gets up to K anchor nodes + normalized
Gaussian weights. Geodesic anchors ride the native library's per-vertex
Dijkstra through the depth mesh's vertex map; the euclidean variant is
pure JAX (geometry/skinning.py) over the point image.
"""

from __future__ import annotations

import numpy as np

from occlusionfusion_tpu.graph import native


def pixel_anchors_euclidean(
    point_image, nodes, node_valid, node_coverage: float, k: int = 4
):
    """[H, W, 3] point image -> (anchors [H, W, k] int32 (-1 invalid),
    weights [H, W, k])."""
    import jax.numpy as jnp

    from occlusionfusion_tpu.geometry.skinning import skinning_weights

    H, W, _ = point_image.shape
    pts = jnp.asarray(point_image).reshape(-1, 3)
    anchors, weights, reachable = skinning_weights(
        pts,
        jnp.asarray(nodes),
        None if node_valid is None else jnp.asarray(node_valid),
        node_coverage,
        k=k,
        require_all_anchors=True,
        norm_eps=1e-6,
    )
    depth_ok = pts[:, 2] > 0
    ok = reachable & depth_ok
    anchors = jnp.where(ok[:, None], anchors, -1)
    weights = jnp.where(ok[:, None], weights, 0.0)
    return (
        np.asarray(anchors).reshape(H, W, k),
        np.asarray(weights).reshape(H, W, k),
    )


def pixel_anchors_geodesic(
    point_image: np.ndarray,
    max_triangle_edge: float,
    node_vertex_ids: np.ndarray,
    node_coverage: float,
    k: int = 4,
    influence_sigmas: float = 4.0,
):
    """Geodesic pixel anchors through the depth mesh: triangulate the
    point image, run per-vertex geodesic anchor search, map back through
    the pixel->vertex table. Returns (anchors [H, W, k], weights
    [H, W, k], mesh (verts, faces, vertex_map))."""
    H, W, _ = point_image.shape
    verts, faces, vmap = native.mesh_from_depth(point_image, max_triangle_edge)
    anchors_v, dists_v = native.geodesic_anchors(
        verts, faces, node_vertex_ids, k=k,
        max_influence=influence_sigmas * node_coverage,
    )
    w_v = np.exp(-np.square(dists_v) / (2.0 * node_coverage**2))
    w_v[anchors_v < 0] = 0.0
    s = w_v.sum(-1, keepdims=True)
    w_v = np.where(s > 0, w_v / (s + 1e-6), 0.0)

    anchors = -np.ones((H * W, k), np.int32)
    weights = np.zeros((H * W, k), np.float32)
    flat_map = vmap.reshape(-1)
    has_vertex = flat_map >= 0
    anchors[has_vertex] = anchors_v[flat_map[has_vertex]]
    weights[has_vertex] = w_v[flat_map[has_vertex]]
    return (
        anchors.reshape(H, W, k),
        weights.reshape(H, W, k),
        (verts, faces, vmap),
    )
