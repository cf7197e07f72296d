"""Deformation-graph growth: extend the graph onto newly observed surface.

Re-design of the reference's graph-update machinery
(``warpfield.py:487-583`` unreachable-vertex detection + growth,
``embedded_deformation_graph.py:496-609`` incremental node insertion,
``run_model.py:448-627`` ARAP propagation initializing the new nodes).
The reference ships this disabled in the fusion loop (``fusion.py:185``);
here it is functional and flag-gated.

Static-shape contract: the node arrays are pre-padded to MAX_NODES, so
growth never re-jits — new nodes flip padding slots to valid, and the
ARAP re-initialization reuses the Gauss-Newton solver's frozen-node mask
(old nodes fixed, new nodes solved with ARAP + zero-weight data term).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.graph import native
from occlusionfusion_tpu.ops.knn import knn_lax
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem, solve


class GrowthResult(NamedTuple):
    warp: W.WarpFieldState
    node_count: int
    edges: jnp.ndarray
    edge_weights: jnp.ndarray
    n_new: int


def find_unreachable(points, point_valid, warp: W.WarpFieldState,
                     node_coverage: float):
    """Points farther than node_coverage from every node
    (``warpfield.py:455-470``)."""
    d2, _ = knn_lax(points, warp.node_positions, k=1, valid=warp.node_valid)
    return point_valid & (d2[:, 0] > node_coverage * node_coverage)


def grow_graph(
    warp: W.WarpFieldState,
    node_count: int,
    edges: jnp.ndarray,  # [CAP, K] -1 padded
    edge_weights: jnp.ndarray,  # [CAP, K]
    new_surface_points: np.ndarray,  # candidate vertices (host numpy)
    new_point_valid: np.ndarray,
    node_coverage: float,
    num_neighbors: int = 8,
    arap_iters: int = 4,
) -> GrowthResult:
    """Sample new nodes on unreachable surface, wire them into the graph
    (euclidean edges at growth time — the reference's update path also
    falls back to euclidean), and ARAP-initialize their transforms."""
    cap = warp.node_positions.shape[0]
    unreachable = np.asarray(
        find_unreachable(
            jnp.asarray(new_surface_points),
            jnp.asarray(new_point_valid),
            warp,
            node_coverage,
        )
    )
    if not unreachable.any():
        return GrowthResult(warp, node_count, edges, edge_weights, 0)

    candidates = new_surface_points[unreachable]
    new_ids = native.sample_nodes(
        candidates.astype(np.float32), None, node_coverage,
        max_nodes=cap - node_count,
    )
    n_new = len(new_ids)
    if n_new == 0:
        return GrowthResult(warp, node_count, edges, edge_weights, 0)
    new_nodes = candidates[new_ids]

    nodes_np = np.array(warp.node_positions)
    nodes_np[node_count : node_count + n_new] = new_nodes
    valid_np = np.array(warp.node_valid)
    valid_np[node_count : node_count + n_new] = True
    total = node_count + n_new

    # euclidean k-NN edges for the new nodes (and backlinks where the old
    # node has a free edge slot)
    edges_np = np.array(edges)
    ew_np = np.array(edge_weights)
    d2, idx = knn_lax(
        jnp.asarray(new_nodes),
        jnp.asarray(nodes_np[:total]),
        k=min(num_neighbors + 1, total),
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    sigma2 = 2.0 * node_coverage**2
    for i in range(n_new):
        row = node_count + i
        # drop self
        sel = [(j, dd) for j, dd in zip(idx[i], d2[i]) if j != row][
            :num_neighbors
        ]
        ids = np.asarray([j for j, _ in sel], np.int32)
        ws = np.exp(-np.asarray([dd for _, dd in sel]) / sigma2)
        wsum = ws.sum()
        edges_np[row, : len(ids)] = ids
        ew_np[row, : len(ids)] = (ws / max(wsum, 1e-12)).astype(np.float32)

    # warm start: copy the nearest old node's transform
    d2_old, idx_old = knn_lax(
        jnp.asarray(new_nodes), warp.node_positions, k=1, valid=warp.node_valid
    )
    nearest = np.asarray(idx_old)[:, 0]
    R_np = np.array(warp.rotations)
    t_np = np.array(warp.translations)
    R_np[node_count:total] = R_np[nearest]
    t_np[node_count:total] = t_np[nearest]

    new_warp = W.WarpFieldState(
        node_positions=jnp.asarray(nodes_np),
        node_valid=jnp.asarray(valid_np),
        rotations=jnp.asarray(R_np),
        translations=jnp.asarray(t_np),
    )
    edges_j = jnp.asarray(edges_np)
    ew_j = jnp.asarray(ew_np)

    # ARAP refinement of new nodes only (old nodes frozen) — the
    # run_model.run_arap equivalent with the data term off
    solve_mask = np.zeros(cap, bool)
    solve_mask[node_count:total] = True
    dummy_pts = jnp.zeros((8, 3))
    problem = GNProblem(
        source_points=dummy_pts,
        point_anchors=jnp.zeros((8, 4), jnp.int32),
        point_weights=jnp.zeros((8, 4)),
        target_points=dummy_pts,
        point_valid=jnp.zeros(8),
        nodes=new_warp.node_positions,
        node_valid=new_warp.node_valid,
        edges=edges_j,
        edge_weights=ew_j,
        motion_targets=jnp.zeros((cap, 3)),
        motion_confidence=jnp.zeros(cap),
        solve_node_mask=jnp.asarray(solve_mask),
    )
    res = solve(
        problem,
        GNConfig(iters=arap_iters, cg_iters=24, w_point=0.0, w_arap=1.0),
        init_rotations=new_warp.rotations,
        init_translations=new_warp.translations,
    )
    new_warp = new_warp._replace(
        rotations=res.rotations, translations=res.translations
    )
    return GrowthResult(new_warp, total, edges_j, ew_j, n_new)
