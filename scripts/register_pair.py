#!/usr/bin/env python
"""Standalone non-rigid registration of a single source/target pair.

Equivalent of the reference's single-pair N-ICP CLI
(``NonRigidICP/main.py`` + ``registration.py`` + config.yaml): build an
embedded-deformation graph over the source, optionally match landmarks
with the Lepard-style matcher, solve ARAP + landmark (+ chamfer), and
write the warped source.

Inputs are .ply point clouds/meshes (utils/viz.py reader) or .npz with
``points`` arrays.

Example:
  python scripts/register_pair.py --source s.ply --target t.ply \
      --out warped.ply --solver gn_dense
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse

import numpy as np


def load_points(path: str):
    if path.endswith(".npz"):
        data = np.load(path)
        return data["points"].astype(np.float32), None
    from occlusionfusion_tpu.utils.viz import load_ply

    verts, faces = load_ply(path)
    return verts, faces


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--out", default="warped.ply")
    ap.add_argument("--node_coverage", type=float, default=0.05)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=0.06)          # config.yaml
    ap.add_argument("--w_arap", type=float, default=10.0)      # config.yaml
    ap.add_argument("--w_ldmk", type=float, default=1.0)
    ap.add_argument("--w_chamfer", type=float, default=0.0)
    ap.add_argument("--solver", choices=["nicp", "gn_dense"], default="nicp")
    ap.add_argument("--max_nodes", type=int, default=1024)
    ap.add_argument("--lepard_weights", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from occlusionfusion_tpu.geometry.skinning import skinning_weights
    from occlusionfusion_tpu.graph import native
    from occlusionfusion_tpu.ops.knn import knn_lax
    from occlusionfusion_tpu.solvers.nicp import NICPConfig, NICPProblem, solve
    from occlusionfusion_tpu.utils.viz import save_ply

    src, src_faces = load_points(args.source)
    tgt, _ = load_points(args.target)
    print(f"source {src.shape}, target {tgt.shape}")

    # nodes: greedy coverage sampling over the source
    node_ids = native.sample_nodes(
        src, None, args.node_coverage, max_nodes=args.max_nodes
    )
    nodes = src[node_ids]
    n = len(nodes)
    print(f"{n} graph nodes")

    anchors, weights, valid = skinning_weights(
        jnp.asarray(src), jnp.asarray(nodes), None, args.node_coverage, k=4
    )
    if src_faces is not None and len(src_faces):
        edges, dists = native.geodesic_edges(src, src_faces, node_ids, k=8)
        w = np.exp(-np.square(dists) / (2 * args.node_coverage**2))
        w[edges < 0] = 0
        s = w.sum(1, keepdims=True)
        ew = np.where(s > 0, w / np.maximum(s, 1e-12), 0).astype(np.float32)
        edges_j, ew_j = jnp.asarray(edges), jnp.asarray(ew)
    else:
        d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=9)
        edges_j = idx[:, 1:]
        w = jnp.exp(-d2[:, 1:] / (2 * args.node_coverage**2))
        ew_j = w / jnp.sum(w, axis=1, keepdims=True)

    # landmarks: Lepard matches when weights given, else nearest neighbors
    if args.lepard_weights:
        from occlusionfusion_tpu.models.lepard import (
            LepardConfig,
            lepard_match,
        )
        from occlusionfusion_tpu.utils.snapshot import load_params

        cfg_l = LepardConfig()
        params = load_params(args.lepard_weights)
        cap = 8192
        sp = np.zeros((cap, 3), np.float32)
        sp[: min(len(src), cap)] = src[:cap]
        tp = np.zeros((cap, 3), np.float32)
        tp[: min(len(tgt), cap)] = tgt[:cap]
        sm = np.arange(cap) < len(src)
        tm = np.arange(cap) < len(tgt)
        m = lepard_match(
            params, cfg_l, jnp.asarray(sp), jnp.asarray(sm),
            jnp.asarray(tp), jnp.asarray(tm),
        )
        # nearest source vertex for each matched coarse point
        _, src_vert = knn_lax(m.src_points, jnp.asarray(src), k=1)
        targets = m.tgt_points[m.match_tgt]
        ldmk_src = src_vert[:, 0]
        ldmk_tgt = jnp.arange(targets.shape[0])
        ldmk_valid = m.match_valid
        target_points = targets
    else:
        d2, idx = knn_lax(jnp.asarray(src), jnp.asarray(tgt), k=1)
        ldmk_src = jnp.arange(src.shape[0])
        ldmk_tgt = idx[:, 0]
        ldmk_valid = d2[:, 0] < (4 * args.node_coverage) ** 2
        target_points = jnp.asarray(tgt)

    problem = NICPProblem(
        source_points=jnp.asarray(src),
        point_anchors=anchors,
        point_weights=weights,
        point_valid=valid,
        nodes=jnp.asarray(nodes),
        node_valid=jnp.ones(n, bool),
        edges=edges_j,
        edge_weights=ew_j,
        target_points=target_points,
        landmark_src=ldmk_src,
        landmark_tgt=ldmk_tgt,
        landmark_valid=ldmk_valid,
        motion_targets=jnp.zeros((n, 3)),
        motion_confidence=jnp.zeros(n),
    )
    cfg = NICPConfig(
        iters=args.iters, lr=args.lr, w_arap=args.w_arap,
        w_ldmk=args.w_ldmk, w_chamfer=args.w_chamfer, w_motion=0.0,
    )
    if args.solver == "gn_dense":
        from occlusionfusion_tpu.solvers.gauss_newton import (
            GNConfig,
            GNProblem,
        )
        from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

        gn_problem = GNProblem(
            source_points=problem.source_points,
            point_anchors=problem.point_anchors,
            point_weights=problem.point_weights,
            target_points=problem.target_points[problem.landmark_tgt],
            point_valid=problem.landmark_valid.astype(jnp.float32),
            nodes=problem.nodes,
            node_valid=problem.node_valid,
            edges=problem.edges,
            edge_weights=problem.edge_weights,
            motion_targets=problem.motion_targets,
            motion_confidence=problem.motion_confidence,
            solve_node_mask=problem.node_valid,
        )
        res = solve_dense(
            gn_problem, GNConfig(iters=8, w_arap=args.w_arap)
        )
        warped = res.warped_points
        final = float(res.residual_history[-1])
    else:
        res = solve(problem, cfg)
        warped = res.warped_points
        final = float(res.final_loss)

    print(f"final loss {final:.6f}")
    save_ply(args.out, np.asarray(warped), src_faces)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
