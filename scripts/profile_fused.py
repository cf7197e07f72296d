#!/usr/bin/env python
"""Per-phase TPU profile of the fused fusion step.

Times each phase of fused_register_frame (deform+integrate,
correspondence+motion-obs, solver variants, full step) as separate jitted
programs with block_until_ready, at several node caps, on the bench
scenario (64^3 volume, 4k points, synthetic deforming sphere).

Run on TPU in the background (remote compiles are minutes each):
  nohup python scripts/profile_fused.py > /tmp/profile_fused.log 2>&1 &

No device->host readbacks in the timed path (CLAUDE.md: first d2h fetch
per process can cost minutes through the relay).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

if os.environ.get("PROF_CPU") == "1":  # shape/shakeout runs off-TPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from test_fusion_e2e import make_sequence

from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.fusion.correspondence import (
    node_motion_observations,
    projective_correspondences,
)
from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
from occlusionfusion_tpu.graph.edgraph import GraphConfig
from occlusionfusion_tpu.solvers.nicp import NICPConfig
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem, solve
from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

REPS = int(os.environ.get("PROF_REPS", "20"))


def note(msg):
    print(f"[profile] {msg}", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    note(f"{name:40s} {dt * 1e3:8.2f} ms")
    return dt


@functools.partial(jax.jit, static_argnames=("config",))
def integrate_phase(config, state, tables, depth, color, intr):
    warp = W.WarpFieldState(
        node_positions=tables.nodes,
        node_valid=tables.node_valid,
        rotations=state.rotations,
        translations=state.translations,
    )
    vox_table = W.SkinTable(
        tables.vox_anchors, tables.vox_weights, tables.vox_valid
    )
    warped_vox = W.deform_points(warp, tables.vox_points, vox_table)
    return T.integrate(
        config.tsdf, state.tsdf, warped_vox, tables.vox_valid, depth, color, intr
    ).tsdf


@functools.partial(jax.jit, static_argnames=("config",))
def correspond_phase(config, state, tables, depth, intr):
    warp = W.WarpFieldState(
        node_positions=tables.nodes,
        node_valid=tables.node_valid,
        rotations=state.rotations,
        translations=state.translations,
    )
    point_table = W.SkinTable(
        tables.point_anchors, tables.point_weights, tables.point_valid
    )
    deformed_pts = W.deform_points(warp, tables.model_points, point_table)
    deformed_nodes = warp.deformed_nodes
    targets, corr_valid = projective_correspondences(
        deformed_pts,
        tables.model_valid & tables.point_valid,
        depth,
        intr,
        max_depth_diff=config.max_depth_diff,
    )
    node_visible, _ = T.check_visibility(
        deformed_nodes, depth, intr, config.tsdf.trunc_margin
    )
    node_visible = node_visible & tables.node_valid
    node_motion, node_observed = node_motion_observations(
        deformed_pts, targets, corr_valid,
        tables.point_anchors, tables.point_weights,
        deformed_nodes, node_visible,
    )
    return targets, corr_valid, node_motion, node_observed


def build_gn_problem(tables, targets, corr_valid, motion_targets, motion_conf):
    return GNProblem(
        source_points=tables.model_points,
        point_anchors=tables.point_anchors,
        point_weights=tables.point_weights,
        target_points=targets,
        point_valid=corr_valid.astype(jnp.float32),
        nodes=tables.nodes,
        node_valid=tables.node_valid,
        edges=tables.edges,
        edge_weights=tables.edge_weights,
        motion_targets=motion_targets,
        motion_confidence=motion_conf,
        solve_node_mask=tables.node_valid,
    )


def run_cap(cap):
    note(f"===== node cap {cap} =====")
    cfg = FusionConfig(
        vol_dim=(64, 64, 64), voxel_size=0.008, node_coverage=0.03,
        max_nodes=cap, max_points=4096, max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=0.03, min_neighbors=2),
        nicp=NICPConfig(iters=100, w_motion=0.0, lr=0.02),
        use_motion_model=False, solver="gn_dense",
    )
    seq, _ = make_sequence(n_frames=4)
    fusion = DynamicFusion(seq, cfg)
    fusion.initialize(seq.load(0))
    sc, state, tables = fusion.build_fused()
    frame = seq.load(1)
    depth = jnp.asarray(frame.depth)
    color = jnp.asarray(frame.color)
    intr = seq.intrinsics

    results = {}
    results["integrate"] = timeit(
        "deform vox + integrate",
        lambda d, c: integrate_phase(sc, state, tables, d, c, intr),
        depth, color,
    )
    targets, corr_valid, node_motion, node_observed = correspond_phase(
        sc, state, tables, depth, intr
    )
    results["correspond"] = timeit(
        "deform pts + correspond + node obs",
        lambda d: correspond_phase(sc, state, tables, d, intr),
        depth,
    )
    motion_targets = tables.nodes + node_motion
    motion_conf = node_observed.astype(jnp.float32)
    prob = build_gn_problem(
        tables, targets, corr_valid, motion_targets, motion_conf
    )
    gn_dense_cfg = GNConfig(iters=6, w_point=1.0, w_arap=2.0, w_motion=1.0)
    results["solve_dense6"] = timeit(
        "solve_dense (6 iters)",
        lambda p: solve_dense(p, gn_dense_cfg).translations,
        prob,
    )
    gn_dense4 = GNConfig(iters=4, w_point=1.0, w_arap=2.0, w_motion=1.0)
    results["solve_dense4"] = timeit(
        "solve_dense (4 iters)",
        lambda p: solve_dense(p, gn_dense4).translations,
        prob,
    )
    cg_cfg = GNConfig(
        iters=4, cg_iters=16, w_point=1.0, w_arap=2.0, w_motion=1.0,
        precondition=True,
    )
    results["solve_cg_pre_4x16"] = timeit(
        "solve matrix-free PCG (4 GN x 16 CG)",
        lambda p: solve(p, cg_cfg).translations,
        prob,
    )

    # full step last: it DONATES the state buffers, so thread the state
    st = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    st, info = fusion.register_frame_fused(sc, st, tables, frame)  # compile
    jax.block_until_ready(info)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, info = fusion.register_frame_fused(sc, st, tables, frame)
    jax.block_until_ready(st.tsdf.tsdf)
    dt = (time.perf_counter() - t0) / REPS
    note(f"{'full step (gn_dense)':40s} {dt * 1e3:8.2f} ms")
    results["full_step_gn_dense"] = dt
    return results


def main():
    note(f"devices: {jax.devices()}")
    all_results = {}
    for cap in (128, 512):
        all_results[cap] = run_cap(cap)
    note("===== summary (ms) =====")
    for cap, res in all_results.items():
        for k, v in res.items():
            note(f"cap={cap:4d} {k:24s} {v * 1e3:8.2f}")


if __name__ == "__main__":
    main()
