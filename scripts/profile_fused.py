#!/usr/bin/env python
"""Per-phase TPU profile of the fused fusion step (honest timing).

Times each phase of fused_register_frame (deform+integrate,
correspondence+motion-obs, solver variants, full step) as separate jitted
programs, at several node caps, on the bench scenario (64^3 volume, 4k
points, synthetic deforming sphere).

Timing methodology (CLAUDE.md): through the axon relay
block_until_ready tracks ENQUEUE, not execution — every measurement
chains k executions (each run's input depends on the previous run's
output via a `* 0.0` data edge XLA cannot fold away: 0*inf=nan) and
forces ONE scalar readback at the end; the reported number is the slope
between two chain lengths, cancelling dispatch pipelining and d2h fetch
latency.

Run on TPU in the background (remote compiles are minutes each), ONE
TPU process at a time:
  nohup python scripts/profile_fused.py > /tmp/profile_fused.log 2>&1 &
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

K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))
CAPS = tuple(
    int(c) for c in os.environ.get("PROF_CAPS", "128,512").split(",")
)


def note(msg):
    print(f"[profile] {msg}", flush=True)


def chain_time(name, step):
    """step: scalar -> scalar, one phase execution with a data edge from
    the input scalar and to the output scalar. Returns slope seconds."""
    s = step(jnp.float32(0.0))
    float(s)  # compile + first-fetch penalty

    def run(k):
        t0 = time.perf_counter()
        ss = jnp.float32(0.0)
        for _ in range(k):
            ss = step(ss)
        float(ss)
        return time.perf_counter() - t0

    t1 = min(run(K1) for _ in range(3))
    t2 = min(run(K2) for _ in range(3))
    dt = (t2 - t1) / (K2 - K1)
    note(f"{name:40s} {dt * 1e3:8.2f} ms (slope {K1}->{K2}, min of 3)")
    return dt


@functools.partial(jax.jit, static_argnames=("config",))
def integrate_phase(config, state, tables, depth, color, intr, s):
    warp = W.WarpFieldState(
        node_positions=tables.nodes,
        node_valid=tables.node_valid,
        rotations=state.rotations,
        translations=state.translations + s * 0.0,
    )
    vox_table = W.SkinTable(
        tables.vox_anchors, tables.vox_weights, tables.vox_valid
    )
    warped_vox = W.deform_points(warp, tables.vox_points, vox_table)
    out = T.integrate(
        config.tsdf, state.tsdf, warped_vox, tables.vox_valid, depth, color, intr
    ).tsdf
    return out.ravel()[0]


@functools.partial(jax.jit, static_argnames=("config",))
def correspond_phase(config, state, tables, depth, intr, s=None):
    warp = W.WarpFieldState(
        node_positions=tables.nodes,
        node_valid=tables.node_valid,
        rotations=state.rotations,
        translations=(
            state.translations if s is None else state.translations + s * 0.0
        ),
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
    results["integrate"] = chain_time(
        "deform vox + integrate",
        lambda s: integrate_phase(sc, state, tables, depth, color, intr, s),
    )
    results["correspond"] = chain_time(
        "deform pts + correspond + node obs",
        lambda s: correspond_phase(sc, state, tables, depth, intr, s)[0]
        .ravel()[0],
    )
    targets, corr_valid, node_motion, node_observed = correspond_phase(
        sc, state, tables, depth, intr
    )
    motion_targets = tables.nodes + node_motion
    motion_conf = node_observed.astype(jnp.float32)
    prob = build_gn_problem(
        tables, targets, corr_valid, motion_targets, motion_conf
    )

    def solver_step(cfg_s):
        def step(s):
            p = prob._replace(motion_targets=prob.motion_targets + s * 0.0)
            return solve_dense(p, cfg_s).translations.ravel()[0]

        return step

    for name, cfg_s in (
        ("solve_dense6_chol", GNConfig(iters=6, w_point=1.0, w_arap=2.0,
                                       w_motion=1.0)),
        ("solve_dense4_chol", GNConfig(iters=4, w_point=1.0, w_arap=2.0,
                                       w_motion=1.0)),
        ("solve_dense4_schur", GNConfig(iters=4, w_point=1.0, w_arap=2.0,
                                        w_motion=1.0,
                                        linear_solver="schur")),
        ("solve_dense4_bf16A", GNConfig(iters=4, w_point=1.0, w_arap=2.0,
                                        w_motion=1.0,
                                        normal_matrix_precision="default")),
        ("solve_dense4_ns", GNConfig(iters=4, w_point=1.0, w_arap=2.0,
                                     w_motion=1.0, linear_solver="ns")),
        ("solve_dense4_ns_bf16A", GNConfig(iters=4, w_point=1.0, w_arap=2.0,
                                           w_motion=1.0, linear_solver="ns",
                                           normal_matrix_precision="default")),
        ("solve_dense4_cg12_bf16A", GNConfig(
            iters=4, w_point=1.0, w_arap=2.0, w_motion=1.0,
            linear_solver="cg", dense_cg_iters=12,
            normal_matrix_precision="default")),
        ("solve_dense4_cg24_bf16A", GNConfig(
            iters=4, w_point=1.0, w_arap=2.0, w_motion=1.0,
            linear_solver="cg", dense_cg_iters=24,
            normal_matrix_precision="default")),
        ("solve_dense4_blocks", GNConfig(
            iters=4, w_point=1.0, w_arap=2.0, w_motion=1.0,
            assembly="blocks")),
        ("solve_dense4_blocks_cg12", GNConfig(
            iters=4, w_point=1.0, w_arap=2.0, w_motion=1.0,
            assembly="blocks", linear_solver="cg", dense_cg_iters=12)),
    ):
        results[name] = chain_time(f"{name}", solver_step(cfg_s))

    def mf_step(s):
        p = prob._replace(motion_targets=prob.motion_targets + s * 0.0)
        return solve(
            p,
            GNConfig(iters=4, cg_iters=16, w_point=1.0, w_arap=2.0,
                     w_motion=1.0, precondition=True),
        ).translations.ravel()[0]

    results["solve_cg_pre_4x16"] = chain_time(
        "solve matrix-free PCG (4 GN x 16 CG)", mf_step
    )

    # full step: thread the (donated) state through the chain
    def full_run(k):
        st = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
        t0 = time.perf_counter()
        info = None
        for _ in range(k):
            st, info = fusion.register_frame_fused(sc, st, tables, frame)
        float(info[0])
        return time.perf_counter() - t0

    full_run(1)  # compile + fetch
    t1 = min(full_run(K1) for _ in range(3))
    t2 = min(full_run(K2) for _ in range(3))
    dt = (t2 - t1) / (K2 - K1)
    note(f"{'full step (gn_dense 6 chol)':40s} {dt * 1e3:8.2f} ms")
    results["full_step_gn_dense"] = dt
    return results


def main():
    note(f"devices: {jax.devices()}")
    all_results = {}
    for cap in CAPS:
        all_results[cap] = run_cap(cap)
    note("===== summary (ms) =====")
    for cap, res in all_results.items():
        for k, v in res.items():
            note(f"cap={cap:4d} {k:24s} {v * 1e3:8.2f}")


if __name__ == "__main__":
    main()
