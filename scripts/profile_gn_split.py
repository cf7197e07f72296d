#!/usr/bin/env python
"""Split the 4.2 ms/GN-iter: assembly-only vs cho_factor-only vs the
Pallas point kernel alone, at envelope shapes (P=8192, N=256)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import jax
if os.environ.get("PROF_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from occlusionfusion_tpu.geometry.skinning import skinning_weights
from occlusionfusion_tpu.ops.knn import knn_lax
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem
from occlusionfusion_tpu.solvers import gauss_newton_dense as GD

P_PTS = int(os.environ.get("PROF_P", "8192"))
N_CAP = int(os.environ.get("PROF_N", "256"))
def note(m): print(f"[gnsplit] {m}", flush=True)
note(f"devices: {jax.devices()}")
r = np.random.RandomState(2)
pts = r.randn(P_PTS, 3).astype(np.float32)
pts /= np.linalg.norm(pts, axis=1, keepdims=True); pts *= 0.25
nodes = pts[r.choice(P_PTS, N_CAP, replace=False)]
anchors, weights, valid = skinning_weights(jnp.asarray(pts), jnp.asarray(nodes), None, 0.08, k=4)
d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=9)
ew = jnp.exp(-d2[:, 1:] / (2 * 0.08**2)); ew = ew / jnp.sum(ew, 1, keepdims=True)
target = jnp.asarray(pts) + jnp.asarray([0.01, -0.005, 0.02])
problem = GNProblem(
    source_points=jnp.asarray(pts), point_anchors=anchors,
    point_weights=weights, target_points=target,
    point_valid=valid.astype(jnp.float32), nodes=jnp.asarray(nodes),
    node_valid=jnp.ones(N_CAP, bool), edges=idx[:, 1:], edge_weights=ew,
    motion_targets=jnp.zeros((N_CAP, 3)), motion_confidence=jnp.zeros(N_CAP),
    solve_node_mask=jnp.ones(N_CAP, bool),
)
plan = jax.jit(functools.partial(GD.build_pair_scatter_plan, n=N_CAP))(anchors, idx[:, 1:])
cfg = GNConfig(w_point=1.0, w_arap=2.0, assembly="auto",
               normal_matrix_precision="highest")
R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (N_CAP, 3, 3))
t0v = jnp.zeros((N_CAP, 3), jnp.float32)

def chain_time(name, fn):
    float(fn(jnp.float32(0.0)))
    def run(k):
        t0 = time.perf_counter(); s = jnp.float32(0.0)
        for _ in range(k): s = fn(s * 0.0)
        float(s); return time.perf_counter() - t0
    t1 = min(run(3) for _ in range(3)); t2 = min(run(9) for _ in range(3))
    note(f"{name:30s} {(t2-t1)/6*1e3:7.2f} ms")

@jax.jit
def asm_step(s):
    M, b, sq = GD._assemble_blocks(
        problem._replace(target_points=target + s * 0.0), cfg, R0, t0v,
        plan=jax.tree.map(jnp.asarray, plan))
    return M.ravel()[0] + b[0]
chain_time("assemble_blocks(plan)", asm_step)

@jax.jit
def pallas_step(s):
    import math
    from occlusionfusion_tpu.ops.gn_assembly import point_term_blocks_pallas
    blk16, b_pt, rsq = point_term_blocks_pallas(
        problem.source_points, target + s * 0.0, problem.point_valid,
        problem.point_anchors, problem.point_weights, problem.nodes,
        R0, t0v, sw=1.0)
    return blk16.ravel()[0] + b_pt.ravel()[0] + jnp.sum(rsq) * 0.0
chain_time("pallas_point_kernel", pallas_step)

M0, b0, _ = jax.jit(lambda: GD._assemble_blocks(problem, cfg, R0, t0v, plan=jax.tree.map(jnp.asarray, plan)))()
M0 = M0 + jnp.eye(6 * N_CAP) * 1e-4
@jax.jit
def chol_step(s):
    chol, low = jax.scipy.linalg.cho_factor(M0 + s * 0.0)
    x = jax.scipy.linalg.cho_solve((chol, low), -b0)
    return x[0]
chain_time("cho_factor+solve({})".format(6 * N_CAP) + "", chol_step)

@jax.jit
def scatteronly_step(s):
    rows = jnp.broadcast_to((jnp.float32(1.0) + s)[None, None],
                            (P_PTS * 16 + N_CAP * 8 * 3, 36))
    c = jax.ops.segment_sum(rows, jax.tree.map(jnp.asarray, plan).compact_ids,
                            num_segments=plan.slot_segs.shape[0])
    out = jnp.zeros((N_CAP * N_CAP, 36)).at[jax.tree.map(jnp.asarray, plan).slot_segs].set(c, mode="drop")
    return out.ravel()[0]
chain_time("segment_sum+slot_scatter", scatteronly_step)
note("done")
