#!/usr/bin/env python
"""Fresh-process solver cost measurement (slope + readback).

Two relay gotchas (CLAUDE.md): block_until_ready tracks enqueue, not
execution — timing must force a scalar readback; and per-dispatch
overhead grows within a process — measure each solver/cap FIRST in its
own process. The reported number is the slope between two chain
lengths, which cancels dispatch pipelining and d2h fetch latency.

  PROF_SOLVER=gn_dense PROF_CAP=512 PROF_ITERS=6 python scripts/profile_solver.py
  PROF_SOLVER=pcg PROF_CAP=512 python scripts/profile_solver.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROF_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem, solve
from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

CAP = int(os.environ.get("PROF_CAP", "512"))
ITERS = int(os.environ.get("PROF_ITERS", "6"))
SOLVER = os.environ.get("PROF_SOLVER", "gn_dense")
REPS = int(os.environ.get("PROF_REPS", "30"))
P = int(os.environ.get("PROF_POINTS", "4096"))


def main():
    print(f"[profile] devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)
    nodes = rng.rand(CAP, 3).astype(np.float32) * 0.5
    pts = rng.rand(P, 3).astype(np.float32) * 0.5
    anchors = rng.randint(0, CAP, (P, 4)).astype(np.int32)
    weights = np.full((P, 4), 0.25, np.float32)
    edges = rng.randint(0, CAP, (CAP, 8)).astype(np.int32)
    prob = GNProblem(
        source_points=jnp.asarray(pts),
        point_anchors=jnp.asarray(anchors),
        point_weights=jnp.asarray(weights),
        target_points=jnp.asarray(pts + 0.005),
        point_valid=jnp.ones(P, jnp.float32),
        nodes=jnp.asarray(nodes),
        node_valid=jnp.ones(CAP, bool),
        edges=jnp.asarray(edges),
        edge_weights=jnp.full((CAP, 8), 0.1, jnp.float32),
        motion_targets=jnp.asarray(nodes),
        motion_confidence=jnp.ones(CAP, jnp.float32),
        solve_node_mask=jnp.ones(CAP, bool),
    )
    if SOLVER == "gn_dense":
        cfg = GNConfig(iters=ITERS, w_point=1.0, w_arap=2.0, w_motion=1.0)
        fn = lambda p: solve_dense(p, cfg)
    elif SOLVER == "gn_dense_cg":
        cfg = GNConfig(iters=ITERS, w_point=1.0, w_arap=2.0, w_motion=1.0,
                       linear_solver="cg")
        fn = lambda p: solve_dense(p, cfg)
    elif SOLVER == "gn_dense_schur":
        cfg = GNConfig(iters=ITERS, w_point=1.0, w_arap=2.0, w_motion=1.0,
                       linear_solver="schur",
                       schur_leaf=int(os.environ.get("PROF_LEAF", "96")))
        fn = lambda p: solve_dense(p, cfg)
    else:
        cfg = GNConfig(iters=ITERS, cg_iters=16, w_point=1.0, w_arap=2.0,
                       w_motion=1.0, precondition=True)
        fn = lambda p: solve(p, cfg)

    out = fn(prob)
    float(out.translations[0, 0])  # compile + first-fetch penalty

    def chain(k):
        # chain the solves (each input depends on the previous output) so
        # the executions cannot be elided or reordered by the relay
        p = prob
        t0 = time.perf_counter()
        r = out
        for _ in range(k):
            p = p._replace(
                motion_targets=p.motion_targets + r.translations * 0.0
            )
            r = fn(p)
        float(r.translations[0, 0])
        return time.perf_counter() - t0

    k1, k2 = max(REPS // 4, 1), REPS
    t1 = min(chain(k1) for _ in range(3))
    t2 = min(chain(k2) for _ in range(3))
    dt = (t2 - t1) / (k2 - k1)
    print(f"[profile] {SOLVER} cap={CAP} iters={ITERS}: {dt*1e3:.3f} ms "
          f"(slope over {k1}->{k2} chained solves, min of 3)", flush=True)


if __name__ == "__main__":
    main()
