#!/usr/bin/env python
"""Fresh-process solver cost measurement.

The axon relay's per-dispatch overhead grows within a process (measured:
the same jitted LBS kernel goes 0.04 ms -> 29.5 ms between the first and
second benchmark blocks of a run), so each solver/cap measurement must be
the FIRST timed thing in its own process:

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
        fn = lambda p: solve_dense(p, cfg).translations
    else:
        cfg = GNConfig(iters=ITERS, cg_iters=16, w_point=1.0, w_arap=2.0,
                       w_motion=1.0, precondition=True)
        fn = lambda p: solve(p, cfg).translations

    out = fn(prob)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(prob)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"[profile] {SOLVER} cap={CAP} iters={ITERS}: {dt*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
