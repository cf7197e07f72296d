#!/usr/bin/env python
"""Per-variant TPU profile of solve_dense at the reference envelope
shapes (P=8192 pts, N=256 nodes, K=4 anchors, 8 edges) — decomposes the
5.7 ms/GN-iter cost (round-4 base probe) into assembly vs linear-solve
and ranks the solver knobs. Slope+readback: per-iteration cost is the
slope between iters=1 and iters=5 of the SAME variant; the chain edge
is target_points += s*0.

Run ONE at a time on TPU:
  nohup python scripts/profile_gn_envelope.py > logs/profile_gn.log 2>&1 &
"""
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
from occlusionfusion_tpu.solvers.gauss_newton_dense import (
    build_pair_scatter_plan,
    solve_dense,
)

P_PTS = int(os.environ.get("PROF_P", "8192"))
N_CAP = int(os.environ.get("PROF_N", "256"))
K1 = int(os.environ.get("PROF_K1", "3"))
K2 = int(os.environ.get("PROF_K2", "9"))


def note(m):
    print(f"[gn] {m}", flush=True)


note(f"devices: {jax.devices()}  P={P_PTS} N={N_CAP}")
r = np.random.RandomState(2)
pts = r.randn(P_PTS, 3).astype(np.float32)
pts /= np.linalg.norm(pts, axis=1, keepdims=True)
pts *= 0.25
nodes = pts[r.choice(P_PTS, N_CAP, replace=False)]
anchors, weights, valid = skinning_weights(
    jnp.asarray(pts), jnp.asarray(nodes), None, 0.08, k=4
)
d2, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=9)
ew = jnp.exp(-d2[:, 1:] / (2 * 0.08**2))
ew = ew / jnp.sum(ew, axis=1, keepdims=True)
target = jnp.asarray(pts) + jnp.asarray([0.01, -0.005, 0.02])
problem = GNProblem(
    source_points=jnp.asarray(pts),
    point_anchors=anchors,
    point_weights=weights,
    target_points=target,
    point_valid=valid.astype(jnp.float32),
    nodes=jnp.asarray(nodes),
    node_valid=jnp.ones(N_CAP, bool),
    edges=idx[:, 1:],
    edge_weights=ew,
    motion_targets=jnp.zeros((N_CAP, 3)),
    motion_confidence=jnp.zeros(N_CAP),
    solve_node_mask=jnp.ones(N_CAP, bool),
)
plan = jax.jit(functools.partial(build_pair_scatter_plan, n=N_CAP))(
    anchors, idx[:, 1:]
)
plan = jax.tree.map(lambda x: jnp.asarray(x), plan)


def time_variant(name, cfg, use_plan=True):
    pl = plan if use_plan else None

    def make(iters):
        c = cfg._replace(iters=iters)

        @jax.jit
        def step(s):
            p = problem._replace(target_points=target + s * 0.0)
            res = solve_dense(p, c, scatter_plan=pl)
            return res.translations.ravel()[0]

        return step

    lo, hi = make(1), make(5)
    out = {}
    for nm, fn in (("i1", lo), ("i5", hi)):
        float(fn(jnp.float32(0.0)))  # compile

        def run(k):
            t0 = time.perf_counter()
            s = jnp.float32(0.0)
            for _ in range(k):
                s = fn(s * 0.0)
            float(s)
            return time.perf_counter() - t0

        t1 = min(run(K1) for _ in range(3))
        t2 = min(run(K2) for _ in range(3))
        out[nm] = (t2 - t1) / (K2 - K1)
    per_iter = (out["i5"] - out["i1"]) / 4
    note(
        f"{name:34s} i1 {out['i1']*1e3:7.2f} ms  i5 {out['i5']*1e3:7.2f} ms"
        f"  -> {per_iter*1e3:6.2f} ms/iter"
    )


BASE = GNConfig(w_point=1.0, w_arap=2.0, linear_solver="cholesky",
                assembly="auto", normal_matrix_precision="highest")
time_variant("prod(pallas+chol+plan)", BASE)
time_variant("noplan(pallas+chol)", BASE, use_plan=False)
time_variant("xla_blocks+chol", BASE._replace(assembly="blocks"))
time_variant("pallas_full+chol", BASE._replace(assembly="blocks_pallas_full"))
time_variant("pallas+cg24", BASE._replace(linear_solver="cg"))
time_variant("pallas+cg12", BASE._replace(linear_solver="cg",
                                          dense_cg_iters=12))
time_variant("pallas+schur", BASE._replace(linear_solver="schur"))
time_variant("pallas+ns", BASE._replace(linear_solver="ns"))
note("done")
