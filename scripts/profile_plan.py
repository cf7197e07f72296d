"""Focused A/B: dense-GN assembly and full solve with/without the
compact-pair scatter plan (blocks_pallas), in-scan slope timing.

Usage: python scripts/profile_plan.py [cap] [n_pts]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def note(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)
    print(f"[profile] {msg}")


def slope_time(name, step, init_fn, readback, n1=6, n2=24, reps=3):
    c = step(init_fn())
    readback(c)
    best = None
    for _ in range(reps):
        ts = []
        for k in (n1, n2):
            c = init_fn()
            t0 = time.perf_counter()
            for _ in range(k):
                c = step(c)
            readback(c)
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (n2 - n1)
        best = dt if best is None else min(best, dt)
    note(f"{name:52s} {best * 1e3:8.3f} ms (slope {n1}->{n2}, min of {reps})")
    return best


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    note(f"devices: {jax.devices()}  cap={cap} pts={n_pts}")

    from occlusionfusion_tpu.geometry.skinning import skinning_weights
    from occlusionfusion_tpu.ops.knn import knn_lax
    from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem
    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        _assemble_blocks,
        build_pair_scatter_plan,
        solve_dense,
    )

    r = np.random.RandomState(1)
    pts = r.randn(n_pts, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n_nodes = cap
    nodes = pts[r.choice(n_pts, n_nodes, replace=False)]
    anchors, weights, valid = skinning_weights(
        jnp.asarray(pts), jnp.asarray(nodes), None, 0.5, k=4
    )
    _, idx = knn_lax(jnp.asarray(nodes), jnp.asarray(nodes), k=9)
    ew = jnp.ones_like(idx[:, 1:], dtype=jnp.float32) / 8.0
    target = jnp.asarray(pts) + jnp.asarray([0.01, 0.0, 0.02])
    problem = GNProblem(
        source_points=jnp.asarray(pts),
        point_anchors=anchors,
        point_weights=weights,
        target_points=target,
        point_valid=valid.astype(jnp.float32),
        nodes=jnp.asarray(nodes),
        node_valid=jnp.ones(n_nodes, bool),
        edges=idx[:, 1:],
        edge_weights=ew,
        motion_targets=jnp.zeros((n_nodes, 3)),
        motion_confidence=jnp.zeros(n_nodes),
        solve_node_mask=jnp.ones(n_nodes, bool),
    )
    cfg = GNConfig(iters=4, w_point=1.0, w_arap=2.0, w_motion=0.0,
                   assembly="blocks_pallas")
    plan = build_pair_scatter_plan(problem.point_anchors, problem.edges,
                                   n_nodes)
    note(f"plan: overflow={bool(plan.overflow)} "
         f"slots={plan.slot_segs.shape[0]}")
    K = 8
    eyeR = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n_nodes, 3, 3))

    def scan_over(body):
        @jax.jit
        def step(carry):
            def f(c, _):
                return body(c), None

            c, _ = jax.lax.scan(f, carry, None, length=K)
            return c

        return step

    for tag, p in (("no-plan", None), ("plan", plan)):
        def body(t, _p=p):
            M, b, sq = _assemble_blocks(problem, cfg, eyeR, t, plan=_p)
            return (
                t + b.reshape(n_nodes, 6)[:, 3:] * 0.0 + sq * 0.0
                + M[0, 0] * 0.0
            )

        dt = slope_time(
            f"assemble[blocks_pallas {tag}] x{K}", scan_over(body),
            lambda: jnp.zeros((n_nodes, 3), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per iteration':52s} {dt / K * 1e3:8.3f} ms")

    for tag, p in (("no-plan", None), ("plan", plan)):
        @jax.jit
        def full(carry, _p=p):
            def f(t, _):
                res = solve_dense(problem, cfg, init_translations=t,
                                  scatter_plan=_p)
                return res.translations * 1e-6, None

            c, _ = jax.lax.scan(f, carry, None, length=K)
            return c

        dt = slope_time(
            f"full solve_dense(4 iters, {tag}) x{K}", full,
            lambda: jnp.zeros((n_nodes, 3), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per 4-iter solve':52s} {dt / K * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
