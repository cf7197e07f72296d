"""In-scan decomposition of the dense-GN solve at a given node cap.

Each phase is timed INSIDE a lax.scan over iterations (the production
shape) with slope+readback methodology — standalone per-dispatch numbers
through the axon relay are dominated by dispatch/fetch artifacts.

Usage: python scripts/profile_solve.py [cap] [n_pts]
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
    # warmup: compile + the relay's first-fetch penalty for this program
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
    note(f"{name:44s} {best * 1e3:8.3f} ms (slope {n1}->{n2}, min of {reps})")
    return best


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    note(f"devices: {jax.devices()}  cap={cap} pts={n_pts}")

    from occlusionfusion_tpu.geometry.skinning import skinning_weights
    from occlusionfusion_tpu.geometry.so3 import so3_exp
    from occlusionfusion_tpu.ops.knn import knn_lax
    from occlusionfusion_tpu.solvers.gauss_newton import GNConfig, GNProblem
    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        _assemble,
        _assemble_blocks,
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
    cfg = GNConfig(iters=4, w_point=1.0, w_arap=2.0, w_motion=0.0)
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

    # phase: assemble only (t varies per iteration like a real solve)
    def assemble_only(assemble):
        def body(t):
            M, b, sq = assemble(problem, cfg, eyeR, t)
            return t + b.reshape(n_nodes, 6)[:, 3:] * 0.0 + sq * 0.0 + M[0, 0] * 0.0

        return body

    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        build_pair_scatter_plan,
    )

    plan = build_pair_scatter_plan(problem.point_anchors, problem.edges,
                                   n_nodes)
    note(f"scatter plan: overflow={bool(plan.overflow)} "
         f"slots={plan.slot_segs.shape[0]}")

    def with_assembly(name, use_plan=False):
        def fn(problem, c, R, t, _n=name, _p=use_plan):
            return _assemble_blocks(
                problem, c._replace(assembly=_n), R, t,
                plan=plan if _p else None,
            )

        return fn

    for name, fn in (
        ("blocks", _assemble_blocks),
        ("blocks+plan", with_assembly("blocks", use_plan=True)),
        ("blocks_pallas", with_assembly("blocks_pallas")),
        ("blocks_pallas+plan", with_assembly("blocks_pallas", use_plan=True)),
        ("blocks_pallas_full", with_assembly("blocks_pallas_full")),
        ("dense_j", _assemble),
    ):
        dt = slope_time(
            f"assemble[{name}] x{K} in scan", scan_over(assemble_only(fn)),
            lambda: jnp.zeros((n_nodes, 3), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per iteration':44s} {dt / K * 1e3:8.3f} ms")

    # phase: assemble + solve
    def asm_solve(linear_solver):
        def body(t):
            M, b, sq = _assemble_blocks(problem, cfg, eyeR, t)
            M = M + jnp.eye(6 * n_nodes) * 1e-4
            if linear_solver == "cg":
                idxn = jnp.arange(n_nodes)
                diag = M.reshape(n_nodes, 6, n_nodes, 6)[idxn, :, idxn, :]
                inv_diag = jnp.linalg.inv(diag)
                rhs = -b

                def prec(v):
                    return jnp.einsum(
                        "nij,nj->ni", inv_diag, v.reshape(n_nodes, 6)
                    ).reshape(-1)

                x = prec(rhs)
                rres = rhs - M @ x
                p = prec(rres)
                rz = jnp.vdot(rres, p)
                for _ in range(12):
                    Ap = M @ p
                    alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
                    x = x + alpha * p
                    rres = rres - alpha * Ap
                    z = prec(rres)
                    rz2 = jnp.vdot(rres, z)
                    p = z + (rz2 / jnp.maximum(rz, 1e-20)) * p
                    rz = rz2
            else:
                chol, low = jax.scipy.linalg.cho_factor(M)
                x = jax.scipy.linalg.cho_solve((chol, low), -b)
            return t + x.reshape(n_nodes, 6)[:, 3:] * 1e-9

        return body

    for name in ("cholesky", "cg"):
        dt = slope_time(
            f"assemble+{name} x{K} in scan", scan_over(asm_solve(name)),
            lambda: jnp.zeros((n_nodes, 3), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per iteration':44s} {dt / K * 1e3:8.3f} ms")

    # full production solve (4 GN iters) in a K-chunk scan
    for asm, use_plan in (
        ("blocks", False),
        ("blocks_pallas", False),
        ("blocks_pallas", True),
        ("blocks_pallas_full", False),
    ):
        cfg_a = cfg._replace(assembly=asm)

        @jax.jit
        def full(carry, _cfg=cfg_a, _p=use_plan):
            def f(t, _):
                res = solve_dense(
                    problem, _cfg, init_translations=t,
                    scatter_plan=plan if _p else None,
                )
                return res.translations * 1e-6, None

            c, _ = jax.lax.scan(f, carry, None, length=K)
            return c

        tag = f"{asm}{'+plan' if use_plan else ''}"
        dt = slope_time(
            f"full solve_dense(4 iters, {tag}) x{K} in scan", full,
            lambda: jnp.zeros((n_nodes, 3), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per 4-iter solve':44s} {dt / K * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
