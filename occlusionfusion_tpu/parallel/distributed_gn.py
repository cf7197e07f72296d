"""Distributed Gauss-Newton: point residuals sharded over the mesh,
normal equations reduced with psum.

The north-star distribution design (SURVEY.md §2.3): correspondences /
surface points are partitioned across devices along the mesh's data axis
while the (small) node state is replicated. Each device computes its
shard's contribution J_d^T J_d v and J_d^T r_d; one ``psum`` per CG
matvec reduces the per-node 6x6-block system — the collective-based
reduction of the per-node blocks that a hand-written Schur assembly would
produce, obtained here matrix-free. The ARAP/motion graph terms are tiny
and evaluated replicated (no collective). The CG state stays bitwise
replicated, so the solved node transforms need no broadcast.

Scaling: per-device work is O(P / n_devices); the psum payload is the
6N-vector (a few KB) — ICI-bound latency, not bandwidth, so efficiency
stays high until shards get tiny.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from occlusionfusion_tpu.geometry.so3 import so3_exp
from occlusionfusion_tpu.geometry.edwarp import ed_warp
from occlusionfusion_tpu.solvers.gauss_newton import (
    GNConfig,
    GNProblem,
    GNResult,
    _mask_params,
    _residuals,
    _tree_dot,
)


def _point_only(config: GNConfig) -> GNConfig:
    return config._replace(w_arap=0.0, w_motion=0.0)


def _graph_only(config: GNConfig) -> GNConfig:
    return config._replace(w_point=0.0)


def solve_distributed(
    mesh: Mesh,
    problem: GNProblem,
    config: GNConfig = GNConfig(),
    axis: str = "data",
) -> GNResult:
    """Drop-in distributed version of solvers.gauss_newton.solve.

    The point-dimension arrays of ``problem`` are sharded along ``axis``
    (P must divide by the axis size); node arrays are replicated.
    """
    n = problem.nodes.shape[0]
    pt_cfg = _point_only(config)
    g_cfg = _graph_only(config)

    point_spec = GNProblem(
        source_points=P(axis),
        point_anchors=P(axis),
        point_weights=P(axis),
        target_points=P(axis),
        point_valid=P(axis),
        nodes=P(),
        node_valid=P(),
        edges=P(),
        edge_weights=P(),
        motion_targets=P(),
        motion_confidence=P(),
        solve_node_mask=P(),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(point_spec,),
        out_specs=(P(), P(), P(axis), P(), P()),
        check_vma=False,
    )
    def run(local: GNProblem):
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        t0 = jnp.zeros((n, 3), jnp.float32)

        def gn_step(carry, _):
            R, t, ok = carry
            zero = (jnp.zeros((n, 3), jnp.float32), t)

            def pt_res(params):
                return _residuals(params, local, pt_cfg, R)

            def g_res(params):
                return _residuals(params, local, g_cfg, R)

            r_pt = pt_res(zero)
            r_g = g_res(zero)
            sq = jax.lax.psum(_tree_dot(r_pt, r_pt), axis) + _tree_dot(r_g, r_g)

            _, vjp_pt = jax.vjp(pt_res, zero)
            _, vjp_g = jax.vjp(g_res, zero)

            def reduce_pair(a, b):
                return (
                    jax.lax.psum(a[0], axis) + b[0],
                    jax.lax.psum(a[1], axis) + b[1],
                )

            (b_pt,) = vjp_pt(r_pt)
            (b_g,) = vjp_g(r_g)
            b = reduce_pair(b_pt, b_g)
            b = _mask_params((-b[0], -b[1]), local)

            def jtj(v):
                v = _mask_params(v, local)
                _, jv_pt = jax.jvp(pt_res, (zero,), (v,))
                (jtjv_pt,) = vjp_pt(jv_pt)
                _, jv_g = jax.jvp(g_res, (zero,), (v,))
                (jtjv_g,) = vjp_g(jv_g)
                s = reduce_pair(jtjv_pt, jtjv_g)
                s = _mask_params(s, local)
                return (
                    s[0] + config.lm_damping * v[0],
                    s[1] + config.lm_damping * v[1],
                )

            def cg_body(state, _):
                x, r, p, rs = state
                Ap = jtj(p)
                alpha = rs / jnp.maximum(_tree_dot(p, Ap), 1e-20)
                x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
                r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
                rs_new = _tree_dot(r, r)
                beta = rs_new / jnp.maximum(rs, 1e-20)
                p = (r[0] + beta * p[0], r[1] + beta * p[1])
                return (x, r, p, rs_new), None

            x0 = (jnp.zeros_like(b[0]), jnp.zeros_like(b[1]))
            (x, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, b, b, _tree_dot(b, b)), None,
                length=config.cg_iters,
            )
            dw = x[0] * config.step_length
            dt = x[1] * config.step_length
            finite = jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dt))
            dw = jnp.where(finite, dw, 0.0)
            dt = jnp.where(finite, dt, 0.0)
            R_new = jnp.einsum(
                "nij,njk->nik", so3_exp(dw), R, precision="highest"
            )
            return (R_new, t + dt, ok & finite), sq

        (R, t, ok), hist = jax.lax.scan(
            gn_step, (R0, t0, jnp.bool_(True)), None, length=config.iters
        )
        warped_local = ed_warp(
            local.source_points,
            local.nodes,
            R,
            t,
            local.point_anchors,
            local.point_weights,
        )
        # mask invalid nodes INSIDE the jitted region: eager ops on the
        # outputs would require every mesh device to be addressable,
        # which is false under multi-process jax.distributed
        eye = jnp.eye(3, dtype=jnp.float32)
        R = jnp.where(local.node_valid[:, None, None], R, eye)
        t = jnp.where(local.node_valid[:, None], t, 0.0)
        return R, t, warped_local, hist, ok

    sharded_problem = jax.device_put(
        problem,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), point_spec,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    R, t, warped, hist, ok = jax.jit(run)(sharded_problem)
    return GNResult(
        rotations=R,
        translations=t,
        warped_points=warped,
        residual_history=hist,
        valid=ok,
    )


def solve_dense_distributed(
    mesh: Mesh,
    problem: GNProblem,
    config: GNConfig = GNConfig(),
    axis: str = "data",
    init_rotations: jnp.ndarray | None = None,
    init_translations: jnp.ndarray | None = None,
) -> GNResult:
    """Distributed version of the PRODUCTION solver
    (``solvers.gauss_newton_dense.solve_dense``): the per-point block
    assembly — the dominant cost, measured ~9.5 of 11.4 ms/GN-iter at
    cap 512 — runs on each device's point shard; ONE ``psum`` per GN
    iteration reduces the assembled ([6N, 6N], [6N], scalar) normal
    system, and the small Cholesky solve + retraction stay bitwise
    replicated.

    The replicated graph terms (ARAP, motion prior) are made
    psum-exact by weight rescaling instead of a code fork: both enter
    M/b/r^2 quadratically in (edge_weights, motion_confidence), so
    dividing edge_weights by n_shards and motion_confidence by
    sqrt(n_shards) makes the sum over shards reproduce the exact
    single-device system.

    P must divide by the axis size. Assembly is forced to the XLA
    "blocks" path (shard-local)."""
    n = problem.nodes.shape[0]
    n_shards = mesh.shape[axis]
    cfg = config._replace(assembly="blocks")

    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        _assemble_blocks,
    )

    def spec_of(name):
        point_fields = (
            "source_points", "point_anchors", "point_weights",
            "target_points", "point_valid",
        )
        if getattr(problem, name) is None:
            return None
        return P(axis) if name in point_fields else P()

    in_spec = GNProblem(**{f: spec_of(f) for f in GNProblem._fields})
    R0 = (
        init_rotations
        if init_rotations is not None
        else jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    )
    t0 = (
        init_translations
        if init_translations is not None
        else jnp.zeros((n, 3), jnp.float32)
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_spec, P(), P()),
        out_specs=(P(), P(), P(axis), P(), P()),
        check_vma=False,
    )
    def run(local: GNProblem, R0, t0):
        local = local._replace(
            edge_weights=local.edge_weights / n_shards,
            motion_confidence=local.motion_confidence
            / jnp.sqrt(jnp.float32(n_shards)),
        )
        free = (
            local.solve_node_mask & local.node_valid
        ).astype(jnp.float32)
        free6 = jnp.repeat(free, 6)

        def gn_step(carry, _):
            R, t, ok = carry
            M, b, sq = _assemble_blocks(local, cfg, R, t)
            M = jax.lax.psum(M, axis)
            b = jax.lax.psum(b, axis)
            sq = jax.lax.psum(sq, axis)
            M = M * free6[:, None] * free6[None, :]
            M = M + jnp.diag(
                jnp.where(free6 > 0, cfg.lm_damping, 1.0)
            )
            rhs = -b * free6
            chol, low = jax.scipy.linalg.cho_factor(M)
            x = jax.scipy.linalg.cho_solve((chol, low), rhs).reshape(n, 6)
            dw = x[:, :3] * cfg.step_length
            dt = x[:, 3:] * cfg.step_length
            finite = jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dt))
            dw = jnp.where(finite, dw, 0.0)
            dt = jnp.where(finite, dt, 0.0)
            R_new = jnp.einsum(
                "nij,njk->nik", so3_exp(dw), R, precision="highest"
            )
            return (R_new, t + dt, ok & finite), sq

        (R, t, ok), hist = jax.lax.scan(
            gn_step, (R0, t0, jnp.bool_(True)), None, length=cfg.iters
        )
        warped = ed_warp(
            local.source_points, local.nodes, R, t,
            local.point_anchors, local.point_weights,
        )
        eye = jnp.eye(3, dtype=jnp.float32)
        R = jnp.where(local.node_valid[:, None, None], R, eye)
        t = jnp.where(local.node_valid[:, None], t, 0.0)
        return R, t, warped, hist, ok

    sharded_problem = jax.device_put(
        problem,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), in_spec,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    R, t, warped, hist, ok = jax.jit(run)(sharded_problem, R0, t0)
    return GNResult(
        rotations=R, translations=t, warped_points=warped,
        residual_history=hist, valid=ok,
    )
