"""Gauss-Newton embedded-deformation solver (matrix-free, LM-damped).

TPU-native re-design of the reference's differentiable GN solver
(``model/model.py`` ``DeformNet``: GN loop at ``:1296-1537``, fusion-path
variant ``optimize`` with the motion term at ``:603-612``, jacobians
``:426-534``, ARAP ``:554-601``, LU solve ``:640-711``): per-node (R, t)
from point/flow/ARAP/motion residuals, Levenberg-Marquardt damping, a
fixed iteration budget.

Where the reference hand-assembles jacobian blocks and runs a dense LU
with a hand-written backward (``LinearSolverLU``, ``model/model.py:59-86``),
this solver never materializes J: the normal equations
(J^T J + lm I) dx = -J^T r are solved by conjugate gradients whose matvec
is a jvp/vjp composition through the residual function. That keeps memory
at O(P) regardless of node count, lets XLA fuse the entire iteration into
one compiled scan, and stays exact for the quadratic model. Rotation
updates retract on the manifold: R <- exp(dw) R (the reference uses
kornia's exp map the same way, ``model/model.py:1522-1526``).

Failure guards mirrored from the reference (``model/model.py:1465-1516``):
non-finite solutions fall back to a zero step; the iteration count is
static so XLA compiles once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.so3 import so3_exp
from occlusionfusion_tpu.geometry.edwarp import ed_warp


class GNConfig(NamedTuple):
    iters: int = 10  # model.py:93 (gn_num_iter)
    cg_iters: int = 32
    lm_damping: float = 1e-4
    w_point: float = 1.0
    w_arap: float = 2.0
    w_motion: float = 0.0
    step_length: float = 1.0
    # block-Jacobi preconditioning (6x6 diagonal blocks of JtJ): cuts CG
    # iterations ~3-5x for a cheap O(P K) block build
    precondition: bool = False
    # linear solver for the dense path (gauss_newton_dense.solve_dense):
    # "cholesky" — exact; sequential panels, latency-bound on TPU
    # "cg" — block-Jacobi-preconditioned CG on the assembled dense
    #         matrix; each iteration is one MXU matvec (dense_cg_iters)
    # "schur" — recursive block-Schur SPD inverse (ops/blocksolve.py):
    #         log-depth chain of large matmuls instead of Cholesky's
    #         sequential panels; ~6x FLOPs, far lower latency on TPU
    # "ns" — Newton-Schulz inverse seeded with the exact block-Jacobi
    #         inverse (ops/blocksolve.py): one batched small inv +
    #         2*ns_iters full-size matmuls, the shortest dependent chain
    linear_solver: str = "cholesky"
    dense_cg_iters: int = 24
    schur_leaf: int = 96
    ns_iters: int = 12
    ns_block: int = 96
    # normal-equation assembly for the dense path:
    # "auto" — "blocks_pallas" on TPU (when K == 4), "blocks" elsewhere
    # "blocks" — 6x6 blocks per (anchor, anchor) pair accumulated by
    #         segment_sum into the [N, N] block table; true-FLOP work.
    #         Measured (v5e, 4-iter solve, slope+readback): 13.0 ms at
    #         the 128-node cap / 33.6-44.4 ms at 512.
    # "blocks_pallas" — same block table, but the per-term jacobian
    #         build + pair products + rhs fused into two Pallas kernels
    #         (ops/gn_assembly.py). Measured 32.7 ms per 4-iter solve at
    #         the 512 cap (vs 44.4 "blocks").
    # "dense_j" — scatter jacobian blocks into one dense row-stacked J
    #         via one-hot matmuls, then M = J^T J as a single big einsum;
    #         the J^T J multiplies ~99% zeros — O((P + N Ke) N) MXU work
    #         (16.6 ms at 128 / 113.5 ms at 512 with bf16 A). Kept as
    #         the cross-validation twin.
    assembly: str = "auto"
    # data-term parameterization (reference model/model.py:1306-1378):
    # "point3d"  — isotropic 3D point-to-point residual (default)
    # "2d_depth" — the reference's anisotropic stack: x-pixel + y-pixel
    #         rows weighted w_flow and a camera-depth row weighted
    #         w_depth. Under real depth-sensor noise (z noisy, lateral
    #         accurate) this weights the accurate image-plane evidence
    #         independently of the noisy depth axis. Targets stay 3D
    #         camera-space points (problem.target_points); the solver
    #         projects both sides through problem.intrinsics internally,
    #         so all correspondence sources feed one interface. Needs
    #         problem.intrinsics; the Pallas fused point-term kernel is
    #         point3d-only, so assembly falls back to XLA blocks.
    data_term: str = "point3d"
    # per-row weights of the 2d_depth stack (lambda^2 semantics like
    # w_point/w_arap). Original NeuralTracking trains with flow 1e-3 /
    # depth 1; the fork's fusion path runs flow 0 / depth 1
    # (model/model.py:98-104). Both rows are additionally scaled by
    # sqrt(w_point) so the overall data-vs-ARAP balance is one knob.
    w_flow: float = 1e-3
    w_depth: float = 1.0
    # precision of the J^T J contraction in the dense assembly (the
    # heaviest MXU work per GN iteration). The curvature matrix only
    # steers the step direction — LM damping + the exact residual/
    # gradient keep GN convergent with a bf16 A ("default"), at ~6x
    # fewer MXU passes than "highest". b = J^T r stays "highest".
    normal_matrix_precision: str = "highest"


class GNProblem(NamedTuple):
    """Static-shape problem data (padded + masked)."""

    source_points: jnp.ndarray  # [P, 3]
    point_anchors: jnp.ndarray  # [P, K]
    point_weights: jnp.ndarray  # [P, K]
    target_points: jnp.ndarray  # [P, 3] per-point 3D targets
    point_valid: jnp.ndarray  # [P] (correspondence validity weights in [0,1])
    nodes: jnp.ndarray  # [N, 3]
    node_valid: jnp.ndarray  # [N]
    edges: jnp.ndarray  # [N, K_e] -1 padded
    edge_weights: jnp.ndarray  # [N, K_e]
    motion_targets: jnp.ndarray  # [N, 3]
    motion_confidence: jnp.ndarray  # [N]
    solve_node_mask: jnp.ndarray  # [N] True = free variable, False = frozen
    # [4] fx, fy, cx, cy — required when config.data_term == "2d_depth"
    intrinsics: jnp.ndarray = None


class GNResult(NamedTuple):
    rotations: jnp.ndarray
    translations: jnp.ndarray
    warped_points: jnp.ndarray
    residual_history: jnp.ndarray  # [iters] total squared residual
    valid: jnp.ndarray  # scalar bool: all iterations finite


def _project_uvz(points, intr4):
    """(u, v, z) image coordinates of camera-space points, without the
    principal-point offset (it cancels in every residual difference).
    eps guards padded zero points (``model/model.py:1319-1321``)."""
    zinv = 1.0 / (points[..., 2] + 1e-7)
    u = intr4[0] * points[..., 0] * zinv
    v = intr4[1] * points[..., 1] * zinv
    return u, v, points[..., 2]


def data_residual_rows(warped, problem: GNProblem, config: GNConfig):
    """Weighted data residual [P, 3] at the given warped points; the one
    definition both solvers (matrix-free autodiff and dense analytic
    assembly) share, so the two paths cannot drift apart."""
    sw = jnp.sqrt(jnp.asarray(config.w_point, jnp.float32))
    if config.data_term == "2d_depth":
        sf = jnp.sqrt(jnp.asarray(config.w_flow, jnp.float32))
        sd = jnp.sqrt(jnp.asarray(config.w_depth, jnp.float32))
        u, v, z = _project_uvz(warped, problem.intrinsics)
        tu, tv, tz = _project_uvz(problem.target_points, problem.intrinsics)
        rows = jnp.stack(
            [sf * (u - tu), sf * (v - tv), sd * (z - tz)], axis=-1
        )
    else:
        rows = warped - problem.target_points
    return sw * problem.point_valid[:, None] * rows


def projection_row_scaling(warped, problem: GNProblem, config: GNConfig):
    """[P, 3, 3] left factor G turning 3D-point jacobian rows into the
    2d_depth rows: d(sf*u, sf*v, sd*z)/d(xyz) evaluated at the current
    warped points (the reference's fx_div_z / -fx_mul_x_div_z_2 / depth
    entries, ``model/model.py:1322-1366``). Returns None for point3d."""
    if config.data_term != "2d_depth":
        return None
    P = warped.shape[0]
    sf = jnp.sqrt(jnp.asarray(config.w_flow, jnp.float32))
    sd = jnp.sqrt(jnp.asarray(config.w_depth, jnp.float32))
    fx, fy = problem.intrinsics[0], problem.intrinsics[1]
    zinv = 1.0 / (warped[:, 2] + 1e-7)
    G = jnp.zeros((P, 3, 3), jnp.float32)
    G = G.at[:, 0, 0].set(sf * fx * zinv)
    G = G.at[:, 0, 2].set(-sf * fx * warped[:, 0] * zinv * zinv)
    G = G.at[:, 1, 1].set(sf * fy * zinv)
    G = G.at[:, 1, 2].set(-sf * fy * warped[:, 1] * zinv * zinv)
    G = G.at[:, 2, 2].set(sd)
    return G


def _residuals(params, problem: GNProblem, config: GNConfig, base_R):
    """Stacked weighted residual vector as a pytree of arrays.

    params = (dw [N,3], t [N,3]); rotation is exp(dw) @ base_R so the
    linearization point is the identity tangent.
    """
    dw, t = params
    R = jnp.einsum("nij,njk->nik", so3_exp(dw), base_R, precision="highest")
    warped = ed_warp(
        problem.source_points,
        problem.nodes,
        R,
        t,
        problem.point_anchors,
        problem.point_weights,
    )
    point_res = data_residual_rows(warped, problem, config)

    e = jnp.maximum(problem.edges, 0)
    g_i = problem.nodes[:, None]
    g_j = problem.nodes[e]
    rotated = jnp.einsum("nij,nkj->nki", R, g_j - g_i, precision="highest")
    arap = rotated + g_i + t[:, None] - g_j - t[e]
    wa = jnp.sqrt(
        jnp.asarray(config.w_arap, jnp.float32)
        * jnp.where(problem.edges >= 0, problem.edge_weights, 0.0)
    )
    arap_res = wa[..., None] * arap

    res = {"point": point_res, "arap": arap_res}
    if config.w_motion:
        wm = jnp.sqrt(
            jnp.asarray(config.w_motion, jnp.float32)
        ) * problem.motion_confidence[:, None]
        res["motion"] = wm * (
            problem.nodes + t - problem.motion_targets
        ) * problem.node_valid[:, None]
    return res


def _tree_dot(a, b):
    return sum(
        jnp.sum(x * y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _mask_params(params, problem):
    """Zero updates of frozen / padded nodes."""
    mask = (problem.solve_node_mask & problem.node_valid)[:, None].astype(
        jnp.float32
    )
    return (params[0] * mask, params[1] * mask)


@functools.partial(jax.jit, static_argnames=("config",))
def solve(
    problem: GNProblem,
    config: GNConfig = GNConfig(),
    init_rotations: jnp.ndarray | None = None,
    init_translations: jnp.ndarray | None = None,
) -> GNResult:
    n = problem.nodes.shape[0]
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

    def gn_step(carry, _):
        R, t, ok = carry
        zero = (jnp.zeros((n, 3), jnp.float32), t)

        def res_fn(params):
            return _residuals(params, problem, config, R)

        r0 = res_fn(zero)
        sq = _tree_dot(r0, r0)

        # b = -J^T r ; matvec(v) = J^T J v + lm v, all matrix-free
        _, vjp_fn = jax.vjp(res_fn, zero)

        def jtj(v):
            v = _mask_params(v, problem)
            _, jv = jax.jvp(res_fn, (zero,), (v,))
            (jtjv,) = vjp_fn(jv)
            jtjv = _mask_params(jtjv, problem)
            return (
                jtjv[0] + config.lm_damping * v[0],
                jtjv[1] + config.lm_damping * v[1],
            )

        (b,) = vjp_fn(r0)
        b = _mask_params((-b[0], -b[1]), problem)

        if config.precondition:
            from occlusionfusion_tpu.solvers.gauss_newton_dense import (
                diag_blocks,
            )

            D = diag_blocks(problem, config, R, t)
            D = D + jnp.eye(6) * config.lm_damping
            Dinv = jnp.linalg.inv(D)  # [N, 6, 6]

            def apply_M(v):
                z6 = jnp.concatenate([v[0], v[1]], axis=-1)  # [N, 6]
                z = jnp.einsum("nij,nj->ni", Dinv, z6, precision="highest")
                return _mask_params((z[:, :3], z[:, 3:]), problem)

        else:

            def apply_M(v):
                return v

        def cg_body(state, _):
            x, r, p, rz = state
            Ap = jtj(p)
            alpha = rz / jnp.maximum(_tree_dot(p, Ap), 1e-20)
            x = (x[0] + alpha * p[0], x[1] + alpha * p[1])
            r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
            z = apply_M(r)
            rz_new = _tree_dot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = (z[0] + beta * p[0], z[1] + beta * p[1])
            return (x, r, p, rz_new), None

        x0 = (jnp.zeros_like(b[0]), jnp.zeros_like(b[1]))
        z0 = apply_M(b)
        (x, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, b, z0, _tree_dot(b, z0)), None,
            length=config.cg_iters,
        )

        # x is the GN step (delta_w, delta_t) about the point (0, t)
        dw = x[0] * config.step_length
        dt = x[1] * config.step_length
        finite = jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dt))
        dw = jnp.where(finite, dw, 0.0)
        dt = jnp.where(finite, dt, 0.0)
        R_new = jnp.einsum("nij,njk->nik", so3_exp(dw), R, precision="highest")
        t_new = t + dt
        return (R_new, t_new, ok & finite), sq

    (R, t, ok), hist = jax.lax.scan(
        gn_step, (R0, t0, jnp.bool_(True)), None, length=config.iters
    )

    warped = ed_warp(
        problem.source_points,
        problem.nodes,
        R,
        t,
        problem.point_anchors,
        problem.point_weights,
    )
    eye = jnp.eye(3, dtype=jnp.float32)
    R = jnp.where(problem.node_valid[:, None, None], R, eye)
    t = jnp.where(problem.node_valid[:, None], t, 0.0)
    return GNResult(
        rotations=R,
        translations=t,
        warped_points=warped,
        residual_history=hist,
        valid=ok,
    )
