"""Keyframe pose graph for long-sequence drift correction.

North-star component (BASELINE.json): the reference tracks every frame
against a single canonical model and accumulates drift on long sequences
(its only recovery is per-frame npy artifacts, SURVEY §5). Here keyframes
anchor a pose graph: each keyframe carries a global SE(3) pose, edges
carry relative-pose measurements (odometry between consecutive keyframes
+ loop closures from e.g. Lepard rigid fits), and the graph is optimized
by Gauss-Newton on the se(3) tangent — a small dense problem solved
on-device in one jit.

Residual per edge (i, j) with measurement (R_ij, t_ij):
  r = log( T_ij^-1 * T_i^-1 * T_j )  in R^6 (rotation | translation).
The first pose is gauge-fixed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.so3 import so3_exp, so3_log


class PoseGraph(NamedTuple):
    """Static-shape pose graph (padded)."""

    poses_R: jnp.ndarray  # [K, 3, 3] initial keyframe rotations
    poses_t: jnp.ndarray  # [K, 3]
    pose_valid: jnp.ndarray  # [K]
    edge_i: jnp.ndarray  # [E] int32
    edge_j: jnp.ndarray  # [E]
    edge_R: jnp.ndarray  # [E, 3, 3] measured relative rotation i->j
    edge_t: jnp.ndarray  # [E, 3]
    edge_valid: jnp.ndarray  # [E]
    edge_weight: jnp.ndarray  # [E]


def _compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb)."""
    R = jnp.einsum("...ij,...jk->...ik", Ra, Rb, precision="highest")
    t = jnp.einsum("...ij,...j->...i", Ra, tb, precision="highest") + ta
    return R, t


def _inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")


def _edge_residuals(xi, graph: PoseGraph):
    """xi [K, 6] tangent corrections around the initial poses."""
    dR = so3_exp(xi[:, :3])
    R = jnp.einsum("kij,kjl->kil", dR, graph.poses_R, precision="highest")
    t = graph.poses_t + xi[:, 3:]
    Ri, ti = R[graph.edge_i], t[graph.edge_i]
    Rj, tj = R[graph.edge_j], t[graph.edge_j]
    Rinv, tinv = _inverse(Ri, ti)
    R_rel, t_rel = _compose(Rinv, tinv, Rj, tj)  # T_i^-1 T_j
    Rm_inv, tm_inv = _inverse(graph.edge_R, graph.edge_t)
    R_err, t_err = _compose(Rm_inv, tm_inv, R_rel, t_rel)
    rot_err = so3_log(R_err)
    res = jnp.concatenate([rot_err, t_err], axis=-1)  # [E, 6]
    w = jnp.sqrt(jnp.maximum(graph.edge_weight, 0.0)) * graph.edge_valid
    return res * w[:, None]


@functools.partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(
    graph: PoseGraph, iters: int = 10, cg_iters: int = 32,
    damping: float = 1e-6,
):
    """GN over the tangent corrections; pose 0 is gauge-fixed.

    Returns (R [K, 3, 3], t [K, 3], residual_history [iters])."""
    K = graph.poses_R.shape[0]
    free = graph.pose_valid & (jnp.arange(K) > 0)

    def mask(v):
        return v * free[:, None].astype(v.dtype)

    poses_R = graph.poses_R
    poses_t = graph.poses_t

    def gn_step(carry, _):
        poses_R, poses_t = carry
        g = graph._replace(poses_R=poses_R, poses_t=poses_t)

        def res_fn(xi):
            return _edge_residuals(xi, g)

        xi0 = jnp.zeros((K, 6))
        r0 = res_fn(xi0)
        sq = jnp.sum(r0 * r0)
        _, vjp = jax.vjp(res_fn, xi0)

        def jtj(v):
            v = mask(v)
            _, jv = jax.jvp(res_fn, (xi0,), (v,))
            (out,) = vjp(jv)
            return mask(out) + damping * v

        (b,) = vjp(r0)
        b = mask(-b)

        def cg(state, _):
            x, r, p, rs = state
            Ap = jtj(p)
            alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            rs2 = jnp.sum(r * r)
            p = r + (rs2 / jnp.maximum(rs, 1e-20)) * p
            return (x, r, p, rs2), None

        (x, _, _, _), _ = jax.lax.scan(
            cg, (jnp.zeros_like(b), b, b, jnp.sum(b * b)), None,
            length=cg_iters,
        )
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        dR = so3_exp(x[:, :3])
        poses_R = jnp.einsum(
            "kij,kjl->kil", dR, poses_R, precision="highest"
        )
        poses_t = poses_t + x[:, 3:]
        return (poses_R, poses_t), sq

    (poses_R, poses_t), hist = jax.lax.scan(
        gn_step, (poses_R, poses_t), None, length=iters
    )
    return poses_R, poses_t, hist
