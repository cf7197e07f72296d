"""Non-rigid ICP: first-order warp-field solver on the SO(3) tangent.

TPU-native re-design of the reference's fusion solver
(``NonRigidICP/model/registration_fusion.py`` ``Registration.optimize_ED``):
per-node (R, t) estimated by Adam over ARAP + landmark (+ chamfer /
silhouette / depth / motion / smoothness) costs with an exponentially
decaying lr, 200 iterations.

Differences by design:
  * rotations are parametrized as axis-angle tangent vectors with
    R = exp(omega) (replaces lietorch's LieGroupParameter retraction —
    same stationary points, jit-friendly);
  * the whole optimization is one ``lax.scan`` over a *static* iteration
    count inside a single jit — no per-iteration dispatch, no host sync;
    the reference's ``loss < 1e-7`` early exit becomes a no-op-update mask
    so the compiled step count stays fixed;
  * every term is masked/padded (solving over MAX_NODES with identity
    padding is benign because padded nodes have no edges, no anchors and
    no landmarks).

Config defaults follow ``NonRigidICP/config.yaml``: iters=200, lr=0.06,
gamma=0.999, w_arap=10, w_ldmk=1, w_motion=100 (silh/depth/chamfer off).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from occlusionfusion_tpu.geometry.so3 import so3_exp
from occlusionfusion_tpu.geometry.edwarp import ed_warp
from occlusionfusion_tpu.solvers import losses


class NICPConfig(NamedTuple):
    iters: int = 200
    lr: float = 0.06
    gamma: float = 0.999
    w_arap: float = 10.0
    w_ldmk: float = 1.0
    w_motion: float = 100.0
    w_chamfer: float = 0.0
    w_smooth_trans: float = 0.0
    w_smooth_rot: float = 0.0
    # rendered costs (off by default, as in config.yaml:6,10); require
    # NICPProblem.render_* fields
    w_silh: float = 0.0
    w_depth: float = 0.0
    render_hw: tuple = (0, 0)  # static image size when silh/depth on
    early_stop_loss: float = 1e-7
    chamfer_samples: int = 1000
    chamfer_trunc: float = 0.3


class NICPProblem(NamedTuple):
    """Static-shape problem data. All index arrays padded + masked."""

    source_points: jnp.ndarray  # [P, 3] canonical/source surface points
    point_anchors: jnp.ndarray  # [P, K]
    point_weights: jnp.ndarray  # [P, K]
    point_valid: jnp.ndarray  # [P]
    nodes: jnp.ndarray  # [N, 3]
    node_valid: jnp.ndarray  # [N]
    edges: jnp.ndarray  # [N, K_e] -1 padded
    edge_weights: jnp.ndarray  # [N, K_e]
    # landmarks: warped[src_idx] should meet targets[tgt_idx]
    target_points: jnp.ndarray  # [M, 3]
    landmark_src: jnp.ndarray  # [L]
    landmark_tgt: jnp.ndarray  # [L]
    landmark_valid: jnp.ndarray  # [L]
    # motion-completion prediction (optional; confidence 0 disables)
    motion_targets: jnp.ndarray  # [N, 3] predicted deformed node positions
    motion_confidence: jnp.ndarray  # [N]
    # rendered-cost inputs (only consumed when w_silh/w_depth > 0):
    # camera intrinsics as a [4] array (fx, fy, cx, cy); target depth map
    render_intrinsics: jnp.ndarray | None = None  # [4]
    target_depth: jnp.ndarray | None = None  # [H, W]


class NICPResult(NamedTuple):
    rotations: jnp.ndarray  # [N, 3, 3]
    translations: jnp.ndarray  # [N, 3] (pivoted)
    warped_points: jnp.ndarray  # [P, 3]
    loss_history: jnp.ndarray  # [iters]
    final_loss: jnp.ndarray


def _objective(params, problem: NICPProblem, config: NICPConfig, key):
    omega, t = params["omega"], params["t"]
    R = so3_exp(omega)
    warped = ed_warp(
        problem.source_points,
        problem.nodes,
        R,
        t,
        problem.point_anchors,
        problem.point_weights,
    )
    total = jnp.float32(0.0)
    terms = {}
    if config.w_arap:
        terms["arap"] = losses.arap_cost(
            R, t, problem.nodes, problem.edges, problem.edge_weights
        )
        total += config.w_arap * terms["arap"]
    if config.w_ldmk:
        terms["ldmk"] = losses.landmark_cost(
            warped,
            problem.target_points,
            problem.landmark_src,
            problem.landmark_tgt,
            problem.landmark_valid,
        )
        total += config.w_ldmk * terms["ldmk"]
    if config.w_motion:
        terms["motion"] = losses.motion_cost(
            problem.nodes,
            t,
            problem.motion_targets,
            problem.motion_confidence,
            problem.node_valid,
        )
        total += config.w_motion * terms["motion"]
    if config.w_chamfer:
        terms["chamfer"] = losses.truncated_chamfer_cost(
            key,
            warped,
            problem.target_points,
            problem.point_valid,
            None,
            config.chamfer_samples,
            config.chamfer_trunc,
        )
        total += config.w_chamfer * terms["chamfer"]
    if (config.w_silh or config.w_depth) and problem.target_depth is not None:
        # rendered silhouette / projective-depth costs
        # (registration_fusion.py:228,257-259 via the point splat)
        from occlusionfusion_tpu.geometry.camera import Intrinsics
        from occlusionfusion_tpu.ops.rasterize import render_depth

        ri = problem.render_intrinsics
        intr = Intrinsics(ri[0], ri[1], ri[2], ri[3])
        src_depth, src_mask = render_depth(
            warped, intr, config.render_hw, problem.point_valid
        )
        tgt_mask = problem.target_depth > 0
        if config.w_silh:
            terms["silh"] = losses.silhouette_cost(src_mask, tgt_mask)
            total += config.w_silh * terms["silh"]
        if config.w_depth:
            terms["depth"] = losses.projective_depth_cost(
                src_depth, problem.target_depth
            )
            total += config.w_depth * terms["depth"]
    return total, (warped, terms)


@functools.partial(jax.jit, static_argnames=("config",))
def solve(
    problem: NICPProblem,
    config: NICPConfig = NICPConfig(),
    init_rotations: jnp.ndarray | None = None,
    init_translations: jnp.ndarray | None = None,
    key: jax.Array | None = None,
) -> NICPResult:
    """Run the full Adam solve as one compiled scan."""
    n = problem.nodes.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    omega0 = jnp.zeros((n, 3), jnp.float32)
    if init_rotations is not None:
        from occlusionfusion_tpu.geometry.so3 import so3_log

        omega0 = so3_log(init_rotations)
    t0 = (
        init_translations
        if init_translations is not None
        else jnp.zeros((n, 3), jnp.float32)
    )
    params = {"omega": omega0, "t": t0}

    schedule = optax.exponential_decay(
        init_value=config.lr, transition_steps=1, decay_rate=config.gamma
    )
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    grad_fn = jax.value_and_grad(_objective, has_aux=True)

    # RNG is only consumed by the chamfer subsampling; keep threefry out
    # of the scan entirely (it is disproportionately expensive to compile
    # on some TPU toolchains) and skip it when chamfer is off.
    if config.w_chamfer:
        step_keys = jax.random.split(key, config.iters)
    else:
        step_keys = jnp.zeros((config.iters, 2), jnp.uint32)

    def step(carry, step_key):
        params, opt_state, stopped = carry
        (loss, _), grads = grad_fn(params, problem, config, step_key)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # early-stop mask: once below threshold, freeze (reference breaks)
        stop_now = stopped | (loss < config.early_stop_loss)
        params = jax.tree.map(
            lambda old, new: jnp.where(stop_now, old, new), params, new_params
        )
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(stop_now, old, new),
            opt_state,
            new_opt_state,
        )
        return (params, opt_state, stop_now), loss

    (params, _, _), loss_hist = jax.lax.scan(
        step, (params, opt_state, jnp.bool_(False)), step_keys
    )

    R = so3_exp(params["omega"])
    final_loss, (warped, _) = _objective(params, problem, config, key)
    # padded nodes: identity transform
    eye = jnp.eye(3, dtype=jnp.float32)
    R = jnp.where(problem.node_valid[:, None, None], R, eye)
    t = jnp.where(problem.node_valid[:, None], params["t"], 0.0)
    warped = jnp.where(
        problem.point_valid[:, None], warped, problem.source_points
    )
    return NICPResult(
        rotations=R,
        translations=t,
        warped_points=warped,
        loss_history=loss_hist,
        final_loss=final_loss,
    )
