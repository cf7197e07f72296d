"""Pose-graph optimization tests: drift correction with a loop closure."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.fusion.pose_graph import (
    PoseGraph,
    _compose,
    _inverse,
    optimize_pose_graph,
)
from occlusionfusion_tpu.geometry import so3_exp


def make_chain(K=6, drift=0.02, seed=0):
    """Ground-truth poses on a circle; odometry edges with drift; one
    loop-closure edge (K-1 -> 0) with the exact measurement."""
    rng = np.random.RandomState(seed)
    R_gt = [np.eye(3)]
    t_gt = [np.zeros(3)]
    for k in range(1, K):
        R_gt.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.0, 0.4 * k]))))
        t_gt.append(np.asarray([np.cos(k), np.sin(k), 0.0]) * 0.3)
    R_gt = np.stack(R_gt).astype(np.float32)
    t_gt = np.stack(t_gt).astype(np.float32)

    edges_i, edges_j, eR, et, ew = [], [], [], [], []

    def rel(i, j, noise=0.0):
        Ri_inv, ti_inv = _inverse(jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i]))
        R, t = _compose(Ri_inv, ti_inv, jnp.asarray(R_gt[j]), jnp.asarray(t_gt[j]))
        if noise:
            dR = so3_exp(jnp.asarray(rng.randn(3) * noise))
            R = dR @ R
            t = t + rng.randn(3) * noise
        return np.asarray(R), np.asarray(t)

    # noisy odometry chain
    for k in range(K - 1):
        R, t = rel(k, k + 1, noise=drift)
        edges_i.append(k)
        edges_j.append(k + 1)
        eR.append(R)
        et.append(t)
        ew.append(1.0)
    # exact loop closure
    R, t = rel(0, K - 1, noise=0.0)
    edges_i.append(0)
    edges_j.append(K - 1)
    eR.append(R)
    et.append(t)
    ew.append(10.0)

    # initial poses: integrate the noisy odometry
    R0 = [np.eye(3, dtype=np.float32)]
    t0 = [np.zeros(3, np.float32)]
    for k in range(K - 1):
        R, t = _compose(jnp.asarray(R0[k]), jnp.asarray(t0[k]),
                        jnp.asarray(eR[k]), jnp.asarray(et[k]))
        R0.append(np.asarray(R))
        t0.append(np.asarray(t))

    graph = PoseGraph(
        poses_R=jnp.asarray(np.stack(R0)),
        poses_t=jnp.asarray(np.stack(t0)),
        pose_valid=jnp.ones(K, bool),
        edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        edge_R=jnp.asarray(np.stack(eR)),
        edge_t=jnp.asarray(np.stack(et)),
        edge_valid=jnp.ones(len(edges_i), bool),
        edge_weight=jnp.asarray(ew, jnp.float32),
    )
    return graph, R_gt, t_gt


class TestPoseGraph:
    def test_exact_measurements_zero_residual(self):
        graph, R_gt, t_gt = make_chain(drift=0.0)
        R, t, hist = optimize_pose_graph(graph, iters=5)
        assert float(hist[-1]) < 1e-8

    def test_loop_closure_reduces_drift(self):
        graph, R_gt, t_gt = make_chain(drift=0.03)
        R, t, hist = optimize_pose_graph(graph, iters=10)
        # optimized final keyframe should be closer to GT than odometry
        err_before = np.linalg.norm(np.asarray(graph.poses_t)[-1] - t_gt[-1])
        err_after = np.linalg.norm(np.asarray(t)[-1] - t_gt[-1])
        assert err_after < err_before * 0.7, (err_before, err_after)

    def test_gauge_fixed(self):
        graph, _, _ = make_chain(drift=0.05)
        R, t, _ = optimize_pose_graph(graph, iters=8)
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t)[0], 0.0, atol=1e-6)

    def test_residual_decreases(self):
        graph, _, _ = make_chain(drift=0.05)
        _, _, hist = optimize_pose_graph(graph, iters=10)
        assert float(hist[-1]) < float(hist[0])
