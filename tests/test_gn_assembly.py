"""Pallas fused point-term assembly vs the XLA blocks twin (interpret
mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.geometry.so3 import so3_exp
from occlusionfusion_tpu.ops import gn_assembly
from occlusionfusion_tpu.solvers.gauss_newton import GNConfig
from test_gauss_newton import build_problem


@pytest.fixture()
def interp(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def wrapped(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gn_assembly.pl, "pallas_call", wrapped)


def test_pallas_assembly_matches_xla(interp):
    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        _assemble_blocks,
    )

    problem, _, _ = build_problem(n_pts=300, n_nodes=30)
    n = problem.nodes.shape[0]
    rng = np.random.RandomState(4)
    R = so3_exp(jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3))
    t = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.04)
    for wm in (0.0, 1.5):
        cfg_x = GNConfig(iters=1, w_point=1.7, w_arap=2.1, w_motion=wm,
                         assembly="blocks")
        M1, b1, sq1 = _assemble_blocks(problem, cfg_x, R, t)
        scale = float(jnp.max(jnp.abs(M1))) + 1e-12
        for asm in ("blocks_pallas", "blocks_pallas_full"):
            cfg_p = cfg_x._replace(assembly=asm)
            M2, b2, sq2 = _assemble_blocks(problem, cfg_p, R, t)
            np.testing.assert_allclose(
                np.asarray(M2), np.asarray(M1), atol=5e-5 * scale
            )
            np.testing.assert_allclose(
                np.asarray(b2), np.asarray(b1),
                atol=5e-5 * (float(jnp.max(jnp.abs(b1))) + 1e-12),
            )
            np.testing.assert_allclose(float(sq2), float(sq1), rtol=2e-5)


def test_scatter_plan_matches_direct():
    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        _assemble_blocks,
        build_pair_scatter_plan,
    )

    problem, _, _ = build_problem(n_pts=300, n_nodes=30)
    n = problem.nodes.shape[0]
    rng = np.random.RandomState(7)
    R = so3_exp(jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3))
    t = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.04)
    cfg = GNConfig(iters=1, w_point=1.3, w_arap=1.9, w_motion=0.7,
                   assembly="blocks")
    M1, b1, sq1 = _assemble_blocks(problem, cfg, R, t)
    plan = build_pair_scatter_plan(problem.point_anchors, problem.edges, n)
    assert not bool(plan.overflow)
    M2, b2, sq2 = _assemble_blocks(problem, cfg, R, t, plan=plan)
    scale = float(jnp.max(jnp.abs(M1))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(M2), np.asarray(M1), atol=1e-5 * scale
    )
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=1e-6)
    # overflow plan must fall back to the direct scatter (exact match)
    plan_o = build_pair_scatter_plan(
        problem.point_anchors, problem.edges, n, u_cap=4
    )
    assert bool(plan_o.overflow)
    M3, _, _ = _assemble_blocks(problem, cfg, R, t, plan=plan_o)
    np.testing.assert_array_equal(np.asarray(M3), np.asarray(M1))


def test_scatter_plan_in_solver():
    from occlusionfusion_tpu.solvers.gauss_newton_dense import (
        build_pair_scatter_plan,
        solve_dense,
    )

    problem, target, _ = build_problem(n_pts=300, n_nodes=30)
    n = problem.nodes.shape[0]
    plan = build_pair_scatter_plan(problem.point_anchors, problem.edges, n)
    cfg = GNConfig(iters=6, assembly="blocks", lm_damping=1e-5)
    res = solve_dense(problem, cfg, scatter_plan=plan)
    err = np.linalg.norm(
        np.asarray(res.warped_points) - np.asarray(target), axis=1
    )
    valid = np.asarray(problem.point_valid) > 0
    assert np.median(err[valid]) < 1e-3


def test_pallas_assembly_solver_converges(interp):
    from occlusionfusion_tpu.solvers.gauss_newton_dense import solve_dense

    problem, target, _ = build_problem(n_pts=300, n_nodes=30)
    cfg = GNConfig(iters=6, assembly="blocks_pallas", lm_damping=1e-5)
    res = solve_dense(problem, cfg)
    err = np.linalg.norm(
        np.asarray(res.warped_points) - np.asarray(target), axis=1
    )
    valid = np.asarray(problem.point_valid) > 0
    assert np.median(err[valid]) < 1e-3
