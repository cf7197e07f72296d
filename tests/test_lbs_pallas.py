"""Pallas LBS kernel vs the XLA twin (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.geometry import so3_exp, skinning_weights
from occlusionfusion_tpu.ops import lbs


@pytest.fixture()
def setup():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(500, 3).astype(np.float32) * 0.3)
    nodes = jnp.asarray(rng.randn(40, 3).astype(np.float32) * 0.3)
    node_valid = jnp.ones(40, bool)
    wf = W.create_warpfield(nodes, node_valid)
    R = so3_exp(jnp.asarray(rng.randn(40, 3).astype(np.float32) * 0.4))
    t = jnp.asarray(rng.randn(40, 3).astype(np.float32) * 0.05)
    wf = W.update_transforms(wf, R, t)
    anchors, weights, valid = skinning_weights(
        pts, nodes, node_valid, node_coverage=0.3, k=4
    )
    return pts, anchors, weights, valid, wf


def test_pallas_matches_lax(setup, monkeypatch):
    pts, anchors, weights, valid, wf = setup
    want = lbs.lbs_warp_lax(pts, anchors, weights, valid, wf)
    # interpret mode on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(lbs.pl, "pallas_call", interp)
    got = lbs.lbs_warp_pallas(pts, anchors, weights, valid, wf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_invalid_points_pass_through(setup, monkeypatch):
    pts, anchors, weights, valid, wf = setup
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(lbs.pl, "pallas_call", interp)
    none_valid = jnp.zeros_like(valid)
    got = lbs.lbs_warp_pallas(pts, anchors, weights, none_valid, wf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pts), atol=1e-6)


def test_dense_matches_lax(setup):
    pts, anchors, weights, valid, wf = setup
    want = lbs.lbs_warp_lax(pts, anchors, weights, valid, wf)
    dense = lbs.precompute_dense_skin(anchors, weights, valid, 40)
    got = lbs.lbs_warp_dense(pts, valid, dense, wf)
    # split-bf16 3-term product: ~2^-17 relative of the transform scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_dense_invalid_points_pass_through(setup):
    pts, anchors, weights, valid, wf = setup
    none_valid = jnp.zeros_like(valid)
    dense = lbs.precompute_dense_skin(anchors, weights, none_valid, 40)
    got = lbs.lbs_warp_dense(pts, none_valid, dense, wf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pts), atol=1e-6)


def test_dense_in_fused_step_matches_xla(setup):
    """The fused step with lbs_impl='dense' must track the XLA path."""
    pts, anchors, weights, valid, wf = setup
    dense = lbs.precompute_dense_skin(anchors, weights, valid, 40)
    a = lbs.lbs_warp_dense(pts, valid, dense, wf)
    b = lbs.lbs_warp_lax(pts, anchors, weights, valid, wf)
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    assert err < 5e-5, err
