"""Metric and training-loss unit tests (closed-form cases)."""

import numpy as np
import jax.numpy as jnp

from occlusionfusion_tpu.utils import metrics as M
from occlusionfusion_tpu.models.deform_loss import (
    DeformLossWeights,
    deform_loss,
    focal_correspondence_loss,
    graph_l2,
    robust_l1,
)
from occlusionfusion_tpu.geometry import so3_exp


class TestMetrics:
    def test_epe_masked(self):
        pred = jnp.zeros((4, 3))
        gt = jnp.ones((4, 3))
        mask = jnp.asarray([True, True, False, False])
        np.testing.assert_allclose(
            float(M.epe_3d(pred, gt, mask)), np.sqrt(3.0), atol=1e-6
        )

    def test_accuracy_threshold(self):
        pred = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
        gt = jnp.zeros((2, 3))
        acc = M.accuracy_at(pred, gt, jnp.ones(2, bool), threshold=0.5)
        np.testing.assert_allclose(float(acc), 0.5)

    def test_inlier_ratio(self):
        warped = jnp.asarray([[0.0, 0, 0], [0.0, 0, 0]])
        tgt = jnp.asarray([[0.01, 0, 0], [1.0, 0, 0]])
        r = M.inlier_ratio(
            warped,
            tgt,
            jnp.asarray([0, 1]),
            jnp.asarray([0, 1]),
            jnp.ones(2, bool),
            threshold=0.04,
        )
        np.testing.assert_allclose(float(r), 0.5)

    def test_registration_recall(self):
        R = so3_exp(jnp.asarray([0.0, 0.0, 0.1]))  # ~5.7 deg
        ok = M.registration_recall(
            R, jnp.zeros(3), jnp.eye(3), jnp.zeros(3)
        )
        assert bool(ok)
        R2 = so3_exp(jnp.asarray([0.0, 0.0, 0.5]))  # ~28 deg
        assert not bool(
            M.registration_recall(R2, jnp.zeros(3), jnp.eye(3), jnp.zeros(3))
        )

    def test_valid_solve_ratio(self):
        np.testing.assert_allclose(
            float(M.valid_solve_ratio(jnp.asarray([True, False, True, True]))),
            0.75,
        )


class TestLosses:
    def test_robust_l1_at_zero(self):
        v = robust_l1(jnp.zeros((3, 2)), jnp.zeros((3, 2)), jnp.ones(3, bool))
        np.testing.assert_allclose(float(v), 1e-3, atol=1e-6)

    def test_graph_l2(self):
        pred = jnp.ones((2, 3))
        gt = jnp.zeros((2, 3))
        np.testing.assert_allclose(
            float(graph_l2(pred, gt, jnp.ones(2, bool))), 3.0
        )

    def test_deform_loss_combines(self):
        w = DeformLossWeights()
        total = deform_loss(
            w,
            jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.ones(2, bool),
            jnp.zeros((2, 3)), jnp.zeros((2, 3)), jnp.ones(2, bool),
            jnp.zeros((2, 3)), jnp.zeros((2, 3)), jnp.ones(2, bool),
        )
        assert float(total) < 0.02  # only the robust-L1 eps floor remains

    def test_focal_loss_prefers_correct_matches(self):
        gt = jnp.eye(3)
        valid = jnp.ones((3, 3), bool)
        good = focal_correspondence_loss(jnp.eye(3) * 0.9 + 0.01, gt, valid)
        bad = focal_correspondence_loss(
            jnp.ones((3, 3)) / 3.0, gt, valid
        )
        assert float(good) < float(bad)
