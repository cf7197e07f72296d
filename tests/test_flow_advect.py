"""flow_mode='advect': the flow-guided projective hybrid.

The tangential-drift mechanism (docs/EVAL_MATRIX.md regime 1): plain
projective association re-associates ALONG THE RAY, so on a
fully-visible surface it measures ~zero tangential motion and
fill-mode flow never engages (its rescue condition never fires) —
tangential drift goes uncorrected. Advect mode moves each projection
by the optical flow first and THEN takes the exact along-ray depth at
the advected pixel through the same-surface-gated bilinear association
(``correspondence.depth_association_at_pixels``), combining flow's
tangential signal with projective's depth accuracy (the reference
instead lifts the target point image bilinearly at the flowed pixel,
``run_model.py:115-217`` — the corrupted-lift failure override mode
measures)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.fusion.correspondence import (
    depth_association_at_pixels,
    projective_correspondences,
)
from occlusionfusion_tpu.geometry.camera import Intrinsics

INTR = Intrinsics(
    np.float32(150.0), np.float32(150.0), np.float32(32.0), np.float32(32.0)
)
H = W = 64


class TestDepthAssociationAtPixels:
    def test_exact_depth_on_plane_at_continuous_pixels(self):
        depth = jnp.full((H, W), 0.5, jnp.float32)
        u = jnp.asarray([10.25, 31.9, 50.5], jnp.float32)
        v = jnp.asarray([12.75, 31.1, 40.0], jnp.float32)
        z_ref = jnp.full(3, 0.5, jnp.float32)
        t, ok = depth_association_at_pixels(u, v, z_ref, depth, INTR, 0.05)
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(t[:, 2]), 0.5, atol=1e-6)
        # backprojected at the query pixel itself
        np.testing.assert_allclose(
            np.asarray(t[:, 0]),
            (np.asarray(u) - float(INTR.cx)) / float(INTR.fx) * 0.5,
            atol=1e-6,
        )

    def test_step_edge_never_blends_surfaces(self):
        depth = np.full((H, W), 1.0, np.float32)
        depth[:, :32] = 0.5  # foreground half-plane
        depth = jnp.asarray(depth)
        # query exactly on the edge between columns 31 (0.5) and 32 (1.0)
        u = jnp.asarray([31.5, 31.5], jnp.float32)
        v = jnp.asarray([20.0, 20.0], jnp.float32)
        z_ref = jnp.asarray([0.5, 1.0], jnp.float32)
        t, ok = depth_association_at_pixels(u, v, z_ref, depth, INTR, 0.05)
        assert bool(ok.all())
        # each query sees ONLY its own surface's depth, never 0.75
        np.testing.assert_allclose(np.asarray(t[:, 2]), [0.5, 1.0], atol=1e-6)

    def test_invalid_when_no_same_surface_corner(self):
        depth = jnp.full((H, W), 1.0, jnp.float32)
        u = jnp.asarray([20.0], jnp.float32)
        v = jnp.asarray([20.0], jnp.float32)
        z_ref = jnp.asarray([0.5], jnp.float32)  # 0.5 m off the surface
        _, ok = depth_association_at_pixels(u, v, z_ref, depth, INTR, 0.05)
        assert not bool(ok.any())

    def test_zero_depth_pixels_do_not_vote(self):
        depth = np.zeros((H, W), np.float32)
        depth[20, 20] = 0.5
        depth = jnp.asarray(depth)
        u = jnp.asarray([20.3], jnp.float32)
        v = jnp.asarray([20.0], jnp.float32)
        z_ref = jnp.asarray([0.5], jnp.float32)
        t, ok = depth_association_at_pixels(u, v, z_ref, depth, INTR, 0.05)
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(t[0, 2]), 0.5, atol=1e-6)

    def test_projective_parity_at_own_projection(self):
        """Querying at a point's own projection reproduces
        projective_correspondences (the refactor is behavior-neutral)."""
        rng = np.random.RandomState(0)
        depth = (0.4 + 0.2 * rng.rand(H, W)).astype(np.float32)
        pts = np.stack(
            [
                (rng.rand(32) * 40 + 10 - float(INTR.cx))
                / float(INTR.fx) * 0.5,
                (rng.rand(32) * 40 + 10 - float(INTR.cy))
                / float(INTR.fy) * 0.5,
                np.full(32, 0.5, np.float32),
            ],
            -1,
        ).astype(np.float32)
        valid = np.ones(32, bool)
        t_ref, v_ref = projective_correspondences(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(depth), INTR,
            max_depth_diff=0.3,
        )
        z = pts[:, 2]
        u = pts[:, 0] / z * float(INTR.fx) + float(INTR.cx)
        v = pts[:, 1] / z * float(INTR.fy) + float(INTR.cy)
        t_new, v_new = depth_association_at_pixels(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(z),
            jnp.asarray(depth), INTR, 0.3,
        )
        np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_new))
        np.testing.assert_allclose(
            np.asarray(t_ref), np.asarray(t_new), atol=1e-6
        )


class TestTangentialMechanism:
    """The structural argument for advect, as an executable fact."""

    def test_projective_is_tangentially_blind_advect_is_not(self):
        # flat plane at z=0.5; the surface slides +3 px in u between
        # frames; the depth image is IDENTICAL (tangential motion on a
        # textureless-depth plane)
        depth = jnp.full((H, W), 0.5, jnp.float32)
        gt_flow_px = 3.0
        u = jnp.asarray([20.0, 30.0, 40.0], jnp.float32)
        v = jnp.asarray([32.0, 32.0, 32.0], jnp.float32)
        z = jnp.full(3, 0.5, jnp.float32)
        pts = jnp.stack(
            [
                (u - INTR.cx) / INTR.fx * z,
                (v - INTR.cy) / INTR.fy * z,
                z,
            ],
            -1,
        )
        # projective: target == the point itself -> measured motion 0
        t_proj, okp = projective_correspondences(
            pts, jnp.ones(3, bool), depth, INTR, max_depth_diff=0.05
        )
        assert bool(okp.all())
        np.testing.assert_allclose(
            np.asarray(t_proj), np.asarray(pts), atol=1e-6
        )
        # advect: association at the flowed pixel -> measured motion =
        # the true tangential displacement, depth exact
        t_adv, oka = depth_association_at_pixels(
            u + gt_flow_px, v, z, depth, INTR, 0.05
        )
        assert bool(oka.all())
        motion = np.asarray(t_adv - pts)
        np.testing.assert_allclose(
            motion[:, 0], gt_flow_px / float(INTR.fx) * 0.5, atol=1e-6
        )
        np.testing.assert_allclose(motion[:, 1:], 0.0, atol=1e-6)


def test_advect_engines_module():
    """Launcher: the full-engine advect tests (3 full-pipeline compiles)
    run in a FRESH interpreter (flow_advect_engines_impl.py).

    Round-5 finding: the plain full suite deterministically segfaults
    the XLA:CPU compiler at test_lepard.py::test_full_depth_config
    (69%) once the session's in-process compile count crosses a
    threshold — these new heavy compiles were exactly the round-5
    addition that pushed the (previously green) quiet-host run over
    it. Same isolation pattern as test_motion_clips /
    test_tracking_train."""
    import os
    import subprocess
    import sys

    impl = os.path.join(
        os.path.dirname(__file__), "flow_advect_engines_impl.py"
    )
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]


def test_bad_flow_mode_rejected():
    from tests.test_fused_perception import config

    with pytest.raises(ValueError, match="flow_mode"):
        config(flow_mode="telepathy")
