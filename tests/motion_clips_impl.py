"""DT4D motion-training data pipeline: clip -> MotionBatch samples, and a
short training run must reduce the NLL on them."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from occlusionfusion_tpu.data.deformingthings4d import save_anime
from occlusionfusion_tpu.data.motion_clips import (
    MotionClipConfig,
    clip_to_training_samples,
)
from occlusionfusion_tpu.models.motion_complete import init_params
from occlusionfusion_tpu.models.motion_train import make_train_step


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    # deforming sphere mesh (marching cubes gives real faces)
    from occlusionfusion_tpu.graph import native

    n = 20
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    sdf = np.linalg.norm(g - c, axis=0) - 6.0
    verts, faces = native.marching_cubes(sdf)
    verts = (verts * 0.02).astype(np.float32)
    rng = np.random.RandomState(0)
    n_frames = 8
    offs = []
    for f in range(1, n_frames):
        bend = 0.004 * f * np.stack(
            [np.sin(verts[:, 1] * 8), np.zeros(len(verts)), np.zeros(len(verts))],
            -1,
        )
        offs.append(bend.astype(np.float32))
    path = str(tmp_path_factory.mktemp("clips") / "sphere.anime")
    save_anime(path, verts, faces, np.stack(offs))
    return path


class TestMotionClips:
    def test_samples_structure(self, clip):
        samples, graph = clip_to_training_samples(
            clip, MotionClipConfig(node_coverage=0.05), max_frames=6
        )
        assert len(samples) == 5
        s = samples[2]
        n = graph.nodes.shape[0]
        assert s.pos.shape == (256, 3)
        assert float(s.node_mask.sum()) == n
        # visible entries are sigma-normalized; gt finite
        assert np.isfinite(s.gt_motion).all()
        assert s.history_len == 3

    def test_history_chain_grows(self, clip):
        samples, _ = clip_to_training_samples(clip, max_frames=7)
        lens = [int(s.history_len) for s in samples]
        assert lens == [1, 2, 3, 4, 5, 6]

    def test_training_reduces_loss(self, clip):
        samples, _ = clip_to_training_samples(clip, max_frames=8)
        params = init_params(jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        train_step = make_train_step(optimizer)
        batch = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *samples[:4]
        )
        first = None
        for _ in range(15):
            params, opt_state, loss = train_step(params, opt_state, batch)
            if first is None:
                first = float(loss)
        assert float(loss) < first, (first, float(loss))


WEIGHTS = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "checkpoints",
    "motion_complete.npz",
)


@pytest.mark.skipif(
    not __import__("os").path.exists(WEIGHTS), reason="no converted weights"
)
def test_pretrained_beats_zero_motion_on_occluded(tmp_path):
    """The converted reference checkpoint must beat the zero-motion
    baseline on OCCLUDED nodes of a synthetic clip zero-shot — a semantic
    guard on both the checkpoint conversion and the clip pipeline
    (measured: EPE ~0.52 vs baseline ~0.65 normalized units). Needs a
    clip with SUBSTANTIAL nonrigid motion: on near-rigid clips the zero
    baseline is unbeatable by construction."""
    from occlusionfusion_tpu.graph import native
    from occlusionfusion_tpu.models.checkpoint import load_params
    from occlusionfusion_tpu.models.motion_complete import (
        motion_complete_forward,
    )

    rng = np.random.RandomState(7)
    n = 22
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    sdf = np.linalg.norm(g - c, axis=0) - 7.0
    verts, faces = native.marching_cubes(sdf)
    verts = (verts * 0.018).astype(np.float32)
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    offs = []
    for f in range(1, 12):
        phase = f * 0.35
        bend = (
            0.006 * np.sin(verts @ ax * 10 + phase)[:, None] * rng.randn(1, 3)
        )
        offs.append(bend.astype(np.float32))
    clip_path = str(tmp_path / "deforming.anime")
    save_anime(clip_path, verts, faces, np.stack(offs))

    params = jax.tree.map(jnp.asarray, load_params(WEIGHTS))
    samples, _ = clip_to_training_samples(
        clip_path,
        MotionClipConfig(node_coverage=0.05, visibility_dropout=0.4),
        seed=3,
    )
    errs, base = [], []
    for s in samples:
        pred = motion_complete_forward(
            params,
            jnp.asarray(s.pos),
            jnp.asarray(s.curr_motion),
            jnp.asarray(s.history),
            jnp.int32(s.history_len),
            jax.tree.map(jnp.asarray, s.pyramid),
        )
        mu = np.asarray(pred[:, :3])
        occ = (s.curr_motion[:, 3] < 0.5) & (s.node_mask > 0.5)
        if not occ.any():
            continue
        errs.append(np.linalg.norm(mu[occ] - s.gt_motion[occ], axis=1).mean())
        base.append(np.linalg.norm(s.gt_motion[occ], axis=1).mean())
    assert np.mean(errs) < np.mean(base), (np.mean(errs), np.mean(base))
