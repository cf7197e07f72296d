"""CLI integration: convert a synthetic clip to a fusion sequence, run
the fusion CLI on it, register a pair — all in-process (runpy) so the
conftest CPU override applies."""

import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(REPO, "scripts", name), run_name="__main__")
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    from occlusionfusion_tpu.data.deformingthings4d import save_anime
    from occlusionfusion_tpu.graph import native

    n = 20
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    sdf = np.linalg.norm(g - c, axis=0) - 6.0
    verts, faces = native.marching_cubes(sdf)
    verts = (verts * 0.02).astype(np.float32)
    offs = np.stack(
        [np.full((len(verts), 3), 0.002 * f, np.float32) for f in range(1, 6)]
    )
    path = str(tmp_path_factory.mktemp("clip") / "c.anime")
    save_anime(path, verts, faces, offs)
    return path


class TestCLIChain:
    def test_convert_then_fuse(self, clip, tmp_path):
        seq_dir = str(tmp_path / "seq")
        run_script(
            "convert_dt4d.py",
            ["--anime", clip, "--out", seq_dir, "--height", "96",
             "--width", "96", "--fx", "180"],
        )
        assert os.path.exists(os.path.join(seq_dir, "intrinsics.txt"))
        assert len(os.listdir(os.path.join(seq_dir, "depth"))) == 6

        results = str(tmp_path / "results")
        run_script(
            "run_fusion.py",
            ["--datadir", seq_dir, "--results", results,
             "--voxel_dim", "48", "--voxel_size", "0.006",
             "--node_coverage", "0.03", "--end_frame", "3",
             "--nicp_iters", "40", "--max_nodes", "256",
             "--max_points", "2048", "--no_motion_model",
             "--keyframe_interval", "1"],
        )
        assert os.path.exists(os.path.join(results, "final_mesh.ply"))
        assert os.path.exists(os.path.join(results, "convergence.json"))
        traj = os.path.join(results, "trajectory.npz")
        assert os.path.exists(traj)

        # score the exported keyframe trajectory against the converted
        # clip's exact camera-frame GT (evaluate_dt4d --trajectory)
        import json

        metrics_path = str(tmp_path / "traj_metrics.json")
        run_script(
            "evaluate_dt4d.py",
            ["--trajectory", traj,
             "--gt", os.path.join(seq_dir, "gt_vertices.npy"),
             "--out", metrics_path],
        )
        with open(metrics_path) as fh:
            metrics = json.load(fh)
        assert metrics["keyframes"] >= 2
        # the clip's motion is a pure 2 mm/frame translation; tracked
        # keyframe poses must stay within a few mm of the GT poses
        assert metrics["pose_ate_m"] < 0.01, metrics
        assert metrics["rot_err_deg"] < 5.0, metrics

    def test_register_pair(self, tmp_path):
        rng = np.random.RandomState(0)
        src = rng.randn(400, 3).astype(np.float32) * 0.2
        tgt = (src + np.asarray([0.01, 0.0, 0.02], np.float32)).astype(
            np.float32
        )
        sp = str(tmp_path / "s.npz")
        tp = str(tmp_path / "t.npz")
        np.savez(sp, points=src)
        np.savez(tp, points=tgt)
        out = str(tmp_path / "warped.ply")
        run_script(
            "register_pair.py",
            ["--source", sp, "--target", tp, "--out", out,
             "--node_coverage", "0.1", "--iters", "80", "--lr", "0.02"],
        )
        from occlusionfusion_tpu.utils.viz import load_ply

        warped, _ = load_ply(out)
        err = np.linalg.norm(warped - tgt, axis=1)
        assert np.median(err) < 0.01, np.median(err)

    def test_train_motion_on_clips(self, tmp_path):
        """Clip fine-tuning path: synthetic clips -> runner-exact samples
        -> train step + held-out occluded-EPE eval + checkpoint save."""
        out = str(tmp_path / "m.npz")
        run_script(
            "train_motion.py",
            ["--steps", "1", "--batch", "2", "--synthetic_clips", "2",
             "--eval_every", "1", "--save_every", "0", "--out", out],
        )
        from occlusionfusion_tpu.utils.snapshot import load_params

        params = load_params(out)
        assert params  # non-empty pytree round-trips

    def test_train_lepard_pyramid_flags_and_warm_start(self, tmp_path):
        """Matcher trainer: configurable pyramid, then a warm start into
        a FINER pyramid (weights are pyramid-independent; checkpoints
        store dict keys as strings, so warm start must match by
        normalized path)."""
        coarse = str(tmp_path / "coarse.npz")
        run_script(
            "train_lepard.py",
            ["--steps", "1", "--eval_every", "5", "--save_every", "0",
             "--levels", "48,24,12,8", "--first_voxel", "0.08",
             "--points", "40", "--cap", "48",
             "--max_neighbors", "8,8,8,8", "--out", coarse],
        )
        fine = str(tmp_path / "fine.npz")
        run_script(
            "train_lepard.py",
            ["--steps", "1", "--eval_every", "5", "--save_every", "0",
             "--levels", "64,32,16,8", "--first_voxel", "0.06",
             "--points", "56", "--cap", "64",
             "--max_neighbors", "8,8,8,8",
             "--warm_start", coarse, "--out", fine],
        )
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )

        params, cfg = load_lepard_checkpoint(fine)
        assert cfg.kpfcn.pyramid.level_sizes == (64, 32, 16, 8)
        assert params
