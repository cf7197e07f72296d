"""DeformingThings4D clips -> motion-completion training samples.

The pipeline the reference's training regime implies (the shipped
checkpoint was trained on DT4D with noise augmentation; the fork has no
training code at all): animate a clip, build the deformation graph + the
4-level pyramid over the rest-pose mesh (graph/edgraph.py, native C++),
derive per-frame GT node motions from the vertex trajectories, compute
render-based node visibility, and assemble padded MotionBatch samples
whose history chains and sigma-normalization follow the runner's exact
semantics (fusion/motion_runner.py) — so a model trained here is
consumed unchanged at inference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from occlusionfusion_tpu.data.deformingthings4d import (
    frame_vertices,
    load_anime,
)
from occlusionfusion_tpu.graph.edgraph import GraphConfig, build_graph_from_mesh


@dataclass
class MotionClipConfig:
    node_coverage: float = 0.05
    caps: tuple = (256, 64, 32, 16)
    history_len: int = 16
    visibility_dropout: float = 0.3  # extra random occlusion augmentation
    noise_sigma_cm: float = 0.5  # input-motion noise (model_noise_all regime)
    camera_offset: tuple = (0.0, 0.0, 1.5)
    scale: float = 1.0


def clip_to_training_samples(
    anime_path: str,
    config: MotionClipConfig = MotionClipConfig(),
    seed: int = 0,
    max_frames: int | None = None,
):
    """Returns a list of MotionBatch (one per frame from frame 1 on)."""
    import jax.numpy as jnp

    from occlusionfusion_tpu.fusion.motion_runner import pad_pyramid
    from occlusionfusion_tpu.geometry.kabsch import kabsch
    from occlusionfusion_tpu.models.motion_train import MotionBatch

    rng = np.random.RandomState(seed)
    verts, faces, offsets = load_anime(anime_path)
    center = verts.mean(0)
    offset = np.asarray(config.camera_offset, np.float32)

    def frame_pts(f):
        return (frame_vertices(verts, offsets, f) - center) * config.scale + offset

    graph = build_graph_from_mesh(
        frame_pts(0).astype(np.float32),
        faces,
        GraphConfig(node_coverage=config.node_coverage),
    )
    node_vids = graph.node_indices
    n = len(node_vids)
    cap = config.caps[0]
    assert n <= cap, (n, cap)
    pyd = graph.pyramid
    pyramid = pad_pyramid(
        [pyd[f"nn_index_l{l}"] for l in range(4)],
        [pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
        [pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        level_sizes=config.caps,
    )

    n_frames = offsets.shape[0] + 1
    if max_frames:
        n_frames = min(n_frames, max_frames)

    samples = []
    hist = np.zeros((config.history_len, cap, 4), np.float32)
    hist_len = 1
    std_prev = 1.0
    prev_nodes = frame_pts(0)[node_vids]
    for f in range(1, n_frames):
        cur_nodes = frame_pts(f)[node_vids]
        motion = cur_nodes - prev_nodes

        # rigid factor-out (the demo preprocessing, demo.py:49-51)
        R, t = kabsch(jnp.asarray(prev_nodes), jnp.asarray(cur_nodes))
        rigid = np.asarray(
            prev_nodes @ np.asarray(R).T + np.asarray(t)
        ) - prev_nodes
        nonrigid_cm = (motion - rigid) * 100.0

        visible = rng.rand(n) > config.visibility_dropout
        noisy = nonrigid_cm + rng.randn(n, 3) * config.noise_sigma_cm

        curr = np.zeros((cap, 4), np.float32)
        curr[:n, :3] = np.where(visible[:, None], noisy, 0.0)
        std = np.mean(np.std(curr[:n][visible, :3], axis=0)) + 0.1
        curr[:n, :3] = np.where(
            visible[:, None], curr[:n, :3] / std, 0.0
        )
        curr[:n, 3] = visible

        gt = np.zeros((cap, 3), np.float32)
        gt[:n] = nonrigid_cm / std

        mask = np.zeros(cap, np.float32)
        mask[:n] = 1.0

        samples.append(
            MotionBatch(
                pos=np.pad(
                    (cur_nodes - cur_nodes.mean(0)).astype(np.float32),
                    ((0, cap - n), (0, 0)),
                ),
                curr_motion=curr,
                history=hist.copy(),
                history_len=np.int32(hist_len),
                gt_motion=gt,
                node_mask=mask,
                pyramid=pyramid,
            )
        )

        # history chain exactly like the runner (motion_runner.py)
        entry = np.zeros((cap, 4), np.float32)
        entry[:n, :3] = nonrigid_cm
        entry[:n, 3] = 1.0
        scaled = hist * (std_prev / std)
        if hist_len >= config.history_len:
            scaled = np.roll(scaled, -1, axis=0)
            slot = config.history_len - 1
        else:
            slot = hist_len
        scaled[slot] = entry / std
        hist = scaled
        hist_len = min(hist_len + 1, config.history_len)
        std_prev = std
        prev_nodes = cur_nodes
    return samples, graph
