"""Chunked (lax.scan) motion runner must match the per-frame path
bit-for-bit — same state chain, one dispatch."""

import os

import numpy as np
import pytest

REF_INPUT = "/root/reference/data/input"
WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "motion_complete.npz"
)

needs_fixture = pytest.mark.skipif(
    not (os.path.isdir(REF_INPUT) and os.path.exists(WEIGHTS)),
    reason="reference demo fixture / converted weights not available",
)


def load_frame(frame_id):
    nf = np.load(os.path.join(REF_INPUT, "node", f"{frame_id:04d}.npy"))
    pyd = dict(np.load(os.path.join(REF_INPUT, "graph", f"{frame_id:04d}.npz")))
    return dict(
        node_pos=nf[:, :3],
        node_motion=nf[:, 3:6],
        visible=nf[:, -1] > 0.5,
        nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
        down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
        up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
    )


@needs_fixture
def test_chunked_matches_per_frame():
    from occlusionfusion_tpu.models.checkpoint import load_params
    from occlusionfusion_tpu.fusion.motion_runner import MotionCompletionRunner

    params = load_params(WEIGHTS)
    frames = [load_frame(i) for i in range(1, 7)]

    seq_runner = MotionCompletionRunner(params)
    seq_out = [seq_runner.run_frame(**f) for f in frames]

    chunk_runner = MotionCompletionRunner(params)
    chunk_out = chunk_runner.run_chunk(frames[:3]) + chunk_runner.run_chunk(
        frames[3:]
    )

    for f_id, ((m1, c1), (m2, c2)) in enumerate(zip(seq_out, chunk_out)):
        np.testing.assert_allclose(m1, m2, atol=1e-6, err_msg=f"frame {f_id}")
        np.testing.assert_allclose(c1, c2, atol=1e-5, err_msg=f"frame {f_id}")
