"""Golden regression: the demo motion outputs for selected frames were
captured from the oracle-validated implementation (tests/golden/).
Any refactor that drifts the numerics shows up here immediately."""

import os

import numpy as np
import pytest

REF_INPUT = "/root/reference/data/input"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "demo_motion_frames.npz")
WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "motion_complete.npz"
)

needs_fixture = pytest.mark.skipif(
    not (os.path.isdir(REF_INPUT) and os.path.exists(GOLDEN)
         and os.path.exists(WEIGHTS)),
    reason="golden fixture unavailable",
)


@needs_fixture
def test_demo_outputs_match_golden():
    from occlusionfusion_tpu.models.checkpoint import load_params
    from occlusionfusion_tpu.fusion.motion_runner import MotionCompletionRunner

    golden = dict(np.load(GOLDEN))
    params = load_params(WEIGHTS)
    runner = MotionCompletionRunner(params)
    for fid in range(1, 33):
        nf = np.load(os.path.join(REF_INPUT, "node", f"{fid:04d}.npy"))
        pyd = dict(
            np.load(os.path.join(REF_INPUT, "graph", f"{fid:04d}.npz"))
        )
        m, c = runner.run_frame(
            node_pos=nf[:, :3],
            node_motion=nf[:, 3:6],
            visible=nf[:, -1] > 0.5,
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )
        if fid in (1, 8, 16, 32):
            np.testing.assert_allclose(
                m, golden[f"motion_{fid}"], atol=1e-5,
                err_msg=f"frame {fid} motion drifted from golden",
            )
            np.testing.assert_allclose(
                c, golden[f"conf_{fid}"], atol=1e-4,
                err_msg=f"frame {fid} confidence drifted from golden",
            )
