"""End-to-end parity: jitted motion runner vs an independent numpy oracle.

The oracle replays the documented reference demo behavior
(rigid factor-out -> cm scale -> sigma normalize -> history chain ->
LSTM+GNN -> eq.7 confidence) with plain numpy edge loops and torch's LSTM,
using the *real* pretrained checkpoint and the real demo fixture frames.
Any drift in the runner's ring buffer, normalization chain, padding or
segment ops shows up here as a frame-over-frame divergence.

Skipped when the reference fixture or converted weights are absent.
"""

import os

import numpy as np
import pytest

REF_INPUT = "/root/reference/data/input"
WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "motion_complete.npz")

needs_fixture = pytest.mark.skipif(
    not (os.path.isdir(REF_INPUT) and os.path.exists(WEIGHTS)),
    reason="reference demo fixture / converted weights not available",
)


def torch_lstm_last(params, seq):
    """Run the 2-layer LSTM via torch with checkpoint weights; return h_T."""
    import torch

    lstm = torch.nn.LSTM(input_size=4, hidden_size=32, num_layers=2)
    sd = {}
    for layer in range(2):
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            key = f"{name}_l{layer}"
            sd[key] = torch.from_numpy(np.asarray(params["seq_encoder"][key]))
    lstm.load_state_dict(sd)
    with torch.no_grad():
        out, _ = lstm(torch.from_numpy(seq.astype(np.float32)))
    return out[-1].numpy()


def np_linear(p, x):
    return x @ np.asarray(p["weight"]).T + np.asarray(p["bias"])


def np_layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["weight"]) + np.asarray(
        p["bias"]
    )


def np_tconv(p, x, edges_src, edges_dst):
    q = np_linear(p["lin_query"], x)
    k = np_linear(p["lin_key"], x)
    v = np_linear(p["lin_value"], x)
    out = np_linear(p["lin_skip"], x)
    C = x.shape[1]
    logits = (q[edges_dst] * k[edges_src]).sum(-1) / np.sqrt(C)
    for i in range(x.shape[0]):
        sel = edges_dst == i
        if not sel.any():
            continue
        lg = logits[sel]
        a = np.exp(lg - lg.max())
        a = a / (a.sum() + 1e-16)
        out[i] += (a[:, None] * v[edges_src[sel]]).sum(0)
    return out


def np_block(p, x, es, ed):
    h = np_layer_norm(p["norm"], x)
    h = np.maximum(h, 0.0)
    h = np_tconv(p["conv"], h, es, ed)
    return x + h


def np_rigid_icp(src, dst):
    cs, cd = src.mean(0), dst.mean(0)
    H = (src - cs).T @ (dst - cd)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return R, t


class NumpyDemoOracle:
    """Stateful replay of the demo preprocessing + network in numpy."""

    def __init__(self, params):
        self.p = params
        self.hist = None
        self.std_prev = None
        self.prev_node = None

    def edges(self, nn):
        n, k = nn.shape
        return np.repeat(np.arange(n), k), nn.reshape(-1).astype(np.int64)

    def run(self, node, pyd, prev_node):
        pos = node[:, :3].astype(np.float64)
        motion = node[:, 3:6].astype(np.float64)
        vis = node[:, -1] > 0.5
        n = pos.shape[0]

        R, t = np_rigid_icp(pos[vis], pos[vis] + motion[vis])
        rigid = pos @ R.T + t - pos
        nonrigid = motion - rigid
        curr = np.zeros((n, 4))
        curr[vis, :3] = nonrigid[vis] * 100.0
        std = np.mean(np.std(curr[vis, :3], axis=0)) + 0.1
        curr[vis, :3] /= std
        curr[:, 3] = vis

        prev = np.zeros((n, 4))
        prev[:, 3] = 1.0
        if prev_node is not None:
            ppos = prev_node[:, :3].astype(np.float64)
            pvis = prev_node[:, -1] > 0.5
            pn = ppos.shape[0]
            pmotion = pos[:pn] - ppos
            Rp, tp = np_rigid_icp(ppos[pvis], ppos[pvis] + pmotion[pvis])
            rigid_p = ppos @ Rp.T + tp - ppos
            prev[:pn, :3] = (pmotion - rigid_p) * 100.0

        if self.hist is None:
            self.hist = np.zeros((1, n, 4))
        else:
            seq_len = self.hist.shape[0]
            pn = self.hist.shape[1]
            drop = 1 if seq_len == 16 else 0
            seq_len = min(seq_len + 1, 16)
            temp = np.zeros((seq_len, n, 4))
            temp[:-1, :pn, :] = self.hist[drop:] * self.std_prev / std
            temp[-1, :pn, :] = prev[:pn] / std
            self.hist = temp
        self.std_prev = std

        pos_c = pos - pos.mean(0)

        # network
        f32 = np.float32
        seq_feat = torch_lstm_last(self.p, self.hist.astype(f32))
        seq_pred = np_linear(self.p["seq_linear"], seq_feat)
        x = np_linear(
            self.p["node_encoder"],
            np.concatenate([pos_c.astype(f32), seq_pred, curr.astype(f32)], -1),
        )
        nns = [pyd[f"nn_index_l{l}"] for l in range(4)]
        es, ed = zip(*(self.edges(nn) for nn in nns))
        down = [pyd[f"down_sample_idx{i}"].astype(np.int64) for i in (1, 2, 3)]
        up = [pyd[f"up_sample_idx{i}"].astype(np.int64) for i in (1, 2, 3)]

        f0 = np_tconv(self.p["conv0"], x, es[0], ed[0])
        f1 = np_block(self.p["layer11"], f0, es[0], ed[0])
        f1 = np_block(self.p["layer12"], f1, es[0], ed[0])
        f2 = f1[down[0]]
        f2 = np_block(self.p["layer21"], f2, es[1], ed[1])
        f2 = np_block(self.p["layer22"], f2, es[1], ed[1])
        f3 = f2[down[1]]
        f3 = np_block(self.p["layer31"], f3, es[2], ed[2])
        f3 = np_block(self.p["layer32"], f3, es[2], ed[2])
        f4 = f3[down[2]]
        f4 = np_block(self.p["layer41"], f4, es[3], ed[3])
        f4 = np_block(self.p["layer42"], f4, es[3], ed[3])
        f5 = f4[up[2]]
        f5 = np_block(self.p["layer51"], np.concatenate([f5, f3], -1), es[2], ed[2])
        f5 = np_block(self.p["layer52"], f5, es[2], ed[2])
        f6 = f5[up[1]]
        f6 = np_block(self.p["layer61"], np.concatenate([f6, f2], -1), es[1], ed[1])
        f6 = np_block(self.p["layer62"], f6, es[1], ed[1])
        f7 = f6[up[0]]
        f7 = np_block(self.p["layer71"], np.concatenate([f7, f1], -1), es[0], ed[0])
        f7 = np_block(self.p["layer72"], f7, es[0], ed[0])
        out = np.maximum(np_layer_norm(self.p["norm_out"], f7), 0.0)
        pred = np_linear(self.p["lin"], out)
        sigma = np.log1p(np.exp(-np.abs(pred[:, -1]))) + np.maximum(pred[:, -1], 0)
        mu = pred[:, :3]

        conf = np.exp(-4.0 * np.square(sigma / (np.linalg.norm(mu, axis=1) + 1.0)))
        motion_out = mu * std / 100.0 + rigid
        return motion_out, conf


@needs_fixture
def test_runner_matches_numpy_oracle_over_frames():
    from occlusionfusion_tpu.models.checkpoint import load_params
    from occlusionfusion_tpu.fusion.motion_runner import MotionCompletionRunner

    params = load_params(WEIGHTS)
    oracle = NumpyDemoOracle(params)
    runner = MotionCompletionRunner(params)

    prev_node = None
    for frame_id in range(1, 5):
        node = np.load(os.path.join(REF_INPUT, "node", f"{frame_id:04d}.npy"))
        pyd = dict(
            np.load(os.path.join(REF_INPUT, "graph", f"{frame_id:04d}.npz"))
        )
        want_motion, want_conf = oracle.run(node, pyd, prev_node)
        got_motion, got_conf = runner.run_frame(
            node_pos=node[:, :3],
            node_motion=node[:, 3:6],
            visible=node[:, -1] > 0.5,
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )
        # motions are meters; demand parity well under a tenth of a mm
        np.testing.assert_allclose(
            got_motion, want_motion, atol=5e-5, err_msg=f"frame {frame_id} motion"
        )
        np.testing.assert_allclose(
            got_conf, want_conf, atol=5e-3, err_msg=f"frame {frame_id} confidence"
        )
        prev_node = node
