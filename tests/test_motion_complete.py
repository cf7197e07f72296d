"""Motion-completion network tests.

Oracles:
  * torch.nn.LSTM — the exact module family the reference checkpoint was
    trained with — must match our lax.scan LSTM bit-for-bit (f32).
  * a direct numpy edge-loop implementation of PyG TransformerConv
    semantics for the attention layer.
  * padding invariance: growing the padded buckets must not change the
    outputs on real nodes (this is what makes static shapes safe).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.models.motion_complete import (
    init_params,
    lstm_forward,
    transformer_conv,
    motion_complete_forward,
)
from occlusionfusion_tpu.fusion.motion_runner import pad_pyramid


def numpy_transformer_conv(p, x, edge_src, edge_dst, n):
    """Edge-loop oracle of PyG TransformerConv (heads=1)."""
    W = {k: np.asarray(v["weight"]) for k, v in p.items()}
    b = {k: np.asarray(v["bias"]) for k, v in p.items()}
    q = x @ W["lin_query"].T + b["lin_query"]
    k_ = x @ W["lin_key"].T + b["lin_key"]
    v = x @ W["lin_value"].T + b["lin_value"]
    C = x.shape[1]
    out = x @ W["lin_skip"].T + b["lin_skip"]
    for i in range(n):
        incoming = [e for e in range(len(edge_src)) if edge_dst[e] == i]
        if not incoming:
            continue
        logits = np.array(
            [q[i] @ k_[edge_src[e]] / np.sqrt(C) for e in incoming]
        )
        a = np.exp(logits - logits.max())
        a = a / (a.sum() + 1e-16)
        msg = sum(a[j] * v[edge_src[e]] for j, e in enumerate(incoming))
        out[i] += msg
    return out


class TestTransformerConv:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(0)
        n, C = 9, 32
        params = init_params(jax.random.PRNGKey(0))
        p = params["conv0"]
        x = rng.randn(n, C).astype(np.float32)
        # random graph, 3 out-edges per node
        edge_src = np.repeat(np.arange(n), 3)
        edge_dst = rng.randint(0, n, size=n * 3)
        got = transformer_conv(
            p,
            jnp.asarray(x),
            jnp.asarray(edge_src.astype(np.int32)),
            jnp.asarray(edge_dst.astype(np.int32)),
            jnp.ones(n * 3, bool),
            n,
        )
        want = numpy_transformer_conv(p, x, edge_src, edge_dst, n)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_isolated_node_gets_skip_only(self):
        params = init_params(jax.random.PRNGKey(1))
        p = params["conv0"]
        x = jnp.asarray(np.random.RandomState(1).randn(4, 32), jnp.float32)
        # node 3 receives no edges
        edge_src = jnp.asarray([0, 1, 2], jnp.int32)
        edge_dst = jnp.asarray([1, 2, 0], jnp.int32)
        out = transformer_conv(p, x, edge_src, edge_dst, jnp.ones(3, bool), 4)
        skip = (
            jnp.einsum("ni,oi->no", x, p["lin_skip"]["weight"])
            + p["lin_skip"]["bias"]
        )
        np.testing.assert_allclose(out[3], skip[3], atol=1e-5)

    def test_masked_edges_ignored(self):
        params = init_params(jax.random.PRNGKey(2))
        p = params["conv0"]
        x = jnp.asarray(np.random.RandomState(2).randn(4, 32), jnp.float32)
        es = jnp.asarray([0, 1, 2, 3], jnp.int32)
        ed = jnp.asarray([1, 2, 0, 1], jnp.int32)
        full_mask = jnp.asarray([True, True, True, False])
        out_masked = transformer_conv(p, x, es, ed, full_mask, 4)
        out_dropped = transformer_conv(p, x, es[:3], ed[:3], jnp.ones(3, bool), 4)
        np.testing.assert_allclose(out_masked, out_dropped, atol=1e-6)


class TestLSTM:
    def test_matches_torch_lstm(self):
        import torch

        T, B, H = 7, 5, 32
        torch_lstm = torch.nn.LSTM(
            input_size=4, hidden_size=H, num_layers=2, batch_first=False
        )
        p = {
            name: jnp.asarray(t.detach().numpy())
            for name, t in torch_lstm.named_parameters()
        }
        x = np.random.RandomState(3).randn(T, B, 4).astype(np.float32)
        with torch.no_grad():
            want, _ = torch_lstm(torch.from_numpy(x))
        got = lstm_forward(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def _tiny_pyramid_inputs(n0, rng):
    """Build a random but *valid* 4-level pyramid of real (unpadded) data."""
    sizes = [n0, max(n0 // 3, 2), max(n0 // 9, 2), max(n0 // 18, 2)]
    ks = (8, 6, 4, 3)
    nn = [
        rng.randint(0, sizes[l], size=(sizes[l], ks[l])).astype(np.int16)
        for l in range(4)
    ]
    down = [
        np.sort(rng.choice(sizes[l], size=sizes[l + 1], replace=False)).astype(
            np.int16
        )
        for l in range(3)
    ]
    up = [
        rng.randint(0, sizes[l + 1], size=sizes[l]).astype(np.int16)
        for l in range(3)
    ]
    return nn, down, up


class TestForwardPaddingInvariance:
    def test_outputs_independent_of_padding(self):
        rng = np.random.RandomState(4)
        n0 = 40
        nn, down, up = _tiny_pyramid_inputs(n0, rng)
        params = init_params(jax.random.PRNGKey(5))
        pos = rng.randn(n0, 3).astype(np.float32)
        curr = rng.randn(n0, 4).astype(np.float32)
        hist = rng.randn(16, n0, 4).astype(np.float32)

        outs = []
        for caps in [(64, 16, 8, 4), (128, 32, 16, 8)]:
            pyr = pad_pyramid(nn, down, up, level_sizes=caps)
            pos_p = np.zeros((caps[0], 3), np.float32)
            pos_p[:n0] = pos
            curr_p = np.zeros((caps[0], 4), np.float32)
            curr_p[:n0] = curr
            hist_p = np.zeros((16, caps[0], 4), np.float32)
            hist_p[:, :n0] = hist
            pred = motion_complete_forward(
                params,
                jnp.asarray(pos_p),
                jnp.asarray(curr_p),
                jnp.asarray(hist_p),
                jnp.int32(16),
                pyr,
            )
            outs.append(np.asarray(pred[:n0]))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)

    def test_sigma_positive(self):
        rng = np.random.RandomState(6)
        nn, down, up = _tiny_pyramid_inputs(30, rng)
        params = init_params(jax.random.PRNGKey(7))
        caps = (64, 16, 8, 4)
        pyr = pad_pyramid(nn, down, up, level_sizes=caps)
        pred = motion_complete_forward(
            params,
            jnp.zeros((64, 3)),
            jnp.zeros((64, 4)),
            jnp.zeros((16, 64, 4)),
            jnp.int32(1),
            pyr,
        )
        assert bool(jnp.all(pred[:, 3] >= 0))
