"""Occlusion-aware motion completion network (LSTM + graph-transformer U-Net).

TPU-native re-implementation of the reference MotionCompleteNet
(``motion_model.py:7-98``): an LSTM over the 16-frame non-rigid motion
history feeds, together with current visible-node motion and node
positions, a 15-conv graph-attention U-Net over the 4-level deformation
graph pyramid, predicting per-node motion mu (3) and uncertainty sigma (1).

Design differences from the reference (torch_geometric) implementation:
  * message passing is segment-softmax attention over *padded, masked,
    static-shape* edge lists (ops/segment_ops.py) — no dynamic shapes, so
    the whole forward jits once per padding bucket and runs on TPU;
  * the model is a pure function over a params pytree whose structure
    mirrors the reference checkpoint exactly, so the shipped pretrained
    weights (``checkpoints/model_noise_all.tar``) convert 1:1
    (models/checkpoint.py);
  * matmuls pin ``precision="highest"`` — the model is tiny (11->32->128
    channels) and numeric parity with the reference matters more than MXU
    throughput here.

Semantics notes (for parity review):
  * TransformerConv (heads=1, concat): out_i = W_skip x_i + b_skip +
    sum_j softmax_j((W_q x_i + b_q) . (W_k x_j + b_k) / sqrt(C)) (W_v x_j
    + b_v), aggregated over incoming edges j->i, softmax grouped by i with
    +1e-16 denominator — matching torch_geometric's TransformerConv and
    utils.softmax.
  * DeepGCN 'res+' block: x + conv(act(norm(x))) (dropout inactive at
    inference), matching torch_geometric.nn.DeepGCNLayer(block='res+').
  * LSTM: standard torch 2-layer LSTM gate order (i, f, g, o), zero
    initial state.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.ops.segment_ops import segment_softmax

HIDDEN = 32
FEATURE_DIM = 11
OUTPUT_DIM = 4
NUM_LEVELS = 4


class PyramidBatch(NamedTuple):
    """Static-shape padded graph pyramid for one frame.

    Per level l (padded node count N_l, neighbors k_l):
      edge_src[l]: [N_l * k_l] int32 — message source (the node whose
        neighbor list the edge comes from; reference demo.py:101-124
        builds edges as (node -> its neighbor), aggregation at the
        *neighbor*).
      edge_dst[l]: [N_l * k_l] int32 — message target (= nn_index values).
      edge_mask[l]: [N_l * k_l] bool — real edges only.
    down_idx[i]: [N_{i+1}] int32 indices into level i (padded with 0).
    up_idx[i]: [N_i] int32 indices into level i+1 (padded with 0).
    node_mask: [N_0] bool — real level-0 nodes.
    """

    edge_src: Sequence[jnp.ndarray]
    edge_dst: Sequence[jnp.ndarray]
    edge_mask: Sequence[jnp.ndarray]
    down_idx: Sequence[jnp.ndarray]
    up_idx: Sequence[jnp.ndarray]
    node_mask: jnp.ndarray


def _linear(p, x):
    return (
        jnp.einsum("...i,oi->...o", x, p["weight"], precision="highest") + p["bias"]
    )


def _layer_norm(p, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def transformer_conv(p, x, edge_src, edge_dst, edge_mask, num_nodes: int):
    """Graph transformer convolution (PyG TransformerConv, heads=1)."""
    C = x.shape[-1]
    q = _linear(p["lin_query"], x)
    k = _linear(p["lin_key"], x)
    v = _linear(p["lin_value"], x)
    logits = jnp.sum(q[edge_dst] * k[edge_src], axis=-1) / jnp.sqrt(
        jnp.asarray(C, x.dtype)
    )
    alpha = segment_softmax(logits, edge_dst, num_nodes, edge_mask)
    msg = jax.ops.segment_sum(
        v[edge_src] * alpha[:, None], edge_dst, num_segments=num_nodes
    )
    return msg + _linear(p["lin_skip"], x)


def deep_gcn_res_plus(p, x, edge_src, edge_dst, edge_mask, num_nodes: int):
    """'res+' pre-activation residual block: x + conv(relu(norm(x)))."""
    h = _layer_norm(p["norm"], x)
    h = jax.nn.relu(h)
    h = transformer_conv(p["conv"], h, edge_src, edge_dst, edge_mask, num_nodes)
    return x + h


def lstm_forward(p, seq, num_layers: int = 2, hidden: int = 32):
    """Torch-semantics multi-layer LSTM over time-major seq [T, B, C_in].

    Returns all top-layer hidden states [T, B, hidden].
    """
    x = seq
    for layer in range(num_layers):
        w_ih = p[f"weight_ih_l{layer}"]  # [4H, C_in]
        w_hh = p[f"weight_hh_l{layer}"]  # [4H, H]
        b = p[f"bias_ih_l{layer}"] + p[f"bias_hh_l{layer}"]  # [4H]

        def step(carry, x_t, w_ih=w_ih, w_hh=w_hh, b=b):
            h, c = carry
            gates = (
                jnp.einsum("bi,gi->bg", x_t, w_ih, precision="highest")
                + jnp.einsum("bh,gh->bg", h, w_hh, precision="highest")
                + b
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        B = x.shape[1]
        h0 = jnp.zeros((B, hidden), x.dtype)
        _, x = jax.lax.scan(step, (h0, h0), x)
    return x


def motion_complete_forward(
    params,
    curr_pos: jnp.ndarray,
    curr_motion: jnp.ndarray,
    history: jnp.ndarray,
    history_len: jnp.ndarray,
    pyramid: PyramidBatch,
) -> jnp.ndarray:
    """Forward pass. Returns [N0, 4]: (mu_x, mu_y, mu_z, softplus sigma).

    Args:
      curr_pos: [N0, 3] centered node positions.
      curr_motion: [N0, 4] normalized visible motion + visibility flag.
      history: [T_max, N0, 4] left-aligned motion history buffer.
      history_len: scalar int — number of valid history entries; the LSTM
        output is taken at index history_len - 1 (causality makes the
        zero-padded tail irrelevant).
      pyramid: padded graph pyramid.
    """
    n0 = curr_pos.shape[0]

    seq_all = lstm_forward(params["seq_encoder"], history)  # [T, N0, H]
    last = jnp.clip(history_len - 1, 0, history.shape[0] - 1)
    seq_feature = seq_all[last]  # [N0, H]
    seq_pred = _linear(params["seq_linear"], seq_feature)  # [N0, 4]

    x = _linear(
        params["node_encoder"],
        jnp.concatenate([curr_pos, seq_pred, curr_motion], axis=-1),
    )

    def conv(name, feat, level):
        return transformer_conv(
            params[name],
            feat,
            pyramid.edge_src[level],
            pyramid.edge_dst[level],
            pyramid.edge_mask[level],
            feat.shape[0],
        )

    def block(name, feat, level):
        return deep_gcn_res_plus(
            params[name],
            feat,
            pyramid.edge_src[level],
            pyramid.edge_dst[level],
            pyramid.edge_mask[level],
            feat.shape[0],
        )

    feature0 = conv("conv0", x, 0)
    feature1 = block("layer11", feature0, 0)
    feature1 = block("layer12", feature1, 0)

    feature2 = feature1[pyramid.down_idx[0]]
    feature2 = block("layer21", feature2, 1)
    feature2 = block("layer22", feature2, 1)

    feature3 = feature2[pyramid.down_idx[1]]
    feature3 = block("layer31", feature3, 2)
    feature3 = block("layer32", feature3, 2)

    feature4 = feature3[pyramid.down_idx[2]]
    feature4 = block("layer41", feature4, 3)
    feature4 = block("layer42", feature4, 3)

    feature5 = feature4[pyramid.up_idx[2]]
    feature5 = block("layer51", jnp.concatenate([feature5, feature3], -1), 2)
    feature5 = block("layer52", feature5, 2)

    feature6 = feature5[pyramid.up_idx[1]]
    feature6 = block("layer61", jnp.concatenate([feature6, feature2], -1), 1)
    feature6 = block("layer62", feature6, 1)

    feature7 = feature6[pyramid.up_idx[0]]
    feature7 = block("layer71", jnp.concatenate([feature7, feature1], -1), 0)
    feature7 = block("layer72", feature7, 0)

    out = jax.nn.relu(_layer_norm(params["norm_out"], feature7))
    pred = _linear(params["lin"], out)
    sigma = jax.nn.softplus(pred[:, -1:])
    return jnp.concatenate([pred[:, :3], sigma], axis=-1)


def init_params(key, dtype=jnp.float32):
    """Random init with the exact checkpoint pytree structure (for tests
    and training-from-scratch; pretrained weights come from
    models/checkpoint.py)."""

    def lin(key, out_d, in_d):
        k1, _ = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(in_d)
        return {
            "weight": jax.random.uniform(
                k1, (out_d, in_d), dtype, minval=-scale, maxval=scale
            ),
            "bias": jnp.zeros((out_d,), dtype),
        }

    def norm(d):
        return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def tconv(key, d):
        ks = jax.random.split(key, 4)
        return {
            "lin_key": lin(ks[0], d, d),
            "lin_query": lin(ks[1], d, d),
            "lin_value": lin(ks[2], d, d),
            "lin_skip": lin(ks[3], d, d),
        }

    keys = iter(jax.random.split(key, 64))
    H = HIDDEN
    params = {
        "node_encoder": lin(next(keys), H, FEATURE_DIM),
        "seq_linear": lin(next(keys), 4, H),
        "conv0": tconv(next(keys), H),
        "norm_out": norm(4 * H),
        "lin": lin(next(keys), OUTPUT_DIM, 4 * H),
    }
    lstm = {}
    for layer, in_d in ((0, 4), (1, H)):
        lstm[f"weight_ih_l{layer}"] = jax.random.uniform(
            next(keys), (4 * H, in_d), dtype, minval=-0.1, maxval=0.1
        )
        lstm[f"weight_hh_l{layer}"] = jax.random.uniform(
            next(keys), (4 * H, H), dtype, minval=-0.1, maxval=0.1
        )
        lstm[f"bias_ih_l{layer}"] = jnp.zeros((4 * H,), dtype)
        lstm[f"bias_hh_l{layer}"] = jnp.zeros((4 * H,), dtype)
    params["seq_encoder"] = lstm
    widths = {1: H, 2: H, 3: H, 4: H, 5: 2 * H, 6: 3 * H, 7: 4 * H}
    for lv, width in widths.items():
        for sub in (1, 2):
            params[f"layer{lv}{sub}"] = {
                "conv": tconv(next(keys), width),
                "norm": norm(width),
            }
    return params
