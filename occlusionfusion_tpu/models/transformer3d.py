"""Repositioning transformer with volumetric rotary position encoding.

Re-design of Lepard's coarse-level matching transformer
(``lepard/models/transformer.py:13-257``) and its 3-D position encoding
(``lepard/models/position_encoding.py:5-87``): interleaved
self / cross / positioning attention over the two point clouds' coarse
KPFCN features, where the 'positioning' layer matches, solves a soft
Procrustes fit, rigidly rewarps the source cloud and *recomputes* the
rotary embedding — the repositioning trick that conditions attention on
the current rigid alignment estimate.

All attention is dense (coarse clouds are a few hundred points — one MXU
matmul per head) with padding masks.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.geometry.kabsch import weighted_kabsch


# ---------------------------------------------------------------------------
# volumetric rotary position encoding (VolPE, position_encoding.py:49-87)


def rotary_pe_3d(points: jnp.ndarray, feature_dim: int, voxel: float = 0.08):
    """[P, 3] -> (cos [P, D/2], sin [P, D/2]) rotary tables.

    Each coordinate axis gets D/6 frequency pairs (sinusoidal in
    voxelized coordinates), concatenated — the reference's 'rotary'
    vol_bnds-free variant.
    """
    d_axis = feature_dim // 6  # pairs per axis
    freq = jnp.exp(
        -math.log(10000.0) * jnp.arange(d_axis, dtype=jnp.float32) / d_axis
    )
    coords = points / voxel  # [P, 3]
    angles = coords[:, :, None] * freq[None, None, :]  # [P, 3, d_axis]
    angles = angles.reshape(points.shape[0], -1)  # [P, 3*d_axis]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate feature pairs: [P, D] with D/2 pairs."""
    d2 = cos.shape[-1]
    x1 = x[..., :d2]
    x2 = x[..., d2 : 2 * d2]
    rot1 = x1 * cos - x2 * sin
    rot2 = x1 * sin + x2 * cos
    rest = x[..., 2 * d2 :]
    return jnp.concatenate([rot1, rot2, rest], axis=-1)


# ---------------------------------------------------------------------------
# attention layers


def _linear(p, x):
    return x @ p["w"] + p["b"]


def init_attention_params(key, dim: int, heads: int = 4):
    keys = jax.random.split(key, 6)

    def lin(k, i, o):
        return {
            "w": jax.random.normal(k, (i, o)) * (1.0 / i) ** 0.5,
            "b": jnp.zeros(o),
        }

    return {
        "q": lin(keys[0], dim, dim),
        "k": lin(keys[1], dim, dim),
        "v": lin(keys[2], dim, dim),
        "merge": lin(keys[3], dim, dim),
        "mlp1": lin(keys[4], 2 * dim, 2 * dim),
        "mlp2": lin(keys[5], 2 * dim, dim),
        "norm1_scale": jnp.ones(dim),
        "norm1_bias": jnp.zeros(dim),
        "norm2_scale": jnp.ones(dim),
        "norm2_bias": jnp.zeros(dim),
    }


def _layer_norm(x, scale, bias, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * scale + bias


def attention_layer(
    p,
    x: jnp.ndarray,  # [P, D] queries side
    source: jnp.ndarray,  # [S, D] keys/values side
    x_valid: jnp.ndarray,
    source_valid: jnp.ndarray,
    heads: int = 4,
    x_rope=None,  # optional (cos, sin) rotary tables for x
    source_rope=None,
):
    """GeometryAttentionLayer (transformer.py:13-100): MHA + gated MLP."""
    P, D = x.shape
    dh = D // heads
    q = _linear(p["q"], x)
    k = _linear(p["k"], source)
    v = _linear(p["v"], source)
    if x_rope is not None:
        q = apply_rotary(q, *x_rope)
    if source_rope is not None:
        k = apply_rotary(k, *source_rope)
    q = q.reshape(P, heads, dh)
    k = k.reshape(-1, heads, dh)
    v = v.reshape(-1, heads, dh)
    logits = jnp.einsum("phd,shd->hps", q, k) / math.sqrt(dh)
    logits = jnp.where(source_valid[None, None, :], logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    msg = jnp.einsum("hps,shd->phd", attn, v).reshape(P, D)
    msg = _linear(p["merge"], msg)
    msg = _layer_norm(msg, p["norm1_scale"], p["norm1_bias"])
    h = jnp.concatenate([x, msg], axis=-1)
    h = jax.nn.gelu(_linear(p["mlp1"], h))
    h = _linear(p["mlp2"], h)
    h = _layer_norm(h, p["norm2_scale"], p["norm2_bias"])
    out = x + h
    return jnp.where(x_valid[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# matching + soft procrustes (lepard/models/{matching,procrustes}.py)


def dual_softmax_confidence(
    feats_src: jnp.ndarray,
    feats_tgt: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    temperature: float = 0.1,
):
    """[S, T] dual-softmax match confidence (``matching.py:147-157``)."""
    f1 = feats_src / jnp.maximum(
        jnp.linalg.norm(feats_src, axis=-1, keepdims=True), 1e-8
    )
    f2 = feats_tgt / jnp.maximum(
        jnp.linalg.norm(feats_tgt, axis=-1, keepdims=True), 1e-8
    )
    sim = (f1 @ f2.T) / temperature
    sim = jnp.where(src_valid[:, None] & tgt_valid[None, :], sim, -1e30)
    conf = jax.nn.softmax(sim, axis=0) * jax.nn.softmax(sim, axis=1)
    return jnp.where(src_valid[:, None] & tgt_valid[None, :], conf, 0.0)


def sinkhorn_confidence(
    feats_src, feats_tgt, src_valid, tgt_valid,
    temperature: float = 0.1, iters: int = 3,
    dustbin_score: float | None = None,
):
    """Entropic OT alternative (``matching.py:6-38,159-171``), in log
    space. With ``dustbin_score`` set, a learned-style slack row/column
    absorbs unmatched mass (SuperGlue-style, the reference's OT variant);
    without it, padding masks play that role."""
    f1 = feats_src / jnp.maximum(
        jnp.linalg.norm(feats_src, axis=-1, keepdims=True), 1e-8
    )
    f2 = feats_tgt / jnp.maximum(
        jnp.linalg.norm(feats_tgt, axis=-1, keepdims=True), 1e-8
    )
    M = (f1 @ f2.T) / temperature
    M = jnp.where(src_valid[:, None] & tgt_valid[None, :], M, -1e30)
    S, T_ = M.shape
    if dustbin_score is not None:
        # append slack row + column with the fixed dustbin score
        M = jnp.concatenate(
            [M, jnp.full((S, 1), dustbin_score)], axis=1
        )
        M = jnp.concatenate(
            [M, jnp.full((1, T_ + 1), dustbin_score)], axis=0
        )
        src_m = jnp.concatenate([src_valid, jnp.ones(1, bool)])
        tgt_m = jnp.concatenate([tgt_valid, jnp.ones(1, bool)])
        # the dustbin can absorb the whole other side's mass
        log_a = jnp.where(
            src_m, 0.0, -1e30
        ).at[-1].set(jnp.log(jnp.maximum(jnp.sum(tgt_valid), 1.0)))
        log_b = jnp.where(
            tgt_m, 0.0, -1e30
        ).at[-1].set(jnp.log(jnp.maximum(jnp.sum(src_valid), 1.0)))
    else:
        src_m, tgt_m = src_valid, tgt_valid
        log_a = jnp.where(src_m, 0.0, -1e30)
        log_b = jnp.where(tgt_m, 0.0, -1e30)
    u = jnp.zeros(M.shape[0])
    v = jnp.zeros(M.shape[1])
    for _ in range(iters):
        u = log_a - jax.nn.logsumexp(M + v[None, :], axis=1)
        u = jnp.where(src_m, u, 0.0)
        v = log_b - jax.nn.logsumexp(M + u[:, None], axis=0)
        v = jnp.where(tgt_m, v, 0.0)
    P = jnp.exp(M + u[:, None] + v[None, :])
    if dustbin_score is not None:
        P = P[:S, :T_]
    return jnp.where(src_valid[:, None] & tgt_valid[None, :], P, 0.0)


def mutual_topk_matches(conf: jnp.ndarray, threshold: float = 0.05):
    """Mutual-argmax matches above threshold (``matching.py:71-88``).

    Returns (src_idx [S], tgt_idx [S], valid [S]): for every source row
    its best target, valid iff mutual and confident. Static shape.
    """
    best_tgt = jnp.argmax(conf, axis=1)
    best_src = jnp.argmax(conf, axis=0)
    mutual = best_src[best_tgt] == jnp.arange(conf.shape[0])
    peak = jnp.take_along_axis(conf, best_tgt[:, None], axis=1)[:, 0]
    valid = mutual & (peak > threshold)
    return jnp.arange(conf.shape[0]), best_tgt, valid


def soft_procrustes(
    conf: jnp.ndarray,  # [S, T]
    src_points: jnp.ndarray,
    tgt_points: jnp.ndarray,
):
    """Confidence-weighted rigid fit (``procrustes.py:10-44``): each source
    point is matched to its conf-weighted target barycenter, weights are
    row masses."""
    row_mass = jnp.sum(conf, axis=1)  # [S]
    safe = jnp.maximum(row_mass, 1e-9)
    targets = (conf @ tgt_points) / safe[:, None]
    R, t = weighted_kabsch(src_points, targets, row_mass)
    return R, t


# ---------------------------------------------------------------------------
# the repositioning transformer


class RepositionConfig(NamedTuple):
    dim: int = 256
    heads: int = 4
    layer_types: Sequence[str] = (
        "self", "cross", "positioning", "self", "cross"
    )  # transformer.py:151 / 4dmatch.yaml
    rope_voxel: float = 0.08
    temperature: float = 0.1


def init_reposition_params(key, config: RepositionConfig):
    keys = jax.random.split(key, len(config.layer_types) * 2 + 1)
    layers = []
    for i, lt in enumerate(config.layer_types):
        if lt == "positioning":
            layers.append({})
        else:
            layers.append(
                {
                    "src": init_attention_params(
                        keys[2 * i], config.dim, config.heads
                    ),
                    "tgt": init_attention_params(
                        keys[2 * i + 1], config.dim, config.heads
                    ),
                }
            )
    return {"layers": layers}


def reposition_transformer(
    params,
    config: RepositionConfig,
    src_feats, tgt_feats,  # [S, D], [T, D]
    src_points, tgt_points,
    src_valid, tgt_valid,
):
    """Returns (src_feats, tgt_feats, R, t) — features after interleaved
    attention and the current rigid estimate from positioning layers."""
    cur_src_pos = src_points
    R = jnp.eye(3)
    t = jnp.zeros(3)
    rope_tgt = rotary_pe_3d(tgt_points, config.dim, config.rope_voxel)
    layers = params["layers"]

    def layer_params(i):
        # flat-npz snapshots turn the list into a dict of digit keys AND
        # drop the empty {} entries of positioning layers — index by
        # position so reloaded checkpoints stay aligned with layer_types
        if isinstance(layers, dict):
            return layers.get(str(i), {})
        return layers[i]

    for i, lt in enumerate(config.layer_types):
        p = layer_params(i)
        rope_src = rotary_pe_3d(cur_src_pos, config.dim, config.rope_voxel)
        if lt == "self":
            src_feats = attention_layer(
                p["src"], src_feats, src_feats, src_valid, src_valid,
                config.heads, rope_src, rope_src,
            )
            tgt_feats = attention_layer(
                p["tgt"], tgt_feats, tgt_feats, tgt_valid, tgt_valid,
                config.heads, rope_tgt, rope_tgt,
            )
        elif lt == "cross":
            new_src = attention_layer(
                p["src"], src_feats, tgt_feats, src_valid, tgt_valid,
                config.heads, None, None,
            )
            tgt_feats = attention_layer(
                p["tgt"], tgt_feats, src_feats, tgt_valid, src_valid,
                config.heads, None, None,
            )
            src_feats = new_src
        elif lt == "positioning":
            conf = dual_softmax_confidence(
                src_feats, tgt_feats, src_valid, tgt_valid, config.temperature
            )
            R, t = soft_procrustes(conf, src_points, tgt_points)
            cur_src_pos = src_points @ R.T + t  # rewarp -> new rotary PE
        else:
            raise ValueError(lt)
    return src_feats, tgt_feats, R, t
