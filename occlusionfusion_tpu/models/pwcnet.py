"""PWC-Net optical flow + MaskNet correspondence weighting, in JAX.

Re-design of the reference flow stack (``model/pwcnet.py:41-328`` and
MaskNet ``model/model.py:23-56``): 6-level feature pyramid, per-level
warping + 81-channel correlation cost volume (ops/correlation.py replaces
the CuPy CUDA kernels), densely-connected decoders, dilated context
refiner, and the sigmoid mask head that weights correspondences for the
Gauss-Newton solver.

NHWC layout, lax.conv_general_dilated everywhere — the convolutions land
on the MXU; bf16-ready (params f32, compute dtype switchable). No
pretrained weights ship in the fork (``.MISSING_LARGE_BLOBS``), so this
is random-init + trainable; architecture follows the standard public
PWC-Net layout the reference uses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from occlusionfusion_tpu.ops.correlation import correlation_volume

LEVEL_CHANNELS = (16, 32, 64, 96, 128, 196)  # pyramid levels 1..6
DENSE = (128, 128, 96, 64, 32)
CORR_CH = 81
FLOW_SCALES = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}  # dblBackward per level


def _conv_params(key, kh, kw, cin, cout):
    k1, _ = jax.random.split(key)
    fan_in = kh * kw * cin
    return {
        "w": jax.random.normal(k1, (kh, kw, cin, cout)) * (2.0 / fan_in) ** 0.5,
        "b": jnp.zeros(cout),
    }


def _conv(p, x, stride=1, dilation=1):
    # follow the parameter dtype (bf16 perception casts params once;
    # activations and internal f32 constants coerce here)
    x = x.astype(p["w"].dtype)
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"],
            window_strides=(stride, stride),
            padding="SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"]
    )


def _deconv(p, x):
    """stride-2 transposed conv, kernel 4 (upsample x2)."""
    x = x.astype(p["w"].dtype)
    return (
        jax.lax.conv_transpose(
            x,
            p["w"],
            strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"]
    )


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def bilinear_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp [B, H, W, C] by flow [B, H, W, 2] (u, v), with the reference's
    partial-warping mask (``pwcnet.py:16-36``): out-of-image samples -> 0."""
    B, H, W, C = img.shape
    # coordinate math stays f32 even under bf16 perception: bf16 ulp is
    # 0.5 px at coords >= 64, which truncates fractional warp offsets to
    # near-nearest-neighbor over most of a 448x640 frame. Only the
    # gathered feature values follow img.dtype.
    v, u = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    x = u[None] + flow[..., 0].astype(jnp.float32)
    y = v[None] + flow[..., 1].astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None].astype(img.dtype)
    fy = (y - y0)[..., None].astype(img.dtype)

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yc, xc)
        return jnp.where(inb[..., None], vals, 0.0)

    i00 = gather(x0, y0)
    i01 = gather(x0 + 1, y0)
    i10 = gather(x0, y0 + 1)
    i11 = gather(x0 + 1, y0 + 1)
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


class PWCNetParams(NamedTuple):
    extractor: list
    decoders: dict
    refiner: list


def init_pwcnet_params(key):
    keys = iter(jax.random.split(key, 128))
    extractor = []
    cin = 3
    for cout in LEVEL_CHANNELS:
        extractor.append(
            [
                _conv_params(next(keys), 3, 3, cin, cout),
                _conv_params(next(keys), 3, 3, cout, cout),
                _conv_params(next(keys), 3, 3, cout, cout),
            ]
        )
        cin = cout
    decoders = {}
    for lvl in (6, 5, 4, 3, 2):
        feat_ch = LEVEL_CHANNELS[lvl - 1]
        base = CORR_CH if lvl == 6 else CORR_CH + feat_ch + 2 + 2
        convs = []
        cin_d = base
        for cout in DENSE:
            convs.append(_conv_params(next(keys), 3, 3, cin_d, cout))
            cin_d += cout
        flow_head = _conv_params(next(keys), 3, 3, cin_d, 2)
        dec = {"convs": convs, "flow": flow_head}
        if lvl < 6:
            prev_dense = (CORR_CH if lvl == 5 else CORR_CH + LEVEL_CHANNELS[lvl] + 4) + sum(DENSE)
            dec["upflow"] = _conv_params(next(keys), 4, 4, 2, 2)
            dec["upfeat"] = _conv_params(next(keys), 4, 4, prev_dense, 2)
        decoders[lvl] = dec
    refiner_specs = [
        (128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1), (2, 1)
    ]
    refiner = []
    cin_r = CORR_CH + LEVEL_CHANNELS[1] + 4 + sum(DENSE)
    for cout, _dil in refiner_specs:
        refiner.append(_conv_params(next(keys), 3, 3, cin_r, cout))
        cin_r = cout
    return {"extractor": extractor, "decoders": decoders, "refiner": refiner}


def extract_pyramid(params, image: jnp.ndarray):
    """[B, H, W, 3] -> dict lvl -> [B, H/2^lvl, W/2^lvl, C_lvl]."""
    feats = {}
    x = image
    for lvl, convs in enumerate(params["extractor"], start=1):
        x = _lrelu(_conv(convs[0], x, stride=2))
        x = _lrelu(_conv(convs[1], x))
        x = _lrelu(_conv(convs[2], x))
        feats[lvl] = x
    return feats


def _pwcnet_decode(params, im1: jnp.ndarray, im2: jnp.ndarray):
    """Shared decoder pass: returns ({lvl: flow_lvl}, final feat). Flow at
    each level is in that level's pixel units x 1/20; level 2 includes the
    context-refiner residual."""
    from occlusionfusion_tpu.models.checkpoint import normalize_indexed

    params = normalize_indexed(params)  # npz-loaded checkpoints
    f1 = extract_pyramid(params, im1)
    f2 = extract_pyramid(params, im2)
    flow = None
    feat = None
    flows = {}
    for lvl in (6, 5, 4, 3, 2):
        dec = params["decoders"][lvl]
        a = f1[lvl]
        b = f2[lvl]
        if flow is None:
            corr = jax.vmap(correlation_volume)(a, b)
            x = _lrelu(corr)
        else:
            upflow = _deconv(dec["upflow"], flow)
            upfeat = _deconv(dec["upfeat"], feat)
            warped = bilinear_warp(b, upflow * FLOW_SCALES[lvl])
            corr = jax.vmap(correlation_volume)(a, warped)
            x = jnp.concatenate([_lrelu(corr), a, upflow, upfeat], axis=-1)
        for conv in dec["convs"]:
            x = jnp.concatenate([_lrelu(_conv(conv, x)), x], axis=-1)
        flow = _conv(dec["flow"], x)
        feat = x
        flows[lvl] = flow
    # context refiner at level 2
    r = feat
    dils = (1, 2, 4, 8, 16, 1, 1)
    for conv, dil in zip(params["refiner"][:-1], dils[:-1]):
        r = _lrelu(_conv(conv, r, dilation=dil))
    flows[2] = flow + _conv(params["refiner"][-1], r)
    return flows, feat


@jax.jit
def pwcnet_forward(params, im1: jnp.ndarray, im2: jnp.ndarray):
    """Estimate flow im1 -> im2 at quarter resolution.

    Returns flow [B, H/4, W/4, 2] in quarter-res pixel units x 1/20 — the
    caller upsamples and multiplies by 20 like the reference
    (``model.py:898-930``). Also returns the final decoder features
    [B, H/4, W/4, 565] for MaskNet.
    """
    flows, feat = _pwcnet_decode(params, im1, im2)
    return flows[2], feat


@jax.jit
def pwcnet_forward_multiscale(params, im1: jnp.ndarray, im2: jnp.ndarray):
    """All decoder-level flows ({2..6: [B, H/2^l, W/2^l, 2]}) plus the
    final features — the training forward (standard PWC multi-scale
    supervision; the reference trains only through the final level,
    model/loss.py:27-71, but per-level supervision is the published
    PWC-Net recipe and converges far faster from scratch)."""
    return _pwcnet_decode(params, im1, im2)


# ---------------------------------------------------------------------------
# MaskNet (model/model.py:23-56)


def init_masknet_params(key, feat_ch: int = 565):
    keys = iter(jax.random.split(key, 16))
    fn0, fn1 = 16, 16
    params = {
        "upconv1": _conv_params(next(keys), 4, 4, feat_ch, 2 * fn0),
        "upconv2": _conv_params(next(keys), 4, 4, 2 * fn0, fn0),
        "conv_in": _conv_params(next(keys), 3, 3, fn0 + 12, fn1),
        "res": [
            [
                _conv_params(next(keys), 3, 3, fn1, fn1),
                _conv_params(next(keys), 3, 3, fn1, fn1),
            ]
            for _ in range(3)
        ],
        "out": _conv_params(next(keys), 3, 3, fn1, 1),
    }
    return params


@jax.jit
def masknet_forward(params, decoder_feat, source_rgbd6, target_rgbd6):
    """Predict per-pixel correspondence weights in (0, 1)
    (``model.py:49-56``): upsample decoder features x4, concat with the
    6-channel source/target images, small res-net, sigmoid."""
    from occlusionfusion_tpu.models.checkpoint import normalize_indexed

    params = normalize_indexed(params)  # npz-loaded checkpoints
    x = _deconv(params["upconv1"], decoder_feat)
    x = _deconv(params["upconv2"], x)
    x = jnp.concatenate([x, source_rgbd6, target_rgbd6], axis=-1)
    x = _lrelu(_conv(params["conv_in"], x))
    for c1, c2 in params["res"]:
        h = _lrelu(_conv(c1, x))
        h = _conv(c2, h)
        x = _lrelu(x + h)
    return jax.nn.sigmoid(_conv(params["out"], x))
