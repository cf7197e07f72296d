#!/usr/bin/env python
"""Train the Lepard-style matcher with the focal correspondence loss.

The fork strips the Lepard weights (``.MISSING_LARGE_BLOBS``), so the
matcher is trained from scratch: on 4DMatch npz pairs when --data points
at a 4DMatch root, otherwise on synthetic rigid/non-rigid pairs (random
clouds with known correspondences) — which suffices to verify the whole
train path end to end and to bootstrap features.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def synthetic_pair(rng, n=192, cap=256):
    from occlusionfusion_tpu.geometry import so3_exp
    import jax.numpy as jnp

    src = rng.randn(n, 3).astype(np.float32) * 0.4
    R = np.asarray(so3_exp(jnp.asarray(rng.randn(3) * 0.3)))
    t = rng.randn(3).astype(np.float32) * 0.1
    tgt = (src @ R.T + t + rng.randn(n, 3) * 0.005).astype(np.float32)
    perm = rng.permutation(n)
    src_p = np.zeros((cap, 3), np.float32)
    src_p[:n] = src
    tgt_p = np.zeros((cap, 3), np.float32)
    tgt_p[:n] = tgt[perm.argsort()][perm]  # keep i -> perm correspondence
    tgt_p[:n] = tgt[perm]
    sm = np.zeros(cap, bool)
    sm[:n] = True
    corr = np.stack([np.arange(n), perm], -1).astype(np.int32)
    return src_p, sm, tgt_p, sm.copy(), corr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data", default=None, help="4DMatch root (optional)")
    ap.add_argument("--out", default="checkpoints/lepard_trained.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from occlusionfusion_tpu.models import kpconv as K
    from occlusionfusion_tpu.models.lepard import (
        LepardConfig,
        init_lepard_params,
        lepard_match,
    )
    from occlusionfusion_tpu.models.deform_loss import focal_correspondence_loss
    from occlusionfusion_tpu.ops.knn import knn_lax
    from occlusionfusion_tpu.utils.snapshot import save_pytree

    cfg = LepardConfig(
        kpfcn=K.KPFCNConfig(
            pyramid=K.PyramidConfig(level_sizes=(256, 96, 48, 24), first_voxel=0.06)
        )
    )
    params = init_lepard_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    dataset = None
    if args.data:
        from occlusionfusion_tpu.data.fourdmatch import FourDMatchDataset

        dataset = FourDMatchDataset(args.data)

    def loss_fn(params, src, sm, tgt, tm, gt_corr_src, gt_corr_tgt, corr_mask):
        m = lepard_match(params, cfg, src, sm, tgt, tm)
        # project GT correspondences onto the coarse level by nearest point
        _, src_coarse_idx = knn_lax(src[gt_corr_src], m.src_points, k=1,
                                    valid=m.src_valid)
        _, tgt_coarse_idx = knn_lax(tgt[gt_corr_tgt], m.tgt_points, k=1,
                                    valid=m.tgt_valid)
        S = m.src_points.shape[0]
        T_ = m.tgt_points.shape[0]
        gt = jnp.zeros((S, T_))
        gt = gt.at[src_coarse_idx[:, 0], tgt_coarse_idx[:, 0]].max(
            corr_mask.astype(jnp.float32)
        )
        valid = m.src_valid[:, None] & m.tgt_valid[None, :]
        return focal_correspondence_loss(m.confidence, gt, valid)

    train_step = jax.jit(
        lambda p, o, *b: _step(p, o, *b)
    )

    def _step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    for step in range(args.steps):
        if dataset is not None:
            s = dataset[rng.randint(len(dataset))]
            batch = (
                jnp.asarray(s["source"]), jnp.asarray(s["source_mask"]),
                jnp.asarray(s["target"]), jnp.asarray(s["target_mask"]),
                jnp.asarray(s["corr_src"]), jnp.asarray(s["corr_tgt"]),
                jnp.asarray(s["corr_mask"]),
            )
        else:
            src, sm, tgt, tm, corr = synthetic_pair(rng)
            cc = 256
            cs = np.zeros(cc, np.int32)
            ct = np.zeros(cc, np.int32)
            cm = np.zeros(cc, bool)
            ncorr = min(len(corr), cc)
            cs[:ncorr] = corr[:ncorr, 0]
            ct[:ncorr] = corr[:ncorr, 1]
            cm[:ncorr] = True
            batch = tuple(
                jnp.asarray(x) for x in (src, sm, tgt, tm, cs, ct, cm)
            )
        params, opt_state, loss = train_step(params, opt_state, *batch)
        if step % 10 == 0 or step == args.steps - 1:
            print(
                f"step {step}: loss {float(loss):.4f} "
                f"({time.perf_counter() - t0:.1f}s)"
            )
    save_pytree(args.out, params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
