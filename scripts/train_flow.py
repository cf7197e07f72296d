#!/usr/bin/env python
"""Train the PWC-Net optical-flow stack (+ optional MaskNet head).

The reference fork ships neither flow weights nor a training loop
(``train.py`` referenced by ``options.py:26`` is absent;
``.MISSING_LARGE_BLOBS`` strips the checkpoints) — this is the missing
recipe. Data: synthetic textured RGB-D pairs deformed by smooth random
flow fields (DeepDeform-style supervision without the dataset; pass
--deepdeform ROOT to train on real DeepDeform pairs via
data/deepdeform.py instead).

Usage:
  python scripts/train_flow.py --steps 2000 --out checkpoints/flow.npz
  python scripts/train_flow.py --with_mask --steps 2000
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def smooth_field(rng, H, W, channels, scale, cells=4):
    """Random smooth field: low-res noise, bilinearly upsampled."""
    coarse = rng.randn(cells, cells, channels).astype(np.float32) * scale
    ys = np.linspace(0, cells - 1, H)
    xs = np.linspace(0, cells - 1, W)
    y0 = np.clip(ys.astype(int), 0, cells - 2)
    x0 = np.clip(xs.astype(int), 0, cells - 2)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    return (
        c00 * (1 - fy) * (1 - fx)
        + c01 * (1 - fy) * fx
        + c10 * fy * (1 - fx)
        + c11 * fy * fx
    )


def bilinear_np(img, y, x):
    H, W = img.shape[:2]
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
    fx = np.clip(x - x0, 0, 1)[..., None]
    fy = np.clip(y - y0, 0, 1)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def synthetic_pair(rng, H=64, W=64, max_flow=4.0):
    """(im1, im2, flow_gt [H,W,2] px, valid): im2 is im1 inverse-warped by
    a smooth flow field (small-flow approximation F~(y) ~= F(x))."""
    tex = smooth_field(rng, H, W, 3, 1.0, cells=8)
    tex += 0.2 * rng.randn(H, W, 3).astype(np.float32)
    im1 = (tex - tex.min()) / max(float(np.ptp(tex)), 1e-6)
    flow = smooth_field(rng, H, W, 2, max_flow, cells=3)
    v, u = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    im2 = bilinear_np(im1, v - flow[..., 1], u - flow[..., 0]).astype(
        np.float32
    )
    inb = (
        (u + flow[..., 0] >= 0) & (u + flow[..., 0] <= W - 1)
        & (v + flow[..., 1] >= 0) & (v + flow[..., 1] <= H - 1)
    )
    return im1.astype(np.float32), im2, flow.astype(np.float32), inb


def synthetic_rgbd6(rng, im, H, W):
    """6-channel RGB-XYZ companion (smooth synthetic depth surface)."""
    depth = 1.0 + 0.3 * smooth_field(rng, H, W, 1, 1.0, cells=3)[..., 0]
    v, u = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    fx = 0.5 * max(H, W)
    x = (u - W / 2) / fx * depth
    y = (v - H / 2) / fx * depth
    return np.concatenate(
        [im, np.stack([x, y, depth], -1)], axis=-1
    ).astype(np.float32)


def make_batch_rendered(rng, batch, H, W, with_mask, shapes, n_verts,
                        max_gap):
    """Domain-matched batches: RGB-D pairs rendered by the same
    point-splat renderer the eval/fusion loop consumes, exact GT flow
    from vertex correspondences, depth-consistency mask GT. Images are
    zero-padded to the PWC 64-divisible size exactly as
    ``flow_correspondences`` pads at inference (pad band invalid)."""
    import jax.numpy as jnp

    from occlusionfusion_tpu.data.synthetic_shapes import rendered_flow_pair
    from occlusionfusion_tpu.models.flow_train import FlowBatch

    Hp = -(-H // 64) * 64
    Wp = -(-W // 64) * 64

    def pad(a, fill=0.0):
        widths = [(0, Hp - H), (0, Wp - W)] + [(0, 0)] * (a.ndim - 2)
        return np.pad(a, widths, constant_values=fill)

    im1s, im2s, flows, valids, s6, t6, mgt = [], [], [], [], [], [], []
    for _ in range(batch):
        p = rendered_flow_pair(
            rng, H=H, W=W, shapes=shapes, n_verts=n_verts, max_gap=max_gap
        )
        im1s.append(pad(p["im1"]))
        im2s.append(pad(p["im2"]))
        flows.append(pad(p["flow"]))
        valids.append(pad(p["valid"], False))
        if with_mask:
            s6.append(pad(p["src6"]))
            t6.append(pad(p["tgt6"]))
            mgt.append(pad(p["mask_gt"], False))
    kw = {}
    if with_mask:
        kw = dict(
            src_rgbd6=jnp.asarray(np.stack(s6)),
            tgt_rgbd6=jnp.asarray(np.stack(t6)),
            mask_gt=jnp.asarray(np.stack(mgt)),
        )
    return FlowBatch(
        im1=jnp.asarray(np.stack(im1s)),
        im2=jnp.asarray(np.stack(im2s)),
        flow_gt=jnp.asarray(np.stack(flows)),
        flow_valid=jnp.asarray(np.stack(valids)),
        **kw,
    )


def make_batch_deepdeform(ds, rng, batch, H, W, with_mask, depth_tol=0.02,
                          index_pool=None):
    """Batches from a DeepDeform-layout dataset (real DeepDeform or a
    scripts/export_deepdeform.py synthetic export). Streams samples by
    random index (no preload — real splits are ~100k pairs); flow GT
    holes use the format's -Inf sentinel; mask GT is re-derived as
    depth-consistency of the GT-flowed target (``utils/nnutils.py``
    mask-GT semantics)."""
    import jax.numpy as jnp

    from occlusionfusion_tpu.models.flow_train import FlowBatch

    Hp = -(-H // 64) * 64
    Wp = -(-W // 64) * 64

    def pad(a, fill=0.0):
        widths = [(0, Hp - H), (0, Wp - W)] + [(0, 0)] * (a.ndim - 2)
        return np.pad(a, widths, constant_values=fill)

    im1s, im2s, flows, valids, s6, t6, mgt = [], [], [], [], [], [], []
    for _ in range(batch):
        if index_pool is not None:
            s = ds[int(index_pool[rng.randint(len(index_pool))])]
        else:
            s = ds[int(rng.randint(len(ds)))]
        src, tgt = s["source"], s["target"]  # [6, H, W]
        flow = s["optical_flow"].transpose(1, 2, 0)
        valid = np.isfinite(flow).all(-1) & (src[5] > 0)
        flow = np.where(valid[..., None], flow, 0.0).astype(np.float32)
        vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        uj = np.clip(np.round(uu + flow[..., 0]).astype(int), 0, W - 1)
        vj = np.clip(np.round(vv + flow[..., 1]).astype(int), 0, H - 1)
        inb = (
            (uu + flow[..., 0] >= 0) & (uu + flow[..., 0] <= W - 1)
            & (vv + flow[..., 1] >= 0) & (vv + flow[..., 1] <= H - 1)
        )
        zgt = src[5] + np.where(
            np.isfinite(s["scene_flow"][2]), s["scene_flow"][2], 0.0
        )
        ztgt = tgt[5][vj, uj]
        mask = valid & inb & (ztgt > 0) & (np.abs(zgt - ztgt) < depth_tol)
        im1s.append(pad(src[:3].transpose(1, 2, 0)))
        im2s.append(pad(tgt[:3].transpose(1, 2, 0)))
        flows.append(pad(flow))
        valids.append(pad(valid, False))
        if with_mask:
            s6.append(pad(src.transpose(1, 2, 0)))
            t6.append(pad(tgt.transpose(1, 2, 0)))
            mgt.append(pad(mask, False))
    kw = {}
    if with_mask:
        kw = dict(
            src_rgbd6=jnp.asarray(np.stack(s6)),
            tgt_rgbd6=jnp.asarray(np.stack(t6)),
            mask_gt=jnp.asarray(np.stack(mgt)),
        )
    return FlowBatch(
        im1=jnp.asarray(np.stack(im1s)),
        im2=jnp.asarray(np.stack(im2s)),
        flow_gt=jnp.asarray(np.stack(flows)),
        flow_valid=jnp.asarray(np.stack(valids)),
        **kw,
    )


def make_batch(rng, batch, H, W, with_mask, augment_rot=0.0):
    import jax.numpy as jnp

    from occlusionfusion_tpu.models.flow_train import FlowBatch

    im1s, im2s, flows, valids, s6, t6, mgt = [], [], [], [], [], [], []
    for _ in range(batch):
        im1, im2, flow, valid = synthetic_pair(rng, H, W)
        if augment_rot:
            # reference rotation augmentation (image_proc.cpp:39-349):
            # rotate source and target independently and compose the GT
            # flow through both rotations
            from occlusionfusion_tpu.ops.image_warp import (
                augmented_flow_from_rotation,
                rotate_image,
                rotation_flow,
            )

            a_s = jnp.float32(rng.uniform(-augment_rot, augment_rot))
            a_t = jnp.float32(rng.uniform(-augment_rot, augment_rot))
            im1 = np.asarray(rotate_image(jnp.asarray(im1), a_s))
            im2 = np.asarray(rotate_image(jnp.asarray(im2), a_t))
            aug, v = augmented_flow_from_rotation(
                rotation_flow(H, W, a_s),
                jnp.asarray(flow),
                jnp.asarray(valid),
                rotation_flow(H, W, -a_t),
            )
            flow = np.asarray(aug)
            valid = np.asarray(v)
        im1s.append(im1)
        im2s.append(im2)
        flows.append(flow)
        valids.append(valid)
        if with_mask:
            a = synthetic_rgbd6(rng, im1, H, W)
            b = synthetic_rgbd6(rng, im2, H, W)
            s6.append(a)
            t6.append(b)
            # mask GT: valid flow AND depth-consistent under the GT flow
            mgt.append(valid)
    kw = {}
    if with_mask:
        kw = dict(
            src_rgbd6=jnp.asarray(np.stack(s6)),
            tgt_rgbd6=jnp.asarray(np.stack(t6)),
            mask_gt=jnp.asarray(np.stack(mgt)),
        )
    return FlowBatch(
        im1=jnp.asarray(np.stack(im1s)),
        im2=jnp.asarray(np.stack(im2s)),
        flow_gt=jnp.asarray(np.stack(flows)),
        flow_valid=jnp.asarray(np.stack(valids)),
        **kw,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--with_mask", action="store_true")
    ap.add_argument("--augment_rot", type=float, default=0.0,
                    help="rotation-composition flow augmentation: max\n"
                         " |angle| (radians) applied independently to\n"
                         " source and target (image_proc.cpp:39-349)")
    ap.add_argument("--data", default="noise",
                    choices=("noise", "rendered", "deepdeform"),
                    help="noise: flat textured-noise pairs with smooth "
                         "synthetic flow (fast, domain-mismatched); "
                         "rendered: RGB-D pairs splat-rendered from the "
                         "procedural deforming shapes (blob/limbs/arms) "
                         "with exact GT flow + occlusion mask GT — the "
                         "domain the fusion loop actually runs on")
    ap.add_argument("--shapes", default="blob,limbs,arms",
                    help="comma list of shapes for --data rendered")
    ap.add_argument("--deepdeform", default=None,
                    help="DeepDeform-layout root for --data deepdeform "
                         "(real dataset or scripts/export_deepdeform.py "
                         "output)")
    ap.add_argument("--split", default="train",
                    help="split json name under --deepdeform")
    ap.add_argument("--verts", type=int, default=5000,
                    help="points per rendered shape (--data rendered)")
    ap.add_argument("--max_gap", type=int, default=2,
                    help="max extra frame gap in rendered pairs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="checkpoints/flow.npz")
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--resume", default=None,
                    help="checkpoint npz to continue from (params only)")
    ap.add_argument("--through_solver", action="store_true",
                    help="end-to-end differentiable tracking training: "
                         "graph/warp losses backprop THROUGH the "
                         "Gauss-Newton solve into PWC+MaskNet (the "
                         "NeuralTracking trick, model/model.py:59-86,"
                         "865-1537). Implies --with_mask semantics; "
                         "data is geometric RGB-D pairs with a GT warp")
    ap.add_argument("--gn_iters", type=int, default=3,
                    help="GN iterations inside --through_solver training")
    ap.add_argument("--matches", type=int, default=512,
                    help="match pixels per sample (--through_solver)")
    ap.add_argument("--nodes", type=int, default=32,
                    help="graph nodes per sample (--through_solver)")
    ap.add_argument("--eval_pairs", type=int, default=8,
                    help="held-out pairs for the EPE-3D eval "
                         "(--through_solver)")
    ap.add_argument("--sparse_flow_frac", type=float, default=1.0,
                    help="fraction of pixels keeping flow GT during "
                         "--through_solver training (the real-data "
                         "regime: flow supervision is sparse/incomplete"
                         " — the solver's graph/warp losses supervise "
                         "through ALL matches regardless)")
    ap.add_argument("--corrupt_flow", action="store_true",
                    help="real-data supervision regime for "
                         "--through_solver: flow GT is WRONG (but "
                         "marked valid) at occlusion boundaries and "
                         "depth holes, as reconstruction-derived flow "
                         "GT is — the A/B where backprop through the "
                         "solver should WIN, not tie (heldout eval "
                         "stays clean)")
    ap.add_argument("--no_solver_terms", action="store_true",
                    help="A/B ablation: same data/model/eval as "
                         "--through_solver but zero the graph/warp loss "
                         "terms (flow+mask supervision only) — isolates "
                         "what backprop through the solver buys")
    args = ap.parse_args()

    import jax

    if _os.environ.get("TRAIN_CPU") == "1":  # shape-shakeout runs off-TPU
        jax.config.update("jax_platforms", "cpu")

    import optax

    from occlusionfusion_tpu.models.flow_train import (
        epe_px,
        make_flow_train_step,
    )
    from occlusionfusion_tpu.models.pwcnet import (
        init_masknet_params,
        init_pwcnet_params,
    )
    from occlusionfusion_tpu.utils.snapshot import save_pytree

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    params = {"pwc": init_pwcnet_params(key)}
    if args.with_mask:
        params["mask"] = init_masknet_params(jax.random.PRNGKey(args.seed + 1))
    if args.resume:
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed
        from occlusionfusion_tpu.utils.snapshot import load_params

        loaded = normalize_indexed(load_params(args.resume))
        params["pwc"] = loaded["pwc"]
        if args.with_mask and "mask" in loaded:
            params["mask"] = loaded["mask"]
        print(f"resumed params from {args.resume}")

    if args.through_solver:
        from occlusionfusion_tpu.models.tracking_train import (
            epe3d,
            make_tracking_train_step,
            stack_samples,
            synthetic_tracking_sample,
        )
        from occlusionfusion_tpu.solvers.gauss_newton import GNConfig

        if "mask" not in params:
            params["mask"] = init_masknet_params(
                jax.random.PRNGKey(args.seed + 1)
            )
        gn = GNConfig(iters=args.gn_iters, w_arap=1.0)
        opt = optax.adam(args.lr)
        opt_state = opt.init(params)
        from occlusionfusion_tpu.models.deform_loss import DeformLossWeights

        lw = DeformLossWeights()
        if args.no_solver_terms:
            lw = lw._replace(lambda_graph=0.0, lambda_warp=0.0)
        step = make_tracking_train_step(opt, gn, weights=lw)

        def make_samples(r, k, sparse=True):
            out = []
            for _ in range(k):
                s = synthetic_tracking_sample(
                    r, H=args.height, W=args.width,
                    n_nodes=args.nodes, n_matches=args.matches,
                    corrupt_flow=args.corrupt_flow and sparse,
                )
                if sparse and args.sparse_flow_frac < 1.0:
                    import jax.numpy as jnp

                    keep = r.rand(args.height, args.width) < (
                        args.sparse_flow_frac
                    )
                    s = s._replace(
                        flow_valid=s.flow_valid & jnp.asarray(keep)
                    )
                out.append(s)
            return out

        heldout = stack_samples(
            make_samples(np.random.RandomState(10_000 + args.seed),
                         args.eval_pairs, sparse=False)
        )
        import jax.numpy as jnp

        def eval_epe3d(p):
            es = jax.vmap(
                lambda s: epe3d(p["pwc"], p.get("mask"), s, gn)
            )(heldout)
            return float(jnp.mean(es))

        t0 = time.time()
        for i in range(args.steps):
            batch = stack_samples(make_samples(rng, args.batch))
            params, opt_state, loss, terms = step(params, opt_state, batch)
            if i % args.log_every == 0 or i == args.steps - 1:
                tstr = " ".join(
                    f"{k} {float(v):.4f}" for k, v in sorted(terms.items())
                )
                print(
                    f"step {i}: loss {float(loss):.4f} [{tstr}] "
                    f"heldout_epe3d {eval_epe3d(params):.4f} m "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if args.save_every and i and i % args.save_every == 0:
                save_pytree(args.out, params)
        save_pytree(args.out, params)
        print(
            f"saved {args.out}; final held-out EPE-3D "
            f"{eval_epe3d(params):.4f} m"
        )
        return

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step = make_flow_train_step(opt, with_mask=args.with_mask)

    shapes = tuple(s for s in args.shapes.split(",") if s)
    ds = None
    if args.data == "deepdeform":
        if not args.deepdeform:
            raise SystemExit("--data deepdeform requires --deepdeform ROOT")
        from occlusionfusion_tpu.data.deepdeform import (
            DeepDeformConfig,
            DeepDeformDataset,
        )

        ds = DeepDeformDataset(
            args.deepdeform, args.split,
            DeepDeformConfig(
                image_height=args.height, image_width=args.width
            ),
        )
        print(f"deepdeform: {len(ds)} pairs from {args.deepdeform}")

    # deepdeform: reserve a fixed index subset for held-out eval so the
    # logged held-out EPE can never include trained pairs (for
    # rendered/noise data, clip parameters are continuous random draws —
    # heldout-vs-train collision probability is negligible but only
    # probabilistic; seeds 77_000+ are reserved for eval)
    train_pool = heldout_pool = None
    if ds is not None:
        n_held = max(args.batch, min(len(ds) // 10, 256))
        heldout_pool = np.arange(len(ds) - n_held, len(ds))
        train_pool = np.arange(len(ds) - n_held)
        if len(train_pool) == 0:
            train_pool = heldout_pool  # degenerate tiny split
        print(f"deepdeform heldout: {len(heldout_pool)} reserved pairs")

    def next_batch(r, pool=None):
        if args.data == "deepdeform":
            return make_batch_deepdeform(
                ds, r, args.batch, args.height, args.width, args.with_mask,
                index_pool=train_pool if pool is None else pool,
            )
        if args.data == "rendered":
            return make_batch_rendered(
                r, args.batch, args.height, args.width, args.with_mask,
                shapes, args.verts, args.max_gap,
            )
        return make_batch(r, args.batch, args.height, args.width,
                          args.with_mask, augment_rot=args.augment_rot)

    # held-out eval pairs (reserved index pool for deepdeform; reserved
    # seed range for generated data)
    heldout = next_batch(
        np.random.RandomState(77_000 + args.seed), pool=heldout_pool
    )

    t0 = time.time()
    for i in range(args.steps):
        batch = next_batch(rng)
        params, opt_state, loss = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            e = float(
                epe_px(params["pwc"], heldout.im1, heldout.im2,
                       heldout.flow_gt, heldout.flow_valid)
            )
            print(
                f"step {i}: loss {float(loss):.4f} heldout_epe {e:.3f} px "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
        if args.save_every and i and i % args.save_every == 0:
            save_pytree(args.out, params)

    save_pytree(args.out, params)
    e = float(
        epe_px(params["pwc"], heldout.im1, heldout.im2, heldout.flow_gt,
               heldout.flow_valid)
    )
    print(f"saved {args.out}; final held-out EPE {e:.3f} px")


if __name__ == "__main__":
    main()
