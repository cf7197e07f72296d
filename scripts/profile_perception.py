#!/usr/bin/env python
"""Micro-profile of the in-scan perception stages at the reference
envelope (448x640 image, 8192-point model, 2048-point target subsample,
shipped checkpoints) — the within-stage half of the round-3
decomposition (the bench matrix in profile_envelope.sh gives the
between-stage half).

Each component is timed as its own jitted program with the honest
slope+readback chain (CLAUDE.md): k executions chained through a `* 0.0`
data edge, one scalar readback, slope between two chain lengths.

Run ONE at a time on TPU, in background:
  nohup python scripts/profile_perception.py > logs/profile_perception.log 2>&1 &

PROF_CPU=1 runs the same on CPU (shape shakeout).
Components (PROF_ONLY=comma-list to restrict):
  subsample     device-side deterministic target subsample (top_k 287k)
  pwc           pwcnet_forward at padded 448x640
  masknet       masknet_forward at padded 448x640
  flow_dense    flow_correspondences (dense lift)
  flow_sparse   flow_targets_at_points at 8192 projections
  lepard        scene_flow (shipped checkpoint, 8192 vs 2048)
  pyramid       one build_pyramid of the 8192 cloud
  motion        motion_step at cap 512
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROF_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np

H, W = 448, 640
P = 8192
Q = 2048
K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))


def note(msg):
    print(f"[perception] {msg}", flush=True)


def chain_time(name, step):
    s = step(jnp.float32(0.0))
    float(s)

    def run(k):
        t0 = time.perf_counter()
        ss = jnp.float32(0.0)
        for _ in range(k):
            ss = step(ss)
        float(ss)
        return time.perf_counter() - t0

    t1 = min(run(K1) for _ in range(3))
    t2 = min(run(K2) for _ in range(3))
    dt = (t2 - t1) / (K2 - K1)
    note(f"{name:28s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    from occlusionfusion_tpu.geometry.camera import Intrinsics

    only = os.environ.get("PROF_ONLY")
    only = set(only.split(",")) if only else None

    def want(name):
        return only is None or name in only

    note(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    intr = Intrinsics(
        np.float32(2.3 * W), np.float32(2.3 * W),
        np.float32(W / 2), np.float32(H / 2),
    )
    # synthetic sphere depth + noise texture
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    d = np.stack(
        [(u - intr.cx) / intr.fx, (v - intr.cy) / intr.fy, np.ones_like(u)],
        -1,
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray([0.0, 0.0, 1.0])
    b = d @ c
    disc = b * b - (c @ c - 0.1 * 0.1)
    t = b - np.sqrt(np.maximum(disc, 0))
    depth_np = np.where((disc > 0) & (t > 0), t * d[..., 2], 0.0).astype(
        np.float32
    )
    color_np = (rng.rand(H, W, 3) * 255).astype(np.float32)
    depth = jnp.asarray(depth_np)
    color = jnp.asarray(color_np)

    from occlusionfusion_tpu.fusion.fused_step import (
        _deterministic_target_subsample,
        _rgbxyz_image,
    )

    rgbxyz1 = _rgbxyz_image(depth, color, intr)
    rgbxyz2 = _rgbxyz_image(depth, color[:, :, ::-1], intr)

    pts = rng.randn(P, 3).astype(np.float32) * 0.08 + np.asarray(
        [0, 0, 1.0], np.float32
    )
    pts_j = jnp.asarray(pts)
    pvalid = jnp.ones(P, bool)
    zc = jnp.maximum(pts_j[:, 2], 1e-6)
    uv = jnp.stack(
        [pts_j[:, 0] / zc * intr.fx + intr.cx,
         pts_j[:, 1] / zc * intr.fy + intr.cy], -1
    )

    if want("subsample"):
        @jax.jit
        def sub_step(s):
            p, val = _deterministic_target_subsample(depth + s * 0.0, intr, Q)
            return p.ravel()[0]

        chain_time("target_subsample_topk", sub_step)

        @jax.jit
        def sub_step2(s):
            p, val = _deterministic_target_subsample(
                depth + s * 0.0, intr, Q, method="strided"
            )
            return p.ravel()[0]

        chain_time("target_subsample_strided", sub_step2)

    ck_path = os.environ.get("PROF_FLOW_CKPT", "checkpoints/flow.npz")
    if os.path.exists(ck_path):
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed
        from occlusionfusion_tpu.utils.snapshot import load_params

        ck = normalize_indexed(load_params(ck_path))
        pwc_params, mask_params = ck["pwc"], ck.get("mask")
        from occlusionfusion_tpu.models.pwcnet import (
            masknet_forward,
            pwcnet_forward,
        )

        Hp = -(-H // 64) * 64
        Wp = -(-W // 64) * 64
        im1 = jnp.pad(
            rgbxyz1, ((0, 0), (0, Hp - H), (0, Wp - W))
        )[None, :3].transpose(0, 2, 3, 1)
        im2 = jnp.pad(
            rgbxyz2, ((0, 0), (0, Hp - H), (0, Wp - W))
        )[None, :3].transpose(0, 2, 3, 1)

        if want("pwc"):
            @jax.jit
            def pwc_step(s):
                f, _ = pwcnet_forward(pwc_params, im1 + s * 0.0, im2)
                return f.ravel()[0]

            chain_time("pwcnet_forward", pwc_step)

        if want("masknet") and mask_params is not None:
            _, feat = jax.jit(pwcnet_forward)(pwc_params, im1, im2)
            s6 = jnp.pad(rgbxyz1, ((0, 0), (0, Hp - H), (0, Wp - W)))[
                None
            ].transpose(0, 2, 3, 1)

            @jax.jit
            def mask_step(s):
                w = masknet_forward(mask_params, feat + s * 0.0, s6, s6)
                return w.ravel()[0]

            chain_time("masknet_forward", mask_step)

        from occlusionfusion_tpu.fusion.flow_correspondence import (
            flow_correspondences,
            flow_targets_at_points,
        )

        if want("flow_dense"):
            @jax.jit
            def fd_step(s):
                _, tgt, val, wts = flow_correspondences(
                    pwc_params, rgbxyz1 + s * 0.0, rgbxyz2,
                    mask_params=mask_params,
                )
                return tgt.ravel()[0] + wts.ravel()[0]

            chain_time("flow_dense_lift", fd_step)

        if want("flow_sparse"):
            @jax.jit
            def fs_step(s):
                tgt, val, wts = flow_targets_at_points(
                    pwc_params, rgbxyz1 + s * 0.0, rgbxyz2, uv,
                    mask_params=mask_params,
                )
                return tgt.ravel()[0] + wts.ravel()[0]

            chain_time("flow_sparse_lift", fs_step)
    else:
        note(f"no flow checkpoint at {ck_path}; skipping flow components")

    lp_path = os.environ.get(
        "PROF_LEPARD_CKPT", "checkpoints/lepard_trained.npz"
    )
    if os.path.exists(lp_path) and want("lepard"):
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )
        from occlusionfusion_tpu.models.lepard import scene_flow

        lp, lc = load_lepard_checkpoint(lp_path)
        tgt_pcd, tgt_valid = _deterministic_target_subsample(depth, intr, Q)

        @functools.partial(jax.jit)
        def lep_step(s):
            f, m, _ = scene_flow(
                lp, lc, pts_j + s * 0.0, pvalid, tgt_pcd, tgt_valid
            )
            return f.ravel()[0]

        chain_time("lepard_scene_flow", lep_step)

        if want("pyramid"):
            from occlusionfusion_tpu.models import kpconv as KK

            @jax.jit
            def pyr_step(s):
                levels = KK.build_pyramid(
                    pts_j + s * 0.0, pvalid, lc.kpfcn.pyramid
                )
                return levels[-1].points.ravel()[0]

            chain_time("build_pyramid_8192", pyr_step)

    if want("motion"):
        from occlusionfusion_tpu.fusion.motion_runner import (
            MotionRunnerState,
            init_state,
            level_sizes_for,
            motion_step,
            pack_frame,
            _unpack_pyramid,
        )
        from occlusionfusion_tpu.models.checkpoint import (
            load_motion_complete_params,
        )

        cap = 512
        levels = level_sizes_for(cap)
        mp = load_motion_complete_params()
        n = 300
        sizes = [n, n // 4, n // 16, n // 48]
        nn = [
            rng.randint(0, sizes[l], size=(sizes[l], k)).astype(np.int16)
            for l, k in enumerate((8, 6, 4, 3))
        ]
        down = [
            np.sort(
                rng.choice(sizes[l], size=sizes[l + 1], replace=False)
            ).astype(np.int16)
            for l in range(3)
        ]
        up = [
            rng.randint(0, sizes[l + 1], size=sizes[l]).astype(np.int16)
            for l in range(3)
        ]
        dummy = np.zeros((n, 3), np.float32)
        ints, _ = pack_frame(
            dummy, dummy, np.zeros(n, bool), nn, down, up,
            level_sizes=levels,
        )
        ints_j = jnp.asarray(ints)
        mstate = init_state(cap)
        nodes_pad = jnp.zeros((cap, 3), jnp.float32).at[:n].set(
            jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.2)
        )
        motion_pad = jnp.zeros((cap, 3), jnp.float32)
        observed = jnp.zeros((cap,), bool).at[:n].set(True)

        @functools.partial(jax.jit, static_argnames=())
        def mot_step(s):
            pyr = _unpack_pyramid(ints_j, levels)
            st, (completed, conf) = motion_step(
                mp, mstate, nodes_pad + s * 0.0, motion_pad, observed,
                jnp.int32(n), pyr, n0_cap=cap,
            )
            return completed.ravel()[0]

        chain_time("motion_step_cap512", mot_step)

    note("done")


if __name__ == "__main__":
    main()
