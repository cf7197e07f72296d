"""Roofline accounting for the core kernels + the envelope frame.

Counts FLOPs and HBM bytes per jitted program via XLA's own cost model
(``lowered.compile().cost_analysis()`` — shapes are what matter, not
the executing backend; run on CPU) at the measured shapes, and divides
by the measured quiet-host v5e times (slope+readback, logs cited per
row in docs/ROOFLINE.md) to place each kernel against the calibrated
chip:

  peak compute (bf16 matmul, measured): 182 TFLOP/s  (CLAUDE.md calib)
  peak HBM bandwidth (v5e, public spec): 819 GB/s

CPU-only; run anywhere:  python scripts/roofline.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

PEAK_FLOPS = 182e12
PEAK_HBM = 819e9


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def row(name, flops, bytes_, ms, note=""):
    t = ms * 1e-3
    comp = flops / t / PEAK_FLOPS * 100 if t else 0.0
    mem = bytes_ / t / PEAK_HBM * 100 if t else 0.0
    sol_ms = max(flops / PEAK_FLOPS, bytes_ / PEAK_HBM) * 1e3
    print(
        f"| {name} | {flops/1e9:.2f} | {bytes_/1e6:.1f} | {ms:.2f} | "
        f"{comp:.1f} | {mem:.1f} | {sol_ms:.3f} | {note} |"
    )
    return flops, bytes_


def main():
    P, N = 8192, 256
    print("| kernel | GFLOP | MB | meas ms | %compute | %HBM | SOL ms "
          "| note |")
    print("|---|---|---|---|---|---|---|---|")

    # 1. Pallas GN point-term assembly, envelope shapes P=8192 N=256
    # (logs/profile_gn_split.log: 2.07 ms). Pallas does not lower on
    # the CPU backend, so this row is counted ANALYTICALLY from the
    # kernel's explicit op structure (ops/gn_assembly.py):
    #   MXU: 4 anchors x (hi+lo) one-hot fetches, each
    #        [P, n_pad] @ [n_pad, 128] -> 2*P*n_pad*128 FLOP
    #   VPU: jacobian build + 16 anchor-pair products
    #        (16 pairs x 36 entries x 5 ops) + rhs/residual ~ 40/pt
    #   HBM: inputs P*(3+4+4+4+4)*4 B + node tables 2*n_pad*128*2 B
    #        + outputs P*(16*36 + 4*6 + 1)*4 B
    n_pad = 256
    f = 4 * 2 * 2 * P * n_pad * 128 + P * (16 * 36 * 5 + 200)
    b = (
        P * 19 * 4
        + 2 * n_pad * 128 * 2
        + P * (16 * 36 + 24 + 1) * 4
    )
    row("GN point-term assembly (Pallas, analytic)", float(f), float(b),
        2.07, "one-hot MXU fetch trades FLOPs for gathers by design")

    # 2. JtJ pair scatter into the [N,N] block table (the direct
    # segment_sum the solver uses; logs/profile_gn_split.log: 1.00 ms)
    def scatter(blk, seg):
        rows = blk.reshape(P * 16, 36)
        return jax.ops.segment_sum(rows, seg, num_segments=N * N)

    blk = jnp.zeros((P, 16, 6, 6), jnp.float32)
    seg = jnp.zeros((P * 16,), jnp.int32)
    f, b = cost(scatter, blk, seg)
    row("JtJ pair scatter (segment_sum)", f, b, 1.00,
        "random scatter; compact-pair plan variant measured same order")

    # 3. DenseSkin LBS voxel warp at 64^3 / 512 nodes (the config of
    # the 2.2 ms/frame in-scan LBS+integrate measurement; the LBS
    # matmul dominates its bytes)
    from occlusionfusion_tpu.fusion.warpfield import WarpFieldState
    from occlusionfusion_tpu.ops.lbs import (
        lbs_warp_dense,
        precompute_dense_skin,
    )

    V, NL = 64 ** 3, 512
    vox = jnp.zeros((V, 3), jnp.float32)
    va = jnp.zeros((V, 4), jnp.int32)
    vw = jnp.ones((V, 4), jnp.float32) * 0.25
    dense = precompute_dense_skin(va, vw, jnp.ones(V, bool), NL)
    st = WarpFieldState(
        node_positions=jnp.zeros((NL, 3), jnp.float32),
        node_valid=jnp.ones(NL, bool),
        rotations=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (NL, 1, 1)),
        translations=jnp.zeros((NL, 3), jnp.float32),
    )
    f, b = cost(
        lambda d_, s_: lbs_warp_dense(vox, jnp.ones(V, bool), d_, s_),
        dense, st,
    )
    row("DenseSkin LBS warp 64^3/512n (bf16 matmul)", f, b, 2.2,
        "meas incl. the integrate below (in-scan pair)")

    # 4. TSDF integrate, 448x640 frame into the 64^3 volume
    from occlusionfusion_tpu.fusion.tsdf import (
        TSDFConfig,
        create_volume,
        integrate,
    )
    from occlusionfusion_tpu.geometry.camera import Intrinsics

    intr = Intrinsics(
        np.float32(580.0), np.float32(580.0),
        np.float32(320.0), np.float32(224.0),
    )
    cfg = TSDFConfig(
        vol_dim=(64, 64, 64), voxel_size=0.008, trunc_margin=0.032
    )
    vol = create_volume(cfg, np.zeros(3, np.float32))
    depth = jnp.ones((448, 640), jnp.float32)
    color = jnp.zeros((448, 640, 3), jnp.float32)

    f, b = cost(
        lambda v_, d_, c_, w_: integrate(
            cfg, v_, w_, jnp.ones(V, bool), d_, c_, intr
        ),
        vol, depth, color, vox,
    )
    row("TSDF integrate 64^3 (flat-gather)", f, b, 1.34,
        "random per-voxel pixel gather is the cost")

    # 5. Cholesky factor+solve at 6N=1536 (logs/profile_gn_split.log:
    # 0.41 ms)
    def chol(A_, b_):
        from jax.scipy.linalg import cho_factor, cho_solve

        c = cho_factor(A_)
        return cho_solve(c, b_)

    A = jnp.eye(1536, dtype=jnp.float32)
    rhs = jnp.zeros((1536,), jnp.float32)
    f, b = cost(chol, A, rhs)
    row("Cholesky factor+solve (1536)", f, b, 0.41,
        "sequential panel factorization; latency not throughput")

    # 6. Whole-frame envelope MFU: FLOPs of one full-perception frame /
    # (30.0 ms at the 33.32 fps headline). Counted from the stage
    # programs (PWC+MaskNet sparse lift at 448x640, Lepard scene_flow
    # at 8192/2048, motion GNN, 2 GN iters, LBS+integrate).
    print("|  |  |  |  |  |  |  |  |")
    try:
        from occlusionfusion_tpu.fusion.flow_correspondence import (
            flow_targets_at_points,
        )
        from occlusionfusion_tpu.models.pwcnet import (
            init_masknet_params,
            init_pwcnet_params,
        )

        pwc = init_pwcnet_params(jax.random.PRNGKey(0))
        msk = init_masknet_params(jax.random.PRNGKey(1))
        rgbxyz = jnp.zeros((6, 448, 640), jnp.float32)
        uv = jnp.zeros((P, 2), jnp.float32)
        f_flow, b_flow = cost(
            lambda a, b_, c, d: flow_targets_at_points(
                a, b_, c, d, mask_params=msk, bf16=True, mask_downscale=2
            ),
            pwc, rgbxyz, rgbxyz, uv,
        )
        row("PWC+MaskNet sparse lift (bf16, mask/2)", f_flow, b_flow,
            11.53, "logs r3 micro-profile (pre-opt config 18.45 dense)")

        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )
        from occlusionfusion_tpu.models.lepard import scene_flow

        lp, lc = load_lepard_checkpoint("checkpoints/lepard_trained.npz")
        src = jnp.zeros((P, 3), jnp.float32)
        sv = jnp.ones(P, bool)
        tp = jnp.zeros((2048, 3), jnp.float32)
        tv = jnp.ones(2048, bool)
        f_lep, b_lep = cost(
            lambda p_, s_, t_: scene_flow(p_, lc, s_, sv, t_, tv),
            lp, src, tp,
        )
        row("Lepard scene_flow 8192/2048", f_lep, b_lep, 1.32,
            "r3 micro-profile; latency-bound small-kernel chain")

        from occlusionfusion_tpu.models.checkpoint import (
            load_motion_complete_params,
        )
        from occlusionfusion_tpu.fusion.motion_runner import (
            MotionCompletionRunner,
        )

        mp = load_motion_complete_params()
        runner = MotionCompletionRunner(mp, n0_cap=N)
        from occlusionfusion_tpu.fusion.motion_runner import (
            init_state,
            motion_scan,
            pack_frame,
        )

        sizes = runner.level_sizes if hasattr(runner, "level_sizes") else None
        f_gnn = b_gnn = 0.0
        try:
            from occlusionfusion_tpu.fusion.motion_runner import (
                level_sizes_for,
            )

            ls = level_sizes_for(N)
            ib, fb = pack_frame(
                np.zeros((N, 3), np.float32),
                np.zeros((N, 3), np.float32),
                np.ones(N, bool),
                [np.zeros((n, k), np.int16) for n, k in zip(
                    ls, (8, 6, 4, 3))],
                [np.zeros(n, np.int16) for n in ls[1:]],
                [np.zeros(n, np.int16) for n in ls[:3]],
                level_sizes=ls,
            )
            st0 = init_state(n0=N)
            f_gnn, b_gnn = cost(
                lambda p_, s_, i_, fr_: motion_scan(
                    p_, s_, i_[None], fr_[None], level_sizes=ls
                ),
                runner.params, st0, jnp.asarray(ib), jnp.asarray(fb),
            )
            row("Motion GNN (1 frame, cap 256)", f_gnn, b_gnn, 1.6,
                "ladder delta base->+GNN at the envelope")
        except Exception as e:
            print(f"| motion GNN | skipped: {e} |")

        # headline MFU at the 33.32 fps envelope (30.0 ms/frame):
        # perception + 2 GN iters + scatter/chol + LBS/integrate
        frame_flops = (
            f_flow + f_lep + f_gnn
            + 2 * (4.32e9 + 0.0)  # 2 GN iters: point assembly (+VPU)
            + 9.67e9 * (648 * 512 / 64 ** 3) * (256 / 512)  # env LBS
            + 0.04e9
        )
        mfu = frame_flops / 0.0300 / PEAK_FLOPS * 100
        print(
            f"\nheadline envelope MFU (33.32 fps, 30.0 ms/frame): "
            f"{frame_flops/1e9:.0f} GFLOP/frame -> {mfu:.1f}% of the "
            f"calibrated 182 TFLOP/s"
        )
    except Exception as e:
        print(f"| flow lift | skipped: {e} |")


if __name__ == "__main__":
    main()
