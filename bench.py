#!/usr/bin/env python
"""Benchmark: fused dynamic-fusion throughput (the headline metric).

Default mode prints TWO JSON lines, each measured in its own fresh
child process (the relay's per-dispatch overhead grows within a
process):
  1. fused_fusion_fps — the FULL per-frame fusion loop (correspondence
     search, node visibility, per-node motion observation, the
     Gauss-Newton warp solve, warp-aware TSDF integration) as a chunked
     lax.scan at 64^3 voxels / 4k points / 128-node cap (the fast small
     config);
  2. envelope_full_perception_fps — the REFERENCE ENVELOPE headline:
     128^3 @ 5 mm bricked volume, 448x640 frames, cap 256, with the
     complete perception loop in-scan every frame (PWC flow + MaskNet +
     Lepard + motion GNN) using only accuracy-validated levers
     (ENVELOPE_ENV below). This is the line that answers the >=30 fps
     north star.
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Setting any BENCH_* scale/stage override prints exactly that one
configured line instead (manual probe mode); BENCH_ENVELOPE=0/1
forces the envelope line off/on.

vs_baseline is measured against the driver's north-star real-time target
of 30 fps dynamic fusion (BASELINE.md): value / 30. Measured 95 fps on
one v5e through the axon relay (2026-08-19, slope+readback timing,
Pallas GN assembly).

BENCH_MODE=motion switches to the motion-completion demo throughput
(BASELINE config 1); BENCH_MODE=fusion times unchunked per-frame
dispatches.

Reference-envelope run (the reference's own default scale — 128^3 @
5 mm voxels, 448x640 frames, bricked sparse volume):

  BENCH_VOL=128 BENCH_VOXEL_SIZE=0.005 BENCH_IMG=448x640 \
  BENCH_MAX_NODES=512 BENCH_MAX_POINTS=8192 BENCH_BRICK=8 \
  BENCH_MAX_BRICKS=1024 BENCH_NODE_COVERAGE=0.05 BENCH_BUDGET_S=2400 \
  python bench.py          # add BENCH_MOTION=1 for the occlusion GNN

Learned perception in-loop (the reference's hot loop runs PWC flow +
Lepard matching + the motion GNN every frame, fusion.py:137-148):
BENCH_FLOW=1 adds PWC+MaskNet flow correspondences (weights from
BENCH_FLOW_CKPT, default checkpoints/flow.npz), BENCH_LEPARD=1 adds
matcher scene flow (BENCH_LEPARD_CKPT, default
checkpoints/lepard_trained.npz); combine with BENCH_MOTION=1 for the
full reference loop. BENCH_FLOW_DS=N runs PWC at 1/N resolution.

Measured 2026-08-21 AFTER the device-parked-params fix (quiet host,
slope+readback, one v5e; every pre-fix perception number — 7.33/5.69/
5.53/4.36/8.71/13.84 fps — was dominated by per-dispatch re-upload of
the numpy checkpoint pytrees and is obsolete, see
scripts/probe_param_upload.py):
  cap-256 envelope: base 35.35; +GNN 33.44; +lepard 32.77;
  +flow(dense) 20.06; FULL loop 18.68; FULL with
  BENCH_FLOW_LIFT=sparse BENCH_FLOW_BF16=1 BENCH_MASK_DS=2 = 24.03,
  + BENCH_FLOW_DS=2 = 25.72 (cap 512: 19.01).

The ACCURACY-VALIDATED full-perception headline (every lever in it has
a no-cost matrix row in docs/EVAL_MATRIX.md — flow_ds2 is excluded
because the matrix showed it costs 2x ATE on arms):
  ...opt levers above (no FLOW_DS) + BENCH_LEPARD_SUBSAMPLE=strided
  BENCH_GN_ITERS=2  -> 33.32 fps (gn3: 28.05); recipe in
  scripts/probe_r4_final2.sh, matrix rows limbs5_gn2/arms_gn2.
"""

import json
import os
import time
from glob import glob

import numpy as np

REF_INPUT = "/root/reference/data/input"
BASELINE_FPS = 30.0


def load_frames(limit):
    frames = []
    node_files = sorted(glob(os.path.join(REF_INPUT, "node", "*.npy")))[:limit]
    for nf_path in node_files:
        frame_id = os.path.basename(nf_path).split(".")[0]
        nf = np.load(nf_path)
        pyd = dict(np.load(os.path.join(REF_INPUT, "graph", f"{frame_id}.npz")))
        frames.append((nf, pyd))
    return frames


def synthetic_frames(limit, n_nodes=227):
    rng = np.random.RandomState(0)
    sizes = [n_nodes, 55, 17, 6]
    ks = (8, 6, 4, 3)
    pyd = {}
    for l in range(4):
        pyd[f"nn_index_l{l}"] = rng.randint(
            0, sizes[l], size=(sizes[l], ks[l])
        ).astype(np.int16)
    for i in (1, 2, 3):
        pyd[f"down_sample_idx{i}"] = np.sort(
            rng.choice(sizes[i - 1], size=sizes[i], replace=False)
        ).astype(np.int16)
        pyd[f"up_sample_idx{i}"] = rng.randint(
            0, sizes[i], size=sizes[i - 1]
        ).astype(np.int16)
    frames = []
    pos = rng.randn(n_nodes, 3).astype(np.float32) * 0.2
    for _ in range(limit):
        nf = np.zeros((n_nodes, 7), np.float32)
        nf[:, :3] = pos
        nf[:, 3:6] = rng.randn(n_nodes, 3) * 0.004
        nf[:, 6] = (rng.rand(n_nodes) > 0.3).astype(np.float32)
        frames.append((nf, pyd))
    return frames


def bench_fusion():
    """Full fused fusion loop: synthetic deforming sphere, 64^3 volume,
    gn_dense solver. Measures 'fused frames/sec/chip' directly; the
    chunked variant (default) scans 16 frames per dispatch, which is the
    production shape through the relay (measured 95 fps at the 128-node
    cap on one v5e, 2026-08-19)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import jax
    import jax.numpy as jnp

    from occlusionfusion_tpu.fusion.frame_loader import ArraySequence
    from occlusionfusion_tpu.fusion.pipeline import DynamicFusion, FusionConfig
    from occlusionfusion_tpu.geometry.camera import Intrinsics
    from occlusionfusion_tpu.graph.edgraph import GraphConfig
    from occlusionfusion_tpu.solvers.nicp import NICPConfig

    from occlusionfusion_tpu.solvers.gauss_newton import GNConfig

    def make_sequence(n_frames, h, w, step=(0.0, 0.0, 0.004), r=0.1):
        """Analytic deforming-sphere RGB-D sequence at any resolution
        (generalizes tests/test_fusion_e2e.make_sequence; f scales with
        the image so the sphere subtends the same view)."""
        intr = Intrinsics(
            np.float32(2.3 * w), np.float32(2.3 * w),
            np.float32(w / 2), np.float32(h / 2),
        )
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        dx = (u - intr.cx) / intr.fx
        dy = (v - intr.cy) / intr.fy
        d = np.stack([dx, dy, np.ones_like(dx)], -1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        depths, colors = [], []
        for i in range(n_frames):
            c = np.asarray([0.0, 0.0, 1.0]) + np.asarray(step) * i
            b = d @ c
            disc = b * b - (c @ c - r * r)
            hit = disc > 0
            t = b - np.sqrt(np.maximum(disc, 0))
            depth = np.where(hit & (t > 0), t * d[..., 2], 0.0)
            depths.append(depth.astype(np.float32))
            colors.append(np.full((h, w, 3), 128.0, np.float32))
        return ArraySequence(colors, depths, intr)

    # defaults from the quiet v5e profile (2026-08-18): GN converges by
    # iter 4 (README); block-scatter assembly (GNConfig default) does
    # true-FLOP work, so the full-precision normal matrix is affordable
    gn = GNConfig(
        iters=int(os.environ.get("BENCH_GN_ITERS", "4")),
        w_point=1.0, w_arap=2.0,
        w_motion=1.0 if os.environ.get("BENCH_MOTION") == "1" else 0.0,
        linear_solver=os.environ.get("BENCH_LINSOLVE", "cholesky"),
        assembly=os.environ.get("BENCH_ASSEMBLY", "auto"),
        normal_matrix_precision=os.environ.get("BENCH_APREC", "highest"),
    )
    vol = int(os.environ.get("BENCH_VOL", "64"))
    vox_size = float(os.environ.get("BENCH_VOXEL_SIZE", "0.008"))
    ncov = float(os.environ.get("BENCH_NODE_COVERAGE", "0.03"))
    himg, wimg = (
        int(x) for x in os.environ.get("BENCH_IMG", "128x128").split("x")
    )
    lepard_params = lepard_config = None
    if os.environ.get("BENCH_LEPARD") == "1":
        from occlusionfusion_tpu.models.checkpoint import (
            load_lepard_checkpoint,
        )

        lepard_params, lepard_config = load_lepard_checkpoint(
            os.environ.get(
                "BENCH_LEPARD_CKPT", "checkpoints/lepard_trained.npz"
            )
        )
        if os.environ.get("BENCH_LEPARD_BATCHED") == "1":
            lepard_config = lepard_config._replace(batched_encode=True)
    flow_params = mask_params = None
    if os.environ.get("BENCH_FLOW") == "1":
        from occlusionfusion_tpu.utils.snapshot import load_params
        from occlusionfusion_tpu.models.checkpoint import normalize_indexed

        ck = normalize_indexed(
            load_params(
                os.environ.get("BENCH_FLOW_CKPT", "checkpoints/flow.npz")
            )
        )
        flow_params = ck["pwc"]
        mask_params = ck.get("mask")
    cfg = FusionConfig(
        vol_dim=(vol, vol, vol), voxel_size=vox_size, node_coverage=ncov,
        max_nodes=int(os.environ.get("BENCH_MAX_NODES", "128")),
        max_points=int(os.environ.get("BENCH_MAX_POINTS", "4096")),
        max_depth_diff=0.05,
        graph=GraphConfig(node_coverage=ncov, min_neighbors=2),
        nicp=NICPConfig(iters=100, w_motion=0.0, lr=0.02),
        use_motion_model=os.environ.get("BENCH_MOTION") == "1",
        solver=os.environ.get("BENCH_SOLVER", "gn_dense"),
        gn=gn,
        brick_size=int(os.environ.get("BENCH_BRICK", "-1")),
        max_bricks=int(os.environ.get("BENCH_MAX_BRICKS", "2048")),
        dense_skin_max_bytes=int(
            os.environ.get("BENCH_DENSE_SKIN_MAX", str(1 << 31))
        ),
        use_lepard=lepard_params is not None,
        use_flow=flow_params is not None,
        lepard_max_target_points=int(
            os.environ.get("BENCH_LEPARD_TARGETS", "2048")
        ),
        lepard_every=int(os.environ.get("BENCH_LEPARD_EVERY", "1")),
        lepard_subsample=os.environ.get("BENCH_LEPARD_SUBSAMPLE", "topk"),
        flow_downscale=int(os.environ.get("BENCH_FLOW_DS", "1")),
        flow_lift=os.environ.get("BENCH_FLOW_LIFT", "dense"),
        flow_mode=os.environ.get("BENCH_FLOW_MODE", "fill"),
        flow_bf16=os.environ.get("BENCH_FLOW_BF16") == "1",
        mask_downscale=int(os.environ.get("BENCH_MASK_DS", "1")),
    )
    seq = make_sequence(24, himg, wimg)
    motion_params = None
    if os.environ.get("BENCH_MOTION") == "1":
        # occlusion-aware motion completion in the loop (the flagship
        # subsystem): load the converted reference checkpoint
        from occlusionfusion_tpu.models.checkpoint import (
            load_motion_complete_params,
        )

        motion_params = load_motion_complete_params()
    fusion = DynamicFusion(
        seq, cfg, motion_params=motion_params,
        lepard_params=lepard_params, lepard_config=lepard_config,
        flow_params=flow_params, mask_params=mask_params,
    )
    fusion.initialize(seq.load(0))
    sc, state, tables = fusion.build_fused(motion_params)
    state, info = fusion.register_frame_fused(
        sc, state, tables, seq.load(1), motion_params
    )
    # warmup: compile + pay the relay's one-time first-fetch penalty
    float(info[0])

    # IMPORTANT (measured): through the axon relay block_until_ready does
    # NOT wait for device execution (a 8192^3 matmul "completes" in
    # 0.15 ms = 7400 TFLOP/s on a 197-TFLOP chip). Honest timing forces a
    # scalar readback and uses the slope between two chain lengths, which
    # cancels both the dispatch pipelining and the d2h fetch latency.
    def run_frames(k):
        nonlocal state
        t0 = time.perf_counter()
        for i in range(k):
            state, info = fusion.register_frame_fused(
                sc, state, tables, seq.load(i % 23 + 1), motion_params
            )
        float(info[0])  # forces execution of the whole chain
        return time.perf_counter() - t0

    n1, n2 = 5, 25
    t1 = run_frames(n1)
    t2 = run_frames(n2)
    fps = (n2 - n1) / max(t2 - t1, 1e-9)

    if os.environ.get("BENCH_MODE") == "fusion_chunked":
        # one dispatch per K frames (lax.scan) — the production shape:
        # amortizes the relay's per-dispatch overhead K-fold
        from occlusionfusion_tpu.fusion.fused_step import (
            fused_register_chunk,
        )

        K = int(os.environ.get("BENCH_CHUNK", "16"))
        # device-park the motion checkpoint: numpy leaves as jit args
        # re-upload host->device on EVERY dispatch through the relay
        # (measured 43 ms/call for the 164-leaf motion tree; the
        # lepard/flow trees are parked by DynamicFusion.__init__)
        if motion_params is not None:
            motion_params = jax.device_put(motion_params)
        intr_dev = jax.device_put(fusion.intr)
        depths = jnp.stack(
            [jnp.asarray(seq.load(i % 23 + 1).depth) for i in range(K)]
        )
        colors = jnp.stack(
            [jnp.asarray(seq.load(i % 23 + 1).color) for i in range(K)]
        )

        def run_chunks(k):
            nonlocal state
            t0 = time.perf_counter()
            infos = None
            for _ in range(k):
                state, infos = fused_register_chunk(
                    sc, state, tables, motion_params, depths, colors,
                    intr_dev, fusion.perception,
                )
            float(infos[0, 0])
            return time.perf_counter() - t0

        run_chunks(1)  # compile
        c1 = min(run_chunks(2) for _ in range(3))
        c2 = min(run_chunks(8) for _ in range(3))
        fps = 6 * K / max(c2 - c1, 1e-9)
    print(
        json.dumps(
            {
                "metric": os.environ.get("BENCH_METRIC", "fused_fusion_fps"),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )


# The accuracy-validated full-perception reference envelope (the number
# that answers the >=30 fps north star): the reference's own scale —
# 128^3 @ 5 mm bricked volume, 448x640 frames — with the COMPLETE hot
# loop in-scan every frame (PWC flow + MaskNet + Lepard matching +
# motion GNN, fusion.py:137-148) and only matrix-validated levers
# (docs/EVAL_MATRIX.md: sparse lift / bf16 perception / half-res
# MaskNet / strided subsample / 2 GN iters all cost zero accuracy;
# flow_ds2 is excluded because it costs 2x ATE on arms). Measured
# 33.32 fps on one v5e (2026-08-21, scripts/probe_r4_final2.sh).
ENVELOPE_ENV = {
    "BENCH_MODE": "fusion_chunked",
    "BENCH_VOL": "128",
    "BENCH_VOXEL_SIZE": "0.005",
    "BENCH_IMG": "448x640",
    "BENCH_MAX_NODES": "256",
    "BENCH_MAX_POINTS": "8192",
    "BENCH_BRICK": "8",
    "BENCH_MAX_BRICKS": "1024",
    "BENCH_NODE_COVERAGE": "0.05",
    "BENCH_MOTION": "1",
    "BENCH_FLOW": "1",
    "BENCH_LEPARD": "1",
    "BENCH_FLOW_LIFT": "sparse",
    "BENCH_FLOW_BF16": "1",
    "BENCH_MASK_DS": "2",
    "BENCH_LEPARD_SUBSAMPLE": "strided",
    "BENCH_GN_ITERS": "2",
    "BENCH_METRIC": "envelope_full_perception_fps",
}


def main():
    mode = os.environ.get("BENCH_MODE", "fusion_chunked")
    if mode in ("fusion", "fusion_chunked"):
        os.environ["BENCH_MODE"] = mode
        bench_fusion()
        return
    from occlusionfusion_tpu.fusion.motion_runner import MotionCompletionRunner

    try:
        from occlusionfusion_tpu.models.checkpoint import (
            load_motion_complete_params,
        )

        params = load_motion_complete_params()
    except Exception:
        from occlusionfusion_tpu.models.motion_complete import init_params
        import jax

        params = init_params(jax.random.PRNGKey(0))

    n_frames = int(os.environ.get("BENCH_FRAMES", "512"))
    if os.path.isdir(REF_INPUT):
        frames = load_frames(n_frames)
    else:
        frames = synthetic_frames(n_frames)

    runner = MotionCompletionRunner(params)
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))

    def frame_dict(nf, pyd):
        return dict(
            node_pos=nf[:, :3],
            node_motion=nf[:, 3:6],
            visible=nf[:, -1] > 0.5,
            nn_indexes=[pyd[f"nn_index_l{l}"] for l in range(4)],
            down_idxs=[pyd[f"down_sample_idx{i}"] for i in (1, 2, 3)],
            up_idxs=[pyd[f"up_sample_idx{i}"] for i in (1, 2, 3)],
        )

    import sys

    import jax
    import jax.numpy as jnp
    import numpy as _np

    from occlusionfusion_tpu.fusion.motion_runner import (
        init_state,
        motion_scan,
        pack_frame,
    )

    def note(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    dicts = [frame_dict(nf, pyd) for nf, pyd in frames]
    packed = [
        pack_frame(
            d["node_pos"], d["node_motion"], d["visible"],
            d["nn_indexes"], d["down_idxs"], d["up_idxs"],
        )
        for d in dicts
    ]
    note(f"{len(packed)} frames packed; chunk {chunk}")

    # IMPORTANT (measured): through the axon relay block_until_ready does
    # NOT wait for device execution — it only tracks enqueue. Honest
    # timing must force a scalar readback; using the slope between two
    # chain lengths cancels both dispatch pipelining and the (varying)
    # d2h fetch latency. The relay's FIRST fetch per process costs
    # seconds-to-minutes, so the warmup pays it before any timing.
    state = init_state()
    n = (len(packed) // chunk) * chunk

    def run_chunk_device(state, lo):
        ib = jnp.asarray(_np.stack([packed[i][0] for i in range(lo, lo + chunk)]))
        fb = jnp.asarray(_np.stack([packed[i][1] for i in range(lo, lo + chunk)]))
        state, outs = motion_scan(runner.params, state, ib, fb)
        return state, outs

    state, outs = run_chunk_device(state, 0)  # compile warmup
    t0 = time.perf_counter()
    float(outs[0, 0, 0])  # one-time first-fetch penalty, paid here
    note(f"warmup done (first fetch {time.perf_counter() - t0:.1f}s); timing")

    def run_frames(k_chunks, lo0):
        nonlocal state
        t0 = time.perf_counter()
        outs = None
        for c in range(k_chunks):
            state, outs = run_chunk_device(state, (lo0 + c * chunk) % n)
        float(outs[0, 0, 0])  # forces execution of the whole chain
        return time.perf_counter() - t0

    k_total = n // chunk
    k1 = max(k_total // 4, 1)
    k2 = k_total
    t1 = run_frames(k1, 0)
    state = init_state()
    t2 = run_frames(k2, 0)
    fps = (k2 - k1) * chunk / max(t2 - t1, 1e-9)

    print(
        json.dumps(
            {
                "metric": "motion_completion_device_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


def _supervise():
    """Run the measurement in a child process under a watchdog.

    The tunneled TPU worker in this environment intermittently crashes or
    wedges its device->host path (a blocked fetch cannot be interrupted
    in-process), so the parent stays jax-free, gives the child a hard
    budget, and retries once in a fresh process after a cool-down.
    """
    import subprocess as _sp
    import sys

    def run_child(env, budget, label):
        b = budget
        for attempt in (1, 2):
            child = _sp.Popen([sys.executable, __file__], env=env)
            try:
                rc = child.wait(timeout=b)
            except _sp.TimeoutExpired:
                child.kill()
                child.wait()
                rc = -1
                print(
                    f"[bench] {label} attempt {attempt} exceeded {b}s "
                    "(wedged TPU relay?)",
                    file=sys.stderr,
                    flush=True,
                )
            if rc == 0:
                return 0
            if attempt == 1:
                print(
                    f"[bench] {label} attempt 1 failed (rc={rc}); cooling "
                    "down 300 s then retrying in a fresh process",
                    file=sys.stderr,
                    flush=True,
                )
                time.sleep(300)
                b *= 2
        return 1

    budget = int(os.environ.get("BENCH_BUDGET_S", "1500"))
    env = dict(os.environ, BENCH_CHILD="1")
    rc = run_child(env, budget, "default")
    # Second line: the reference-envelope full-perception headline, in a
    # FRESH child process (the relay's per-dispatch overhead grows
    # within a process — each measurement must start clean). Only on a
    # plain `python bench.py`: any explicit BENCH_* scale/stage override
    # means a manual probe, which should print exactly its one line.
    manual_probe = any(
        os.environ.get(k) not in (None, "")
        for k in (
            "BENCH_VOL", "BENCH_IMG", "BENCH_MAX_NODES", "BENCH_MODE",
            "BENCH_FLOW", "BENCH_LEPARD", "BENCH_MOTION", "BENCH_GN_ITERS",
        )
    )
    want_envelope = os.environ.get("BENCH_ENVELOPE", "")
    if want_envelope == "1" or (want_envelope != "0" and not manual_probe):
        env2 = dict(env)
        env2.update(ENVELOPE_ENV)
        rc2 = run_child(
            env2, int(os.environ.get("BENCH_BUDGET_S", "2400")), "envelope"
        )
        if rc2 != 0:
            # non-fatal: the default line already proves the build; a
            # wedged-relay envelope run degrades to one line instead of
            # reporting total failure
            print(
                "[bench] envelope run failed; emitting default line only",
                file=sys.stderr,
                flush=True,
            )
    return rc


if __name__ == "__main__":
    import sys

    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
