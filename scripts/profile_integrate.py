#!/usr/bin/env python
"""Sub-phase TPU profile of voxel warp + TSDF integrate (slope+readback).

Relay gotchas (CLAUDE.md): block_until_ready tracks enqueue, so every
measurement chains executions through a data dependency and ends with a
scalar readback; the reported number is the slope between two chain
lengths. Run fresh (the relay's dispatch overhead grows in-process):

  nohup python scripts/profile_integrate.py > /tmp/profile_integrate.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PROF_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.fusion import tsdf as T
from occlusionfusion_tpu.fusion import warpfield as W
from occlusionfusion_tpu.geometry.camera import Intrinsics

REPS = int(os.environ.get("PROF_REPS", "24"))


def note(msg):
    print(f"[profile] {msg}", flush=True)


def slope_time(name, step, init_fn, fetch, trials=3):
    """step: carry -> carry (device work, data-dependent chain);
    init_fn: () -> fresh carry (step may donate its input);
    fetch: carry -> float (forces execution).

    Reports the slope between two chain lengths, min over ``trials``
    (the relay's d2h latency varies by tens of ms run to run)."""
    c = step(init_fn())
    fetch(c)  # compile + first-fetch warmup for this program

    def run(k):
        cur = init_fn()
        t0 = time.perf_counter()
        for _ in range(k):
            cur = step(cur)
        fetch(cur)
        return time.perf_counter() - t0

    k1, k2 = max(REPS // 4, 1), REPS
    t1 = min(run(k1) for _ in range(trials))
    t2 = min(run(k2) for _ in range(trials))
    dt = (t2 - t1) / (k2 - k1)
    note(f"{name:44s} {dt * 1e3:8.3f} ms (slope {k1}->{k2}, min of {trials})")
    return dt


def make_inputs(vol=64, hw=(96, 96), n_nodes=512, seed=0):
    rng = np.random.RandomState(seed)
    V = vol**3
    H, Wd = hw
    cfg = T.TSDFConfig(vol_dim=(vol,) * 3, voxel_size=0.008, trunc_margin=0.04)
    origin = jnp.asarray([-0.25, -0.25, 0.7], jnp.float32)
    state = T.create_volume(cfg, origin)
    vox = T.voxel_world_points(cfg, origin)
    depth = jnp.asarray((rng.rand(H, Wd) * 0.5 + 0.8).astype(np.float32))
    color = jnp.asarray((rng.rand(H, Wd, 3) * 255).astype(np.float32))
    intr = Intrinsics(
        np.float32(1.2 * Wd), np.float32(1.2 * Wd),
        np.float32(Wd / 2), np.float32(H / 2),
    )
    nodes = jnp.asarray(rng.rand(n_nodes, 3).astype(np.float32) * 0.5 - 0.25)
    warp = W.WarpFieldState(
        node_positions=nodes,
        node_valid=jnp.ones(n_nodes, bool),
        rotations=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n_nodes, 1, 1)),
        translations=jnp.asarray(rng.rand(n_nodes, 3).astype(np.float32) * 0.01),
    )
    anchors = jnp.asarray(rng.randint(0, n_nodes, (V, 4)).astype(np.int32))
    weights = jnp.full((V, 4), 0.25, jnp.float32)
    table = W.SkinTable(anchors=anchors, weights=weights,
                        valid=jnp.ones(V, bool))
    return cfg, state, vox, table, warp, depth, color, intr


def run(vol, hw, n_nodes=512):
    note(f"===== vol {vol}^3 ({vol**3} voxels), image {hw[0]}x{hw[1]}, "
         f"{n_nodes} nodes =====")
    cfg, state, vox, table, warp, depth, color, intr = make_inputs(vol, hw)

    @jax.jit
    def lbs_step(pts):
        out = W.deform_points(warp, pts, table)
        # feed the output back as the next input: a genuine dependency
        return out

    slope_time("lbs deform (4-anchor ed_warp)", lbs_step, lambda: vox,
               lambda c: float(c[0, 0]))

    @jax.jit
    def gather_step(carry):
        # project + depth&color gather; dependency via carry offset
        pts = vox + carry[None, :]
        z = jnp.maximum(pts[:, 2], 1e-6)
        px = jnp.clip(jnp.round(pts[:, 0] / z * intr.fx + intr.cx
                                ).astype(jnp.int32), 0, hw[1] - 1)
        py = jnp.clip(jnp.round(pts[:, 1] / z * intr.fy + intr.cy
                                ).astype(jnp.int32), 0, hw[0] - 1)
        d = depth[py, px]
        c = color[py, px]
        return carry + jnp.mean(d) * 0.0 + jnp.mean(c) * 0.0

    slope_time("project + depth/color gather", gather_step,
               lambda: jnp.zeros(3, jnp.float32), lambda c: float(c[0]))

    # gather-width scaling: does the random gather cost scale with bytes
    # per index or with index count? (decides whether packing color into
    # one f32 like the reference's b*65536+g*256+r float is worth it)
    packed_col = (
        color[..., 0] + color[..., 1] * 256.0 + color[..., 2] * 65536.0
    )
    rgbd2 = jnp.stack([depth, packed_col], axis=-1)  # [H, W, 2]
    rgbd4 = jnp.concatenate([depth[..., None], color], axis=-1)

    def gather_of(img, chans):
        @jax.jit
        def step(carry):
            pts = vox + carry[None, :]
            z = jnp.maximum(pts[:, 2], 1e-6)
            px = jnp.clip(jnp.round(pts[:, 0] / z * intr.fx + intr.cx
                                    ).astype(jnp.int32), 0, hw[1] - 1)
            py = jnp.clip(jnp.round(pts[:, 1] / z * intr.fy + intr.cy
                                    ).astype(jnp.int32), 0, hw[0] - 1)
            g = img[py, px]
            return carry + jnp.mean(g) * 0.0

        return step

    slope_time("gather 1ch (depth only)", gather_of(depth, 1),
               lambda: jnp.zeros(3, jnp.float32), lambda c: float(c[0]))
    slope_time("gather 2ch (depth + packed rgb f32)", gather_of(rgbd2, 2),
               lambda: jnp.zeros(3, jnp.float32), lambda c: float(c[0]))
    slope_time("gather 4ch (depth + rgb)", gather_of(rgbd4, 4),
               lambda: jnp.zeros(3, jnp.float32), lambda c: float(c[0]))
    flat2 = rgbd2.reshape(-1, 2)

    @jax.jit
    def gather_flat2(carry):
        pts = vox + carry[None, :]
        z = jnp.maximum(pts[:, 2], 1e-6)
        px = jnp.clip(jnp.round(pts[:, 0] / z * intr.fx + intr.cx
                                ).astype(jnp.int32), 0, hw[1] - 1)
        py = jnp.clip(jnp.round(pts[:, 1] / z * intr.fy + intr.cy
                                ).astype(jnp.int32), 0, hw[0] - 1)
        g = flat2[py * hw[1] + px]
        return carry + jnp.mean(g) * 0.0

    slope_time("gather 2ch flat-indexed", gather_flat2,
               lambda: jnp.zeros(3, jnp.float32), lambda c: float(c[0]))

    def integrate_step(st):
        warped = W.deform_points(warp, vox, table)
        return T.integrate(cfg, st, warped, table.valid, depth, color, intr)

    slope_time(
        "deform + integrate (donated chain)", integrate_step,
        lambda: jax.tree.map(lambda x: jnp.array(x, copy=True), state),
        lambda st: float(st.tsdf[0, 0, 0]),
    )

    K = 16
    # per-frame VARYING depth/color so the scan body cannot be hoisted
    # as loop-invariant (with constant frames XLA CSEs the entire body)
    rngK = np.random.RandomState(7)
    depthsK = jnp.asarray(
        (rngK.rand(K, *hw) * 0.5 + 0.8).astype(np.float32))
    colorsK = jnp.asarray(
        (rngK.rand(K, hw[0], hw[1], 3) * 255).astype(np.float32))

    @jax.jit
    def chunk_step(st):
        def body(s, frame):
            d, c = frame
            warped = W.deform_points(warp, vox, table)
            return T.integrate(cfg, s, warped, table.valid, d, c, intr), None
        st, _ = jax.lax.scan(body, st, (depthsK, colorsK))
        return st

    dt = slope_time(
        f"deform+integrate x{K} (one-dispatch scan)", chunk_step,
        lambda: jax.tree.map(lambda x: jnp.array(x, copy=True), state),
        lambda st: float(st.tsdf[0, 0, 0]),
    )
    note(f"{'  -> per frame in the scan':44s} {dt / K * 1e3:8.3f} ms")

    # the REAL fused pattern: the warp changes per frame, so the voxel
    # deform cannot be hoisted out of the scan body as loop-invariant
    transK = jnp.asarray(
        (rngK.rand(K, n_nodes, 3) * 0.01).astype(np.float32))

    @jax.jit
    def chunk_step_varying(st):
        def body(s, frame):
            d, c, t = frame
            wp = warp._replace(translations=t)
            warped = W.deform_points(wp, vox, table)
            return T.integrate(cfg, s, warped, table.valid, d, c, intr), None
        st, _ = jax.lax.scan(body, st, (depthsK, colorsK, transK))
        return st

    dt = slope_time(
        f"varying-warp deform+integrate x{K} (scan)", chunk_step_varying,
        lambda: jax.tree.map(lambda x: jnp.array(x, copy=True), state),
        lambda st: float(st.tsdf[0, 0, 0]),
    )
    note(f"{'  -> per frame in the scan':44s} {dt / K * 1e3:8.3f} ms")

    # --- isolation: which part of the varying-warp body costs? ---
    @jax.jit
    def scan_lbs_only(acc):
        def body(a, t):
            wp = warp._replace(translations=t)
            warped = W.deform_points(wp, vox, table)
            return a + warped[0, 0] * 0.0 + jnp.float32(1), None
        acc, _ = jax.lax.scan(body, acc, transK)
        return acc

    dt = slope_time(f"scan body: LBS only x{K}", scan_lbs_only,
                    lambda: jnp.float32(0), lambda c: float(c))
    note(f"{'  -> per frame':44s} {dt / K * 1e3:8.3f} ms")

    @jax.jit
    def scan_lbs_proj_gather(acc):
        flat_d = depth.reshape(-1)

        def body(a, t):
            wp = warp._replace(translations=t)
            warped = W.deform_points(wp, vox, table)
            z = jnp.maximum(warped[:, 2], 1e-6)
            px = jnp.clip(jnp.round(warped[:, 0] / z * intr.fx + intr.cx
                                    ).astype(jnp.int32), 0, hw[1] - 1)
            py = jnp.clip(jnp.round(warped[:, 1] / z * intr.fy + intr.cy
                                    ).astype(jnp.int32), 0, hw[0] - 1)
            d = flat_d[py * hw[1] + px]
            return a + d[0] * 0.0 + jnp.float32(1), None
        acc, _ = jax.lax.scan(body, acc, transK)
        return acc

    dt = slope_time(f"scan body: LBS+proj+1ch gather x{K}",
                    scan_lbs_proj_gather,
                    lambda: jnp.float32(0), lambda c: float(c))
    note(f"{'  -> per frame':44s} {dt / K * 1e3:8.3f} ms")

    @jax.jit
    def scan_fixedidx_integrate(st):
        # indices vary via a trivial carry-dependent shift (no LBS):
        # isolates integrate's elementwise update + gather with fresh
        # indices from the warp-field cost
        def body(s, frame):
            d, c = frame
            shift = (s.weight.ravel()[0] * 0.0).astype(jnp.float32)
            warped = vox + shift
            return T.integrate(cfg, s, warped, table.valid, d, c, intr), None
        st, _ = jax.lax.scan(body, st, (depthsK, colorsK))
        return st

    dt = slope_time(
        f"scan body: proj+integrate, no LBS x{K}", scan_fixedidx_integrate,
        lambda: jax.tree.map(lambda x: jnp.array(x, copy=True), state),
        lambda st: float(st.tsdf[0, 0, 0]),
    )
    note(f"{'  -> per frame':44s} {dt / K * 1e3:8.3f} ms")

    from occlusionfusion_tpu.ops.lbs import lbs_warp_pallas

    @jax.jit
    def chunk_step_varying_pallas(st):
        def body(s, frame):
            d, c, t = frame
            wp = warp._replace(translations=t)
            warped = lbs_warp_pallas(
                vox, table.anchors, table.weights, table.valid, wp
            )
            return T.integrate(cfg, s, warped, table.valid, d, c, intr), None
        st, _ = jax.lax.scan(body, st, (depthsK, colorsK, transK))
        return st

    dt = slope_time(
        f"varying-warp PALLAS-lbs+integrate x{K} (scan)",
        chunk_step_varying_pallas,
        lambda: jax.tree.map(lambda x: jnp.array(x, copy=True), state),
        lambda st: float(st.tsdf[0, 0, 0]),
    )
    note(f"{'  -> per frame in the scan':44s} {dt / K * 1e3:8.3f} ms")

    from occlusionfusion_tpu.ops.lbs import (
        lbs_warp_dense,
        precompute_dense_skin,
    )

    dense = jax.block_until_ready(
        precompute_dense_skin(table.anchors, table.weights, table.valid,
                              n_nodes)
    )

    # NB: dense must be an ARGUMENT — a closure constant of this size is
    # inlined into the HLO and overflows the relay's compile-request
    # body limit (HTTP 413)
    @jax.jit
    def chunk_step_varying_dense(carry):
        st, dn = carry

        def body(s, frame):
            d, c, t = frame
            wp = warp._replace(translations=t)
            warped = lbs_warp_dense(vox, table.valid, dn, wp)
            return T.integrate(cfg, s, warped, table.valid, d, c, intr), None
        st, _ = jax.lax.scan(body, st, (depthsK, colorsK, transK))
        return st, dn

    dt = slope_time(
        f"varying-warp DENSE-lbs+integrate x{K} (scan)",
        chunk_step_varying_dense,
        lambda: (jax.tree.map(lambda x: jnp.array(x, copy=True), state),
                 dense),
        lambda c: float(c[0].tsdf[0, 0, 0]),
    )
    note(f"{'  -> per frame in the scan':44s} {dt / K * 1e3:8.3f} ms")

    @jax.jit
    def dense_lbs_step(carry):
        acc, dn = carry
        wp = warp._replace(translations=warp.translations + acc * 0.0)
        warped = lbs_warp_dense(vox, table.valid, dn, wp)
        return acc + warped[0, 0] * 0.0 + jnp.float32(1), dn

    slope_time("lbs deform (dense split-bf16 matmul)", dense_lbs_step,
               lambda: (jnp.float32(0), dense), lambda c: float(c[0]))

    # Pallas one-hot-matmul LBS vs the XLA gather path (honest numbers;
    # the 1.46/3.16 ms figures in ops/lbs.py predate slope timing)

    @jax.jit
    def lbs_pallas_step(pts):
        return lbs_warp_pallas(
            pts, table.anchors, table.weights, table.valid, warp
        )

    slope_time("lbs deform (pallas one-hot matmul)", lbs_pallas_step,
               lambda: vox, lambda c: float(c[0, 0]))


def main():
    note(f"devices: {jax.devices()}")
    run(64, (96, 96))
    run(64, (448, 640))


if __name__ == "__main__":
    main()
