#!/usr/bin/env python
"""Sub-phase TPU profile of the fused voxel warp+project+integrate.

Isolates: LBS deform of V voxels, the depth-image gather (2-D advanced
indexing vs flattened 1-D take), the color gather, and the arithmetic
tail — at the bench scenario (64^3 vol, 96x96 image) and at the
reference's image size (448x640).

Run on TPU in the background:
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

REPS = int(os.environ.get("PROF_REPS", "50"))


def note(msg):
    print(f"[profile] {msg}", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    note(f"{name:44s} {dt * 1e3:8.3f} ms")
    return dt


def make_inputs(vol=64, hw=(96, 96), n_nodes=512, seed=0):
    rng = np.random.RandomState(seed)
    V = vol**3
    H, Wd = hw
    cfg = T.TSDFConfig(vol_dim=(vol,) * 3, voxel_size=0.008, trunc_margin=0.04)
    origin = jnp.asarray([-0.25, -0.25, 0.7], jnp.float32)
    state = T.create_volume(cfg, origin)
    vox = T.voxel_world_points(cfg, origin)
    depth = jnp.asarray(
        (rng.rand(H, Wd) * 0.5 + 0.8).astype(np.float32)
    )
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


@jax.jit
def lbs_only(warp, vox, table):
    return W.deform_points(warp, vox, table)


@jax.jit
def gather2d(depth, py, px):
    return depth[py, px]


@jax.jit
def gather_flat(depth, py, px):
    H, Wd = depth.shape
    return jnp.take(depth.reshape(-1), py * Wd + px)


@jax.jit
def color_gather2d(color, py, px):
    return color[py, px]


@jax.jit
def color_gather_flat(color, py, px):
    H, Wd, _ = color.shape
    return jnp.take(color.reshape(-1, 3), py * Wd + px, axis=0)


@jax.jit
def project_only(vox, intr, hw):
    H, Wd = hw
    z = vox[:, 2]
    zs = jnp.where(z > 0, z, 1.0)
    px = jnp.round(vox[:, 0] / zs * intr.fx + intr.cx).astype(jnp.int32)
    py = jnp.round(vox[:, 1] / zs * intr.fy + intr.cy).astype(jnp.int32)
    return jnp.clip(px, 0, Wd - 1), jnp.clip(py, 0, H - 1)


def run(vol, hw, n_nodes=512):
    note(f"===== vol {vol}^3 ({vol**3} voxels), image {hw[0]}x{hw[1]}, "
         f"{n_nodes} nodes =====")
    cfg, state, vox, table, warp, depth, color, intr = make_inputs(vol, hw)
    warped = lbs_only(warp, vox, table)
    jax.block_until_ready(warped)
    px, py = project_only(vox, intr, hw)
    jax.block_until_ready((px, py))

    timeit("lbs deform (4-anchor ed_warp)", lbs_only, warp, vox, table)
    timeit("project (no gather)", project_only, vox, intr, hw)
    timeit("depth gather 2d indexing", gather2d, depth, py, px)
    timeit("depth gather flat take", gather_flat, depth, py, px)
    timeit("color gather 2d indexing", color_gather2d, color, py, px)
    timeit("color gather flat take", color_gather_flat, color, py, px)

    # full integrate (donates state -> rebuild each call not timed; pass
    # a fresh copy via tree.map outside the loop and re-donate carefully)
    st = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    st2 = T.integrate(cfg, st, warped, table.valid, depth, color, intr)
    jax.block_until_ready(st2.tsdf)
    t0 = time.perf_counter()
    cur = st2
    for _ in range(REPS):
        cur = T.integrate(cfg, cur, warped, table.valid, depth, color, intr)
    jax.block_until_ready(cur.tsdf)
    note(f"{'integrate (full, donated)':44s} "
         f"{(time.perf_counter() - t0) / REPS * 1e3:8.3f} ms")

    # same computation WITHOUT donation, same input each call (the
    # profile_fused.py methodology): measures the relay/allocator cost
    # of producing fresh multi-MB outputs per dispatch
    @jax.jit
    def integ_nodonate(state, warped, valid, depth, color):
        return T.integrate(cfg, state, warped, valid, depth, color, intr)

    base = jax.tree.map(lambda x: jnp.array(x, copy=True), cur)
    out = integ_nodonate(base, warped, table.valid, depth, color)
    jax.block_until_ready(out.tsdf)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = integ_nodonate(base, warped, table.valid, depth, color)
    jax.block_until_ready(out.tsdf)
    note(f"{'integrate (full, NOT donated)':44s} "
         f"{(time.perf_counter() - t0) / REPS * 1e3:8.3f} ms")

    # chunked: K deform+integrate steps in ONE dispatch (lax.scan)
    K = 16

    @jax.jit
    def integ_chunk(state, depths, colors):
        def body(st, frame):
            d, c = frame
            wv = W.deform_points(warp, vox, table)
            return T.integrate(cfg, st, wv, table.valid, d, c, intr), None

        st, _ = jax.lax.scan(body, state, (depths, colors))
        return st

    depths = jnp.broadcast_to(depth, (K,) + depth.shape)
    colors = jnp.broadcast_to(color, (K,) + color.shape)
    st3 = integ_chunk(jax.tree.map(lambda x: jnp.array(x, copy=True), cur),
                      depths, colors)
    jax.block_until_ready(st3.tsdf)
    reps = max(REPS // K, 2)
    t0 = time.perf_counter()
    s = st3
    for _ in range(reps):
        s = integ_chunk(s, depths, colors)
    jax.block_until_ready(s.tsdf)
    note(f"{'deform+integrate (chunked scan, /frame)':44s} "
         f"{(time.perf_counter() - t0) / (reps * K) * 1e3:8.3f} ms")


def main():
    global REPS
    note(f"devices: {jax.devices()}")
    run(64, (96, 96))
    run(64, (448, 640))
    REPS = max(REPS // 5, 2)  # 128^3 buffers are 8x larger; cap in-flight
    run(128, (448, 640))


if __name__ == "__main__":
    main()
