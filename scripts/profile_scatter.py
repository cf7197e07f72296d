"""Isolate the block-assembly scatter cost on TPU (in-scan slope).

Compares, at assembly-realistic shapes (cap 512: ~143k rows of 36 floats
into N^2=262144 segments):
  1. jax.ops.segment_sum (unsorted scatter-add)
  2. segment_sum with pre-sorted ids + indices_are_sorted=True
  3. sort-at-trace: argsort + gather + sorted segment_sum
  4. one-hot matmul reduction over a COMPACT pair space (n_pairs ~16k)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def note(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)
    print(f"[profile] {msg}")


def slope_time(name, step, init_fn, readback, n1=6, n2=24, reps=3):
    c = step(init_fn())
    readback(c)
    best = None
    for _ in range(reps):
        ts = []
        for k in (n1, n2):
            c = init_fn()
            t0 = time.perf_counter()
            for _ in range(k):
                c = step(c)
            readback(c)
            ts.append(time.perf_counter() - t0)
        dt = (ts[1] - ts[0]) / (n2 - n1)
        best = dt if best is None else min(best, dt)
    note(f"{name:52s} {best * 1e3:8.3f} ms")
    return best


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8192 * 16 + 512 * 8 * 3
    K = 8
    nseg = cap * cap
    r = np.random.RandomState(0)
    # anchor-pair-like ids: spatially clustered (realistic for skinning)
    base = r.randint(0, cap, size=n_rows)
    off = np.clip(base + r.randint(-8, 9, size=n_rows), 0, cap - 1)
    segs = jnp.asarray((base * cap + off).astype(np.int32))
    segs_sorted = jnp.asarray(np.sort(np.asarray(segs)))
    vals = jnp.asarray(r.randn(n_rows, 36).astype(np.float32))
    note(f"devices: {jax.devices()} rows={n_rows} segs={nseg}")

    def scan_over(body):
        @jax.jit
        def step(carry):
            def f(c, _):
                return body(c), None
            c, _ = jax.lax.scan(f, carry, None, length=K)
            return c
        return step

    def seg_unsorted(c):
        out = jax.ops.segment_sum(vals + c, segs, num_segments=nseg)
        return c + out[0] * 0.0

    def seg_presorted(c):
        out = jax.ops.segment_sum(
            vals + c, segs_sorted, num_segments=nseg,
            indices_are_sorted=True,
        )
        return c + out[0] * 0.0

    def seg_sort_then(c):
        order = jnp.argsort(segs)
        out = jax.ops.segment_sum(
            (vals + c)[order], segs[order], num_segments=nseg,
            indices_are_sorted=True,
        )
        return c + out[0] * 0.0

    for name, body in (
        ("segment_sum unsorted (production)", seg_unsorted),
        ("segment_sum pre-sorted ids", seg_presorted),
        ("argsort + gather + sorted segment_sum", seg_sort_then),
    ):
        dt = slope_time(
            f"{name} x{K}", scan_over(body),
            lambda: jnp.zeros(36, jnp.float32), lambda c: float(c[0]),
        )
        note(f"{'  -> per call':52s} {dt / K * 1e3:8.3f} ms")

    # compact-pair one-hot matmul: pair ids remapped to ~dense range
    uniq = np.unique(np.asarray(segs))
    n_pairs = -(-len(uniq) // 128) * 128
    remap = np.zeros(nseg, np.int64)
    remap[uniq] = np.arange(len(uniq))
    pair_ids = jnp.asarray(remap[np.asarray(segs)].astype(np.int32))
    note(f"compact pairs: {len(uniq)} -> padded {n_pairs}")

    def seg_compact(c):
        out = jax.ops.segment_sum(
            vals + c, pair_ids, num_segments=n_pairs
        )
        return c + out[0] * 0.0

    dt = slope_time(
        f"segment_sum compact pair space x{K}", scan_over(seg_compact),
        lambda: jnp.zeros(36, jnp.float32), lambda c: float(c[0]),
    )
    note(f"{'  -> per call':52s} {dt / K * 1e3:8.3f} ms")


if __name__ == "__main__" and os.environ.get("PROBE") is None:
    main()


def einsum_probe():
    """Append-mode probe: the pair-block einsum at both precisions."""
    P, K = 8192, 4
    r = np.random.RandomState(0)
    J = jnp.asarray(r.randn(P, K, 3, 6).astype(np.float32))
    Kscan = 8

    def scan_over(body):
        @jax.jit
        def step(carry):
            def f(c, _):
                return body(c), None
            c, _ = jax.lax.scan(f, carry, None, length=Kscan)
            return c
        return step

    for prec in ("highest", "default"):
        def body(c, prec=prec):
            blk = jnp.einsum(
                "pkai,plaj->pklij", J + c[None, None], J, precision=prec
            )
            return c + blk[0, 0, 0, :3, :] * 0.0

        dt = slope_time(
            f"pair-block einsum precision={prec} x{Kscan}",
            scan_over(body),
            lambda: jnp.zeros((3, 6), jnp.float32),
            lambda c: float(c[0, 0]),
        )
        note(f"{'  -> per call':52s} {dt / Kscan * 1e3:8.3f} ms")


if __name__ == "__main__" and os.environ.get("PROBE") == "einsum":
    einsum_probe()
