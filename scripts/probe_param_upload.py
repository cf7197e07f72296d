#!/usr/bin/env python
"""Measure per-call host->device param-upload cost through the relay.

Hypothesis (round-4 item 2): the +86 ms/frame in-scan Lepard overhead is
NOT compute — it is the per-dispatch re-upload of the 205-leaf numpy
param pytree passed as a jit argument. Times a trivial jitted reduction
over the full lepard/pwc/motion param trees with (a) numpy leaves per
call vs (b) device-resident leaves, slope+readback methodology.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

def note(m):
    print(f"[probe] {m}", flush=True)

note(f"devices: {jax.devices()}")

from occlusionfusion_tpu.models.checkpoint import (
    load_lepard_checkpoint, load_motion_complete_params, normalize_indexed,
)
from occlusionfusion_tpu.utils.snapshot import load_params

lp, lc = load_lepard_checkpoint("checkpoints/lepard_trained.npz")
ck = normalize_indexed(load_params("checkpoints/flow.npz"))
mp = load_motion_complete_params()

trees = {
    "lepard205": lp,
    "pwcmask146": {"pwc": ck["pwc"], "mask": ck.get("mask")},
    "motion164": mp,
}

@jax.jit
def reduce_tree(params, x):
    s = x
    for leaf in jax.tree.leaves(params):
        s = s + jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
    return s

def chain(params, k):
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(k):
        s = reduce_tree(params, s * 0.0)
    float(s)
    return time.perf_counter() - t0

for name, tree in trees.items():
    nleaves = len(jax.tree.leaves(tree))
    nbytes = sum(np.asarray(l).nbytes for l in jax.tree.leaves(tree))
    # warm compile with np tree
    float(reduce_tree(tree, jnp.float32(0.0)))
    t1 = min(chain(tree, 3) for _ in range(3))
    t2 = min(chain(tree, 12) for _ in range(3))
    per_np = (t2 - t1) / 9
    dev = jax.device_put(tree)
    float(reduce_tree(dev, jnp.float32(0.0)))
    t1 = min(chain(dev, 3) for _ in range(3))
    t2 = min(chain(dev, 12) for _ in range(3))
    per_dev = (t2 - t1) / 9
    note(f"{name}: {nleaves} leaves {nbytes/1e6:.1f} MB  np-args "
         f"{per_np*1e3:8.2f} ms/call   device-args {per_dev*1e3:8.2f} ms/call")
note("done")
