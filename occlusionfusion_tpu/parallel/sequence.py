"""Sequence/state sharding for the motion-history pipeline.

SURVEY §5: the reference's only sequence machinery is the 16-frame
motion-history ring buffer feeding a 2-layer LSTM — tiny, but the TPU
design must scale it. Two shardings are provided:

  * node-axis sharding (the practical one): the history tensor
    [T, N, 4] is batch-parallel over nodes for the LSTM; shard N across
    the mesh and every device runs the recurrence on its node shard with
    zero communication (the LSTM has no cross-node term);
  * time-axis ring pipeline (for histories far longer than device
    memory): the sequence is split into T/n chunks along the mesh ring;
    device d processes chunk d after receiving the carry (h, c) from
    device d-1 via ppermute — a pipeline over the recurrence, exposing
    the classic bubble trade-off.

Both produce results identical to the single-device LSTM (tests assert
equality on the 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from occlusionfusion_tpu.models.motion_complete import lstm_forward


def lstm_node_sharded(
    mesh: Mesh, params, history: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    """history [T, N, 4] with N sharded over ``axis`` -> [T, N, H].

    The recurrence is elementwise over the batch (node) dimension, so
    sharding N is communication-free; XLA just runs the scan per shard.
    """
    hist_sharded = jax.device_put(history, NamedSharding(mesh, P(None, axis)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def run(params, h):
        return lstm_forward(params, h)

    return jax.jit(run)(params, hist_sharded)


def lstm_time_ring(
    mesh: Mesh, params, history: jnp.ndarray, axis: str = "data"
) -> jnp.ndarray:
    """history [T, N, 4] with T sharded over the mesh ring.

    Device d runs its time chunk after receiving the (h, c) carry from
    device d-1 (ppermute hand-off); outputs reassemble to the full
    [T, N, H]. Exact but serialized across the ring — use when T is the
    scaling axis (long-horizon histories), not for the 16-frame demo.
    """
    n_dev = mesh.shape[axis]
    T = history.shape[0]
    assert T % n_dev == 0, (T, n_dev)
    hist_sharded = jax.device_put(history, NamedSharding(mesh, P(axis)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(params, chunk):
        B = chunk.shape[1]
        my = jax.lax.axis_index(axis)

        def one_layer(layer: int, x):
            w_ih = params[f"weight_ih_l{layer}"]
            w_hh = params[f"weight_hh_l{layer}"]
            b = params[f"bias_ih_l{layer}"] + params[f"bias_hh_l{layer}"]
            H = w_hh.shape[1]

            def cell(carry, x_t):
                h, c = carry
                gates = (
                    jnp.einsum("bi,gi->bg", x_t, w_ih, precision="highest")
                    + jnp.einsum("bh,gh->bg", h, w_hh, precision="highest")
                    + b
                )
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = (
                    jax.nn.sigmoid(i),
                    jax.nn.sigmoid(f),
                    jax.nn.sigmoid(o),
                )
                g = jnp.tanh(g)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                return (h, c), h

            h0 = jnp.zeros((B, H), x.dtype)
            carry = (h0, h0)
            # ring pipeline: step r processes on device r with the carry
            # received from r-1; non-active devices pass the carry through
            outs = None
            for r in range(n_dev):
                (h_new, c_new), ys = jax.lax.scan(cell, carry, x)
                active = my == r
                h_sel = jnp.where(active, h_new, carry[0])
                c_sel = jnp.where(active, c_new, carry[1])
                outs = jnp.where(active, ys, outs) if outs is not None else (
                    jnp.where(active, ys, jnp.zeros_like(ys))
                )
                # hand the carry to the next device around the ring
                h_sel = jax.lax.ppermute(
                    h_sel, axis, [(d, (d + 1) % n_dev) for d in range(n_dev)]
                )
                c_sel = jax.lax.ppermute(
                    c_sel, axis, [(d, (d + 1) % n_dev) for d in range(n_dev)]
                )
                carry = (h_sel, c_sel)
            return outs

        x = chunk
        for layer in range(2):
            x = one_layer(layer, x)
        return x

    return jax.jit(run)(params, hist_sharded)
