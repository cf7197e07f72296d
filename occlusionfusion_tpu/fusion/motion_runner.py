"""Motion-completion runner: the demo/fusion adapter around the GNN.

TPU-native equivalent of the reference's two motion-completion drivers
(``demo.py:10-163`` and ``run_motion_model.py:45-172``): per frame it
  1. factors out the rigid motion of the visible nodes (Kabsch),
  2. scales to centimeters and sigma-normalizes (+0.1 floor),
  3. maintains the 16-frame motion-history ring buffer, re-normalized
     across frames by sigma_prev / sigma_curr,
  4. runs the network, and
  5. converts (mu, sigma) back to world motion + per-node confidence
     exp(-4 (sigma / (|mu| + 1))^2) (eq. 7 form used by ``demo.py:147-148``).

Unlike the reference (host numpy round trips per frame), *everything* here
is one jitted, statically-shaped step over padded arrays: the history
buffer, normalization chain and Kabsch live on device, and the host only
pads inputs and reads back outputs. Frame-to-frame node growth (new nodes
appended, ``demo.py:74-79``) is handled by the padding, not re-tracing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.geometry.kabsch import weighted_kabsch
from occlusionfusion_tpu.models.motion_complete import (
    PyramidBatch,
    motion_complete_forward,
)

HISTORY_LEN = 16
# padding buckets for the demo-scale pyramid (max observed 429/91/25/17)
LEVEL_SIZES = (512, 128, 32, 32)
LEVEL_KS = (8, 6, 4, 3)


def level_sizes_for(n0_cap: int) -> tuple[int, int, int, int]:
    """Pyramid padding buckets for a given node cap.

    Coverage doubles per level, so the greedy subsample shrinks each
    level ~4x (demo: 429/91/25/17); buckets follow that with a floor of
    32. n0_cap=512 reproduces LEVEL_SIZES exactly (compile-cache and
    golden-test stability for the demo-scale configuration)."""
    if n0_cap == LEVEL_SIZES[0]:
        return LEVEL_SIZES
    c = max(32, n0_cap // 16)
    return (n0_cap, max(32, n0_cap // 4), c, c)


class MotionRunnerState(NamedTuple):
    """Cross-frame carried state (a donated jit argument)."""

    history: jnp.ndarray  # [HISTORY_LEN, N0, 4], left-aligned
    history_len: jnp.ndarray  # scalar int32
    std_prev: jnp.ndarray  # scalar f32
    prev_pos: jnp.ndarray  # [N0, 3]
    prev_visible: jnp.ndarray  # [N0] bool
    prev_n: jnp.ndarray  # scalar int32
    frame_idx: jnp.ndarray  # scalar int32 (0 before the first frame)


def init_state(n0: int = LEVEL_SIZES[0]) -> MotionRunnerState:
    return MotionRunnerState(
        history=jnp.zeros((HISTORY_LEN, n0, 4), jnp.float32),
        history_len=jnp.int32(0),
        std_prev=jnp.float32(1.0),
        prev_pos=jnp.zeros((n0, 3), jnp.float32),
        prev_visible=jnp.zeros((n0,), bool),
        prev_n=jnp.int32(0),
        frame_idx=jnp.int32(0),
    )


def pad_pyramid(
    nn_indexes: Sequence[np.ndarray],
    down_idxs: Sequence[np.ndarray],
    up_idxs: Sequence[np.ndarray],
    level_sizes: Sequence[int] = LEVEL_SIZES,
) -> PyramidBatch:
    """Pad a per-frame graph pyramid (host side) to the static buckets.

    ``nn_indexes[l]`` is the [n_l, k_l] neighbor table; every entry is a
    valid node index (the reference's pyramid builder fills all k slots,
    ``embedded_deformation_graph.py:261-331``). Edges run node -> neighbor
    with aggregation at the neighbor, matching ``demo.py:101-124``.
    """
    edge_src, edge_dst, edge_mask = [], [], []
    for l, nn in enumerate(nn_indexes):
        n_l, k_l = nn.shape
        cap = level_sizes[l]
        src = np.repeat(np.arange(cap, dtype=np.int32), k_l)
        dst = np.zeros((cap, k_l), np.int32)
        dst[:n_l] = np.maximum(nn.astype(np.int32), 0)
        mask = np.zeros((cap, k_l), bool)
        mask[:n_l] = nn >= 0  # -1 entries = missing neighbors (pad slots)
        edge_src.append(jnp.asarray(src))
        edge_dst.append(jnp.asarray(dst.reshape(-1)))
        edge_mask.append(jnp.asarray(mask.reshape(-1)))
    down = []
    for i, d in enumerate(down_idxs):
        cap = level_sizes[i + 1]
        arr = np.zeros((cap,), np.int32)
        arr[: d.shape[0]] = d.astype(np.int32)
        down.append(jnp.asarray(arr))
    up = []
    for i, u in enumerate(up_idxs):
        cap = level_sizes[i]
        arr = np.zeros((cap,), np.int32)
        arr[: u.shape[0]] = u.astype(np.int32)
        up.append(jnp.asarray(arr))
    node_mask = np.zeros((level_sizes[0],), bool)
    node_mask[: nn_indexes[0].shape[0]] = True
    return PyramidBatch(
        edge_src=tuple(edge_src),
        edge_dst=tuple(edge_dst),
        edge_mask=tuple(edge_mask),
        down_idx=tuple(down),
        up_idx=tuple(up),
        node_mask=jnp.asarray(node_mask),
    )


def _masked_std(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Population std per column over masked rows, averaged over columns —
    the reference's ``np.mean(np.std(motion[visible], axis=0))``."""
    count = jnp.maximum(jnp.sum(mask), 1)
    m = mask[:, None]
    mean = jnp.sum(jnp.where(m, x, 0.0), axis=0) / count
    var = jnp.sum(jnp.where(m, (x - mean) ** 2, 0.0), axis=0) / count
    return jnp.mean(jnp.sqrt(var))


def _rigid_factor(pos, motion, weights):
    """Rigid (R, t) of the weighted points, returned as per-node rigid
    motion  R p + t - p  evaluated at every node."""
    R, t = weighted_kabsch(pos, pos + motion, weights)
    rigid = (
        jnp.einsum("ij,nj->ni", R, pos, precision="highest") + t - pos
    )
    return rigid


@functools.partial(jax.jit, static_argnames=("n0_cap",), donate_argnums=(1,))
def motion_step(
    params,
    state: MotionRunnerState,
    node_pos: jnp.ndarray,
    node_motion: jnp.ndarray,
    visible: jnp.ndarray,
    n_valid: jnp.ndarray,
    pyramid: PyramidBatch,
    n0_cap: int = LEVEL_SIZES[0],
):
    """One fused motion-completion frame. Returns (new_state, outputs).

    outputs: motion [N0, 3] (world units, rigid part re-added),
             confidence [N0, 1].
    """
    rows = jnp.arange(n0_cap)
    valid = rows < n_valid
    vis = visible & valid
    visf = vis.astype(jnp.float32)

    # --- rigid factor-out on visible nodes (demo.py:49-51)
    rigid_curr = _rigid_factor(node_pos, node_motion, visf)
    nonrigid = node_motion - rigid_curr

    # --- cm scale + sigma normalization (demo.py:53-60)
    curr3 = jnp.where(vis[:, None], nonrigid * 100.0, 0.0)
    std_curr = _masked_std(curr3, vis) + 0.1
    curr3 = curr3 / std_curr
    curr_motion = jnp.concatenate([curr3, visf[:, None]], axis=-1)

    # --- inter-frame motion for the history entry (demo.py:63-79)
    prev_rows_valid = rows < state.prev_n
    motion_prev = node_pos - state.prev_pos
    prev_visf = (state.prev_visible & prev_rows_valid).astype(jnp.float32)
    rigid_prev = _rigid_factor(state.prev_pos, motion_prev, prev_visf)
    prev3 = jnp.where(
        prev_rows_valid[:, None], (motion_prev - rigid_prev) * 100.0, 0.0
    )
    # the reference writes only the first prev_node_num rows into the new
    # history entry (demo.py:90: temp[-1, :prev_node_num] = ...), so nodes
    # added this frame get an all-zero history row, flag included
    prev_entry = jnp.where(
        prev_rows_valid[:, None],
        jnp.concatenate([prev3, jnp.ones_like(prev3[:, :1])], axis=-1),
        0.0,
    )

    # --- history ring buffer update (demo.py:81-93)
    def first_frame(_):
        # frame 1: a single all-zero history entry
        return jnp.zeros_like(state.history), jnp.int32(1)

    def later_frame(_):
        scaled = state.history * (state.std_prev / std_curr)
        full = state.history_len >= HISTORY_LEN
        rolled = jnp.where(full, jnp.roll(scaled, -1, axis=0), scaled)
        slot = jnp.minimum(state.history_len, HISTORY_LEN - 1)
        new_hist = jax.lax.dynamic_update_index_in_dim(
            rolled, prev_entry / std_curr, slot, axis=0
        )
        return new_hist, jnp.minimum(state.history_len + 1, HISTORY_LEN)

    history, history_len = jax.lax.cond(
        state.frame_idx == 0, first_frame, later_frame, None
    )

    # --- centered positions (demo.py:95)
    center = jnp.sum(jnp.where(valid[:, None], node_pos, 0.0), axis=0) / jnp.maximum(
        jnp.sum(valid), 1
    )
    pos_centered = jnp.where(valid[:, None], node_pos - center, 0.0)

    pred = motion_complete_forward(
        params, pos_centered, curr_motion, history, history_len, pyramid
    )
    mu, sigma = pred[:, :3], pred[:, 3]

    # --- postprocess (demo.py:146-155)
    motion_scale = jnp.linalg.norm(mu, axis=-1)
    confidence = jnp.exp(-4.0 * jnp.square(sigma / (motion_scale + 1.0)))
    motion_out = mu * std_curr / 100.0 + rigid_curr
    motion_out = jnp.where(valid[:, None], motion_out, 0.0)
    confidence = jnp.where(valid, confidence, 0.0)

    new_state = MotionRunnerState(
        history=history,
        history_len=history_len,
        std_prev=std_curr,
        prev_pos=node_pos,
        prev_visible=visible,
        prev_n=n_valid,
        frame_idx=state.frame_idx + 1,
    )
    return new_state, (motion_out, confidence[:, None])


# ---------------------------------------------------------------------------
# packed frame interface: exactly TWO host->device transfers per frame.
# The per-frame arrays are tiny (~100 KB) but each transfer costs fixed
# dispatch latency (2 ms through the axon tunnel — measured), so the 17
# separate pyramid arrays dominate the 1 ms device step. Packing the ints
# into one vector and the floats into one [N0, 7] matrix takes the frame
# cost from ~75 ms to ~5 ms.


@functools.lru_cache(maxsize=None)
def _packed_layout(level_sizes=LEVEL_SIZES, ks=LEVEL_KS):
    """Static int-vector layout: [n_levels(4) | edge_dst per level |
    down(3) | up(3)], padding encoded as -1."""
    offsets = {}
    off = 4
    for l, (cap, k) in enumerate(zip(level_sizes, ks)):
        offsets[f"nn{l}"] = (off, cap * k)
        off += cap * k
    for i in (1, 2, 3):
        offsets[f"down{i}"] = (off, level_sizes[i])
        off += level_sizes[i]
    for i in (1, 2, 3):
        offsets[f"up{i}"] = (off, level_sizes[i - 1])
        off += level_sizes[i - 1]
    return offsets, off


_PACK_OFFSETS, _PACK_LEN = _packed_layout()


def pack_frame(
    node_pos: np.ndarray,
    node_motion: np.ndarray,
    visible: np.ndarray,
    nn_indexes,
    down_idxs,
    up_idxs,
    level_sizes=LEVEL_SIZES,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side packing -> (ints [L], floats [N0, 7])."""
    offsets, total = _packed_layout(tuple(level_sizes))
    ints = np.full((total,), -1, np.int32)
    ints[0:4] = [nn.shape[0] for nn in nn_indexes]
    for l, nn in enumerate(nn_indexes):
        if nn.shape[0] > level_sizes[l]:
            raise ValueError(
                f"pyramid level {l} has {nn.shape[0]} nodes, exceeds the "
                f"padding bucket {level_sizes[l]} (level_sizes={level_sizes})"
            )
        off, ln = offsets[f"nn{l}"]
        k = nn.shape[1]
        block = np.full((level_sizes[l], k), -1, np.int32)
        block[: nn.shape[0]] = nn.astype(np.int32)
        ints[off : off + ln] = block.reshape(-1)
    for i, d in zip((1, 2, 3), down_idxs):
        off, ln = offsets[f"down{i}"]
        ints[off : off + d.shape[0]] = d.astype(np.int32)
    for i, u in zip((1, 2, 3), up_idxs):
        off, ln = offsets[f"up{i}"]
        ints[off : off + u.shape[0]] = u.astype(np.int32)
    n = node_pos.shape[0]
    floats = np.zeros((level_sizes[0], 7), np.float32)
    floats[:n, :3] = node_pos
    floats[:n, 3:6] = node_motion
    floats[:n, 6] = visible.astype(np.float32)
    return ints, floats


def _unpack_pyramid(ints: jnp.ndarray, level_sizes=LEVEL_SIZES, ks=LEVEL_KS):
    offsets, _ = _packed_layout(tuple(level_sizes), tuple(ks))
    edge_src, edge_dst, edge_mask = [], [], []
    for l, (cap, k) in enumerate(zip(level_sizes, ks)):
        off, ln = offsets[f"nn{l}"]
        dst = jax.lax.dynamic_slice_in_dim(ints, off, ln)
        mask = dst >= 0
        src = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), k)
        edge_src.append(src)
        edge_dst.append(jnp.maximum(dst, 0))
        edge_mask.append(mask)
    down, up = [], []
    for i in (1, 2, 3):
        off, ln = offsets[f"down{i}"]
        down.append(jnp.maximum(jax.lax.dynamic_slice_in_dim(ints, off, ln), 0))
    for i in (1, 2, 3):
        off, ln = offsets[f"up{i}"]
        up.append(jnp.maximum(jax.lax.dynamic_slice_in_dim(ints, off, ln), 0))
    node_mask = jnp.arange(level_sizes[0]) < ints[0]
    return PyramidBatch(
        edge_src=tuple(edge_src),
        edge_dst=tuple(edge_dst),
        edge_mask=tuple(edge_mask),
        down_idx=tuple(down),
        up_idx=tuple(up),
        node_mask=node_mask,
    )


@functools.partial(
    jax.jit, static_argnames=("level_sizes",), donate_argnums=(1,)
)
def motion_step_packed(params, state: MotionRunnerState, ints: jnp.ndarray,
                       floats: jnp.ndarray, level_sizes=LEVEL_SIZES):
    return _motion_step_packed_impl(params, state, ints, floats, level_sizes)


@functools.partial(
    jax.jit, static_argnames=("level_sizes",), donate_argnums=(1,)
)
def motion_scan(params, state: MotionRunnerState, ints: jnp.ndarray,
                floats: jnp.ndarray, level_sizes=LEVEL_SIZES):
    """Process a CHUNK of frames in one dispatch via lax.scan.

    ints [K, L], floats [K, N0, 7] -> (state, outputs [K, N0, 4]).

    This is the TPU-shaped offline path: per-frame dispatch costs ~45 ms
    of tunnel round-trip (measured: 41 ms per device->host fetch) while
    the per-frame compute is 0.2 ms; scanning K frames amortizes the
    fixed cost K-fold. The carry is exactly the cross-frame state
    (history ring buffer, sigma chain, previous positions).
    """

    def body(state, frame):
        ints_f, floats_f = frame
        state, (motion, conf) = _motion_step_packed_impl(
            params, state, ints_f, floats_f, level_sizes
        )
        return state, jnp.concatenate([motion, conf], axis=-1)

    state, outs = jax.lax.scan(body, state, (ints, floats))
    return state, outs


def _motion_step_packed_impl(params, state, ints, floats,
                             level_sizes=LEVEL_SIZES):
    pyramid = _unpack_pyramid(ints, level_sizes)
    return motion_step(
        params,
        state,
        floats[:, :3],
        floats[:, 3:6],
        floats[:, 6] > 0.5,
        ints[0],
        pyramid,
        n0_cap=level_sizes[0],
    )


class MotionCompletionRunner:
    """Host-facing wrapper: pads per-frame inputs, drives motion_step."""

    def __init__(self, params, n0_cap: int = LEVEL_SIZES[0]):
        self.params = jax.tree.map(jnp.asarray, params)
        self.n0_cap = n0_cap
        # pyramid padding buckets consistent with the node cap — the
        # packed layout, the GNN shapes and the carried state must agree
        self.level_sizes = level_sizes_for(n0_cap)
        self.state = init_state(n0_cap)

    def reset(self):
        self.state = init_state(self.n0_cap)

    def run_frame(
        self,
        node_pos: np.ndarray,
        node_motion: np.ndarray,
        visible: np.ndarray,
        nn_indexes,
        down_idxs,
        up_idxs,
    ):
        n = node_pos.shape[0]
        ints, floats = pack_frame(
            node_pos, node_motion, visible, nn_indexes, down_idxs, up_idxs,
            level_sizes=self.level_sizes,
        )
        self.state, (motion, conf) = motion_step_packed(
            self.params, self.state, jnp.asarray(ints), jnp.asarray(floats),
            level_sizes=self.level_sizes,
        )
        # fetch the full padded arrays and slice on host — slicing the
        # device array with a frame-varying n would recompile per count
        return np.asarray(motion)[:n], np.asarray(conf)[:n, 0]

    def run_chunk(self, frames: list[dict]):
        """Process a list of frames in ONE device dispatch (lax.scan).

        Each frame dict carries the run_frame kwargs. Returns a list of
        (motion [n, 3], confidence [n]) in order. This is the offline /
        throughput path; run_frame remains for online per-frame use.
        """
        ints_list, floats_list, counts = [], [], []
        for f in frames:
            ints, floats = pack_frame(
                f["node_pos"], f["node_motion"], f["visible"],
                f["nn_indexes"], f["down_idxs"], f["up_idxs"],
                level_sizes=self.level_sizes,
            )
            ints_list.append(ints)
            floats_list.append(floats)
            counts.append(f["node_pos"].shape[0])
        ints_b = jnp.asarray(np.stack(ints_list))
        floats_b = jnp.asarray(np.stack(floats_list))
        self.state, outs = motion_scan(
            self.params, self.state, ints_b, floats_b,
            level_sizes=self.level_sizes,
        )
        outs = np.asarray(outs)
        return [
            (outs[i, : counts[i], :3], outs[i, : counts[i], 3])
            for i in range(len(frames))
        ]
