"""Segment (scatter/gather) primitives for graph neural nets.

TPU-native replacement for torch-scatter/torch-geometric aggregation: all
graph message passing in this framework is expressed as static-shape
gathers + ``jax.ops.segment_sum`` over padded edge lists with validity
masks, which XLA lowers to efficient one-pass scatters. This is the
substrate under the motion-completion GNN (reference:
``motion_model.py:52-98`` via torch_geometric) and the solver's JtJ
assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    edge_mask: jnp.ndarray | None = None,
    eps: float = 1e-16,
) -> jnp.ndarray:
    """Numerically stable softmax over edges grouped by segment id.

    Matches torch_geometric.utils.softmax semantics (subtract per-segment
    max, normalize with +eps denominator). Masked edges get weight 0 and do
    not influence the per-segment max or sum.

    Args:
      logits: [E] attention logits.
      segment_ids: [E] int32 target node per edge.
      num_segments: static number of nodes (padded).
      edge_mask: optional [E] bool; False edges are ignored.
    """
    if edge_mask is not None:
        logits = jnp.where(edge_mask, logits, _NEG_BIG)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    seg_max = jnp.maximum(seg_max, _NEG_BIG)  # empty segments -> -inf guard
    shifted = logits - seg_max[segment_ids]
    expv = jnp.exp(shifted)
    if edge_mask is not None:
        expv = jnp.where(edge_mask, expv, 0.0)
    denom = jax.ops.segment_sum(expv, segment_ids, num_segments=num_segments)
    return expv / (denom[segment_ids] + eps)


def segment_weighted_sum(
    values: jnp.ndarray,
    weights: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    """sum_e w_e * v_e grouped by segment: [E, C], [E] -> [N, C]."""
    return jax.ops.segment_sum(
        values * weights[:, None], segment_ids, num_segments=num_segments
    )


def segment_mean(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Masked mean per segment: [E, C] -> [N, C]."""
    if mask is not None:
        values = jnp.where(mask[:, None], values, 0.0)
        ones = mask.astype(values.dtype)
    else:
        ones = jnp.ones(values.shape[0], values.dtype)
    total = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count[:, None], eps)
