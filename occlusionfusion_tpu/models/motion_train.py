"""Training step for the motion-completion network (sharded, jitted).

The reference fork ships no training loop at all (``train.py`` referenced
by ``options.py:26`` is absent); this module adds one designed TPU-first:

  * heteroscedastic Gaussian NLL over node motion — the network predicts
    (mu [3], sigma [1]); loss = |mu - gt|^2 / (2 sigma^2) + 3 log sigma,
    masked to real nodes (padding-safe), matching the paper's
    uncertainty-aware objective the pretrained checkpoint exposes
    (softplus sigma head, ``motion_model.py:96``);
  * batch axis sharded over a device mesh ('data'), parameters
    replicated; under jit XLA inserts the psum for the gradient
    all-reduce — no hand-written collectives needed on the data path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from occlusionfusion_tpu.models.motion_complete import (
    PyramidBatch,
    motion_complete_forward,
)


class MotionBatch(NamedTuple):
    """One padded training sample (stack for a batch; vmapped)."""

    pos: jnp.ndarray  # [N0, 3]
    curr_motion: jnp.ndarray  # [N0, 4]
    history: jnp.ndarray  # [T, N0, 4]
    history_len: jnp.ndarray  # scalar
    gt_motion: jnp.ndarray  # [N0, 3] normalized GT nonrigid motion
    node_mask: jnp.ndarray  # [N0]
    pyramid: PyramidBatch


def nll_loss(params, batch: MotionBatch) -> jnp.ndarray:
    pred = motion_complete_forward(
        params,
        batch.pos,
        batch.curr_motion,
        batch.history,
        batch.history_len,
        batch.pyramid,
    )
    mu, sigma = pred[:, :3], jnp.maximum(pred[:, 3], 1e-3)
    sq = jnp.sum((mu - batch.gt_motion) ** 2, axis=-1)
    nll = sq / (2.0 * sigma**2) + 3.0 * jnp.log(sigma)
    mask = batch.node_mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def batched_loss(params, batch: MotionBatch) -> jnp.ndarray:
    return jnp.mean(jax.vmap(lambda b: nll_loss(params, b))(batch))


def make_train_step(optimizer: optax.GradientTransformation):
    @jax.jit
    def train_step(params, opt_state, batch: MotionBatch):
        loss, grads = jax.value_and_grad(batched_loss)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
