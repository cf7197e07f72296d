"""Correlation cost volume for optical flow.

TPU-native replacement for the reference's hand-written CuPy CUDA
correlation kernels (``model/correlation/correlation.py:15-380``): the
(2r+1)^2-displacement cost volume is expressed as a shift-and-multiply
over padded feature maps — a static unrolled loop of fused elementwise
ops that XLA vectorizes; gradients come free from autodiff (the reference
hand-writes both backward kernels).
"""

from __future__ import annotations

import jax.numpy as jnp


def correlation_volume(
    f1: jnp.ndarray,  # [H, W, C]
    f2: jnp.ndarray,  # [H, W, C]
    max_displacement: int = 4,
) -> jnp.ndarray:
    """[H, W, (2r+1)^2] cost volume: mean-over-channels dot product of
    f1(x) with f2(x + d) for every displacement d in the window
    (matches the reference kernel's 1/C normalization,
    ``correlation.py:42-110``)."""
    H, W, C = f1.shape
    r = max_displacement
    f2p = jnp.pad(f2, ((r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = f2p[r + dy : r + dy + H, r + dx : r + dx + W, :]
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
