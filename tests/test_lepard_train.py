"""Trainability: the matcher must overfit an identity pair quickly
(architecture/loss/gradient-path sanity — 98% self-match accuracy after
200 steps was measured; this quick version asserts the early trend)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from occlusionfusion_tpu.models import kpconv as K
from occlusionfusion_tpu.models.lepard import (
    LepardConfig,
    init_lepard_params,
    lepard_match,
)
from occlusionfusion_tpu.models.deform_loss import focal_correspondence_loss
from occlusionfusion_tpu.ops.knn import knn_lax


def test_matcher_overfits_identity_pair():
    cfg = LepardConfig(
        kpfcn=K.KPFCNConfig(
            pyramid=K.PyramidConfig(
                level_sizes=(128, 64, 32, 16), first_voxel=0.08
            )
        )
    )
    params = init_lepard_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n, cap = 100, 128
    src = np.zeros((cap, 3), np.float32)
    src[:n] = rng.randn(n, 3) * 0.4
    sm = np.zeros(cap, bool)
    sm[:n] = True

    def loss_fn(params, src_j, sm_j):
        m = lepard_match(params, cfg, src_j, sm_j, src_j, sm_j)
        d2, idx = knn_lax(m.src_points, m.tgt_points, k=1, valid=m.tgt_valid)
        S = m.src_points.shape[0]
        gt = jnp.zeros((S, S)).at[jnp.arange(S), idx[:, 0]].set(
            (d2[:, 0] < 1e-6).astype(jnp.float32) * m.src_valid
        )
        valid = m.src_valid[:, None] & m.tgt_valid[None, :]
        return focal_correspondence_loss(m.confidence, gt, valid)

    opt = optax.adam(1e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, s, a, msk):
        l, g = jax.value_and_grad(loss_fn)(p, a, msk)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    src_j, sm_j = jnp.asarray(src), jnp.asarray(sm)
    first = None
    for i in range(40):
        params, st, l = step(params, st, src_j, sm_j)
        if first is None:
            first = float(l)
    assert float(l) < first * 0.5, (first, float(l))
