"""Sequence-parallel LSTM shardings must equal the single-device LSTM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occlusionfusion_tpu.models.motion_complete import init_params, lstm_forward
from occlusionfusion_tpu.parallel.mesh import make_fusion_mesh
from occlusionfusion_tpu.parallel.sequence import (
    lstm_node_sharded,
    lstm_time_ring,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_fusion_mesh(8)
    params = init_params(jax.random.PRNGKey(0))["seq_encoder"]
    hist = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 4))
    want = lstm_forward(params, hist)
    return mesh, params, hist, want


class TestSequenceParallel:
    def test_node_sharded(self, setup):
        mesh, params, hist, want = setup
        got = lstm_node_sharded(mesh, params, hist)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_time_ring(self, setup):
        mesh, params, hist, want = setup
        got = lstm_time_ring(mesh, params, hist)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
