"""KNN / radius-neighbor op tests: lax twin vs numpy oracle, padding rules."""

import jax
import jax.numpy as jnp
import numpy as np

from occlusionfusion_tpu.ops.knn import knn_lax, radius_neighbors


def _numpy_knn(q, r, k):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


class TestKNNLax:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        q = rng.randn(333, 3).astype(np.float32)
        r = rng.randn(210, 3).astype(np.float32)
        d2, idx = knn_lax(jnp.asarray(q), jnp.asarray(r), k=4)
        d2_np, idx_np = _numpy_knn(q, r, 4)
        np.testing.assert_allclose(np.asarray(d2), d2_np, atol=1e-4)
        # indices can differ on exact ties; distances are the contract
        np.testing.assert_allclose(
            np.sort(np.asarray(idx), axis=1), np.sort(idx_np, axis=1)
        )

    def test_valid_mask_excludes(self):
        q = jnp.zeros((1, 3))
        r = jnp.array([[0.01, 0, 0], [0.02, 0, 0], [5.0, 0, 0]])
        valid = jnp.array([False, True, True])
        _, idx = knn_lax(q, r, k=2, valid=valid)
        assert 0 not in np.asarray(idx)

    def test_chunking_boundary(self):
        rng = np.random.RandomState(1)
        q = rng.randn(100, 3).astype(np.float32)
        r = rng.randn(50, 3).astype(np.float32)
        d2a, _ = knn_lax(jnp.asarray(q), jnp.asarray(r), k=3, chunk=32)
        d2b, _ = knn_lax(jnp.asarray(q), jnp.asarray(r), k=3, chunk=4096)
        np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b), atol=1e-5)

    def test_k_clamped_to_n(self):
        q = jnp.zeros((5, 3))
        r = jnp.ones((2, 3))
        d2, idx = knn_lax(q, r, k=4)
        assert d2.shape == (5, 2)

    def test_jittable(self):
        f = jax.jit(lambda q, r: knn_lax(q, r, k=4))
        q = jnp.zeros((10, 3))
        r = jnp.ones((8, 3))
        d2, idx = f(q, r)
        assert idx.shape == (10, 4)


class TestRadiusNeighbors:
    def test_shadow_padding(self):
        q = jnp.zeros((1, 3))
        r = jnp.array([[0.05, 0, 0], [0.2, 0, 0], [3.0, 0, 0]])
        out = radius_neighbors(q, r, radius=0.3, max_k=3)
        out = np.asarray(out[0])
        # two real neighbors, one shadow slot (= N = 3)
        assert (out == 3).sum() == 1
        assert set(out[out != 3]) == {0, 1}

    def test_max_k_truncates(self):
        q = jnp.zeros((1, 3))
        r = jnp.stack([jnp.arange(5) * 0.01, jnp.zeros(5), jnp.zeros(5)], axis=1)
        out = radius_neighbors(q, r, radius=1.0, max_k=2)
        assert out.shape == (1, 2)
        assert (np.asarray(out) != 5).all()
