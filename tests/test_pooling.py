"""reshape-max pooling (ops/pooling) vs nnx.max_pool (reduce_window):
forward element-identity, gradient identity on tie-free data, and the
odd-size fallback."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from pssr2_tpu.ops.pooling import max_pool_2x2


def test_forward_matches_reduce_window():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (3, 8, 12, 5)), jnp.float32)
    ref = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)), np.asarray(ref))


def test_forward_matches_with_relu_zero_ties():
    rng = np.random.default_rng(1)
    x = jnp.maximum(jnp.asarray(rng.normal(-0.5, 1, (2, 6, 6, 4)), jnp.float32), 0)
    ref = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)), np.asarray(ref))


def test_grad_matches_on_tie_free_data():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 3)), jnp.float32)
    gy = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)), jnp.float32)
    g1 = jax.grad(lambda x_: jnp.sum(max_pool_2x2(x_) * gy))(x)
    g2 = jax.grad(
        lambda x_: jnp.sum(nnx.max_pool(x_, window_shape=(2, 2), strides=(2, 2)) * gy)
    )(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_odd_size_fallback():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 7, 9, 2)), jnp.float32)
    ref = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)), np.asarray(ref))
