"""max_pool_nonoverlap: forward and VJP bit-exact vs the reduce_window
path, INCLUDING ties (the risky part — select-and-scatter routes a tied
window's gradient to the first max in scan order, and the elementwise
backward must reproduce that cell-for-cell)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from freesound_classification_tpu.ops.pooling import max_pool_nonoverlap


def _ref_pool(x, window):
    return nn.max_pool(x, window, strides=window)


def _grad_pair(x, window, seed=0):
    rng = np.random.RandomState(seed)
    y_ref = _ref_pool(x, window)
    dy = jnp.asarray(rng.randn(*y_ref.shape).astype(np.float32)).astype(
        x.dtype)

    def loss_ref(v):
        return jnp.sum(_ref_pool(v, window) * dy)

    def loss_new(v):
        return jnp.sum(max_pool_nonoverlap(v, window) * dy)

    g_ref = jax.grad(loss_ref)(x)
    g_new = jax.grad(loss_new)(x)
    return y_ref, g_ref, g_new


CASES_2D = [
    ((3, 8, 12, 5), (2, 2)),
    ((2, 7, 9, 4), (2, 2)),    # odd spatial sizes: remainder dropped
    ((2, 1, 6, 3), (1, 2)),    # clamped short-bucket window
    ((2, 4, 1, 3), (2, 1)),
    ((1, 1, 1, 2), (1, 1)),
]


@pytest.mark.parametrize("shape,window", CASES_2D)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_2d_matches_reduce_window(shape, window, dtype):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    y_ref, g_ref, g_new = _grad_pair(x, window)
    np.testing.assert_array_equal(
        np.asarray(max_pool_nonoverlap(x, window), np.float32),
        np.asarray(y_ref, np.float32))
    np.testing.assert_array_equal(np.asarray(g_new, np.float32),
                                  np.asarray(g_ref, np.float32))


def test_1d_matches_reduce_window():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 10, 6).astype(np.float32))
    y_ref, g_ref, g_new = _grad_pair(x, (2,))
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ties_route_identically(dtype):
    """Integer-valued activations force heavy within-window ties; the
    first-max priority must agree with select-and-scatter exactly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(0, 3, size=(4, 8, 10, 7))
                    .astype(np.float32)).astype(dtype)
    _, g_ref, g_new = _grad_pair(x, (2, 2))
    np.testing.assert_array_equal(np.asarray(g_new, np.float32),
                                  np.asarray(g_ref, np.float32))


def test_all_equal_window():
    x = jnp.ones((2, 4, 4, 3), jnp.float32)
    _, g_ref, g_new = _grad_pair(x, (2, 2))
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_jit_and_vmap():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(5, 2, 6, 8, 3).astype(np.float32))
    f = jax.jit(lambda v: max_pool_nonoverlap(v, (2, 2)))
    out = jax.vmap(f)(x)
    ref = jax.vmap(lambda v: _ref_pool(v, (2, 2)))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
