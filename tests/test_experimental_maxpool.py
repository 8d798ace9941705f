"""experimental/maxpool.py — the measured-negative maxpool-backward variants.

The equality-mask VJP (and the pairwise form) lost to XLA's native
select-and-scatter on the device plane (see experimental/maxpool.py
docstring for the round-4 table); these tests keep the quarantined
implementations correct for reproduction: (a) forward equality with flax
nn.max_pool, (b) gradient equality with XLA's autodiff on tie-free inputs,
(c) the documented tie deviation, and (d) the ReLU->pool composition where
end-to-end gradients match XLA exactly despite ties (they sit at
ReLU-clamped zeros).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.experimental.maxpool import (max_pool_2x2,
                                           max_pool_2x2_pairwise)


def _xla_pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 224, 224, 16), (3, 6, 10, 5)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_nn_max_pool(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                  np.asarray(_xla_pool(x)))


def test_forward_nchw():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8, 8))
    ref = jnp.transpose(_xla_pool(jnp.transpose(x, (0, 2, 3, 1))), (0, 3, 1, 2))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2(x, "NCHW")),
                                  np.asarray(ref))


@pytest.mark.parametrize("data_format,shape",
                         [("NHWC", (2, 16, 16, 4)), ("NCHW", (2, 4, 16, 16))])
def test_gradient_matches_xla_when_tie_free(data_format, shape):
    # continuous random values: exact within-window ties have probability ~0
    x = jax.random.normal(jax.random.PRNGKey(2), shape)

    def ours(v):
        return jnp.sum(max_pool_2x2(v, data_format) ** 2)

    def xla(v):
        if data_format == "NCHW":
            v = jnp.transpose(v, (0, 2, 3, 1))
        return jnp.sum(_xla_pool(v) ** 2)

    g_ours = jax.grad(ours)(x)
    g_xla = jax.grad(xla)(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-6)


def test_odd_trailing_row_col_dropped_with_zero_grad():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 7, 2))
    y = max_pool_2x2(x)
    assert y.shape == (1, 2, 3, 2)
    g = jax.grad(lambda v: jnp.sum(max_pool_2x2(v)))(x)
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g[:, 4:, :, :]), 0.0)
    np.testing.assert_array_equal(np.asarray(g[:, :, 6:, :]), 0.0)


def test_tie_semantics_every_max_gets_full_dy():
    # documented deviation: a fully-tied window routes dy to EVERY element
    # (select-and-scatter picks one winner)
    x = jnp.ones((1, 2, 2, 1))
    g = jax.grad(lambda v: jnp.sum(max_pool_2x2(v)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones((1, 2, 2, 1)))


def test_relu_pool_composition_matches_xla():
    # the UNet always pools relu(bn(conv)) outputs; ties live at the clamped
    # zeros whose ReLU backward is zero, so the end-to-end gradient matches
    # XLA's select-and-scatter form bit-for-bit despite the tie deviation.
    pre = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 8))
    # force many clamped ties: ~60% negatives
    pre = pre - 0.3

    def ours(v):
        return jnp.sum(max_pool_2x2(jax.nn.relu(v)) ** 2)

    def xla(v):
        return jnp.sum(_xla_pool(jax.nn.relu(v)) ** 2)

    assert float(jnp.mean(jax.nn.relu(pre) == 0)) > 0.4  # ties are present
    g_ours = jax.grad(ours)(pre)
    g_xla = jax.grad(xla)(pre)
    np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_xla))


def test_jit_and_vmap_compose():
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 2, 8, 8, 4))
    out = jax.jit(jax.vmap(lambda v: max_pool_2x2(v)))(x)
    ref = jax.vmap(_xla_pool)(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pairwise_variant_matches():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 10, 3))
    np.testing.assert_array_equal(np.asarray(max_pool_2x2_pairwise(x)),
                                  np.asarray(_xla_pool(x)))
    g1 = jax.grad(lambda v: jnp.sum(max_pool_2x2_pairwise(v) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(_xla_pool(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
