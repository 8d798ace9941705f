"""Fused lane-packed stage kernels vs a jnp oracle (experimental/packed_block_pallas).

The oracle composes the already-validated packed primitives
(models/packed_stage.packed_conv/_pool semantics with inline batch-stat BN)
and jax.grad; the fused custom_vjp must match values AND gradients —
including the gradient paths through the batch statistics. Runs in interpret
mode on CPU; the identical code path compiles to Mosaic on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.experimental.packed_stage import pack, packed_conv, unpack
from spcl_tpu.experimental.packed_block_pallas import fused_packed_block

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)


def _bn_ref(z, gamma, beta, c):
    g = 128 // c
    zf = z.astype(jnp.float32)
    n = z.shape[0] * z.shape[1] * z.shape[2] * g
    mean = jnp.sum(zf, axis=(0, 1, 2)).reshape(g, c).sum(0) / n
    var = jnp.maximum(
        jnp.sum(zf * zf, axis=(0, 1, 2)).reshape(g, c).sum(0) / n
        - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5) * gamma
    shift = beta - mean * inv
    return zf * jnp.tile(inv, g) + jnp.tile(shift, g), mean, var


def _pool_ref(e, c):
    b, h, wg, _ = e.shape
    g = 128 // c
    v = jnp.maximum(e[:, 0::2], e[:, 1::2])
    v = v.reshape(b, h // 2, wg, g // 2, 2, c)
    m = jnp.maximum(v[..., 0, :], v[..., 1, :])
    return m.reshape(b, h // 2, wg // 2, 128)


def _ref_block(xpad, w0, g0, b0, w1, g1, b1, c_in, c_out, external_first):
    x = xpad[:, 1:-1, 1:-1, :]
    z0 = x if external_first else packed_conv(x, w0)
    y0, mean0, var0 = _bn_ref(z0, g0, b0, c_out)
    a0 = jax.nn.relu(y0)
    z1 = packed_conv(a0, w1)
    y1, mean1, var1 = _bn_ref(z1, g1, b1, c_out)
    e = jax.nn.relu(y1)
    p = _pool_ref(e, c_out)
    return p, e, mean0, var0, mean1, var1


@pytest.mark.parametrize("external_first", [True, False])
@pytest.mark.parametrize("cfg", [(16, 16, 8, 16), (16, 32, 8, 16)],
                         ids=["same16", "expand16to32"])
def test_fused_block_matches_oracle(external_first, cfg):
    c_in, c_out, H, W = cfg
    if external_first:
        c_in = c_out  # the external conv already produced C=c_out
    rng = np.random.RandomState(0 if external_first else 1)
    B = 2
    cw = c_out if external_first else c_in
    x = pack(jnp.asarray(rng.randn(B, H, W, cw).astype(np.float32)))
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w0 = jnp.asarray(rng.randn(3, 3, c_in, c_out).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.randn(3, 3, c_out, c_out).astype(np.float32) * 0.2)
    g0 = jnp.asarray(1.0 + 0.1 * rng.randn(c_out).astype(np.float32))
    b0 = jnp.asarray(0.1 * rng.randn(c_out).astype(np.float32))
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c_out).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.randn(c_out).astype(np.float32))
    args = (xpad, w0, g0, b0, w1, g1, b1)

    ref = _ref_block(*args, c_in, c_out, external_first)
    got = fused_packed_block(*args, c_in, c_out, "float32", external_first)
    for i, name in enumerate(("p", "e", "mean0", "var0", "mean1", "var1")):
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref[i]),
                                   rtol=1e-4, atol=1e-5, err_msg=name)

    # gradients (value + every input cotangent), random output cotangents;
    # stats outputs are buffers — only p and e feed the loss
    cp = jnp.asarray(rng.randn(*ref[0].shape).astype(np.float32))
    ce = jnp.asarray(rng.randn(*ref[1].shape).astype(np.float32))

    def loss_ref(*a):
        out = _ref_block(*a, c_in, c_out, external_first)
        return jnp.sum(out[0] * cp) + jnp.sum(out[1] * ce)

    def loss_got(*a):
        out = fused_packed_block(*a, c_in, c_out, "float32", external_first)
        return jnp.sum(out[0] * cp) + jnp.sum(out[1] * ce)

    lr = loss_ref(*args)
    lg = loss_got(*args)
    np.testing.assert_allclose(float(lg), float(lr), rtol=1e-5)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    gg = jax.grad(loss_got, argnums=tuple(range(7)))(*args)
    names = ("x", "w0", "g0", "b0", "w1", "g1", "b1")
    for n, a, b in zip(names, gr, gg):
        if external_first and n == "w0":
            continue  # unused dummy in the external path
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4, err_msg=n)
