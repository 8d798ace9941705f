"""Loss correctness tests.

Pattern follows the reference's own strategy (SURVEY.md §4): cross-check the
framework losses against an independent, loop-based numpy golden model of the
published math, plus internal equivalences (SelfPaced(gamma=inf) == SupCon,
reference contrast_loss3.py:225-258).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.losses import (
    supcon_loss, self_paced_supcon_loss, kl_div, cross_entropy_onehot,
    entropy_loss, class2one_hot, iid_loss, iid_segmentation_loss, pui_loss,
)


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def golden_supcon(z1, z2, labels, t=0.07, gamma=None, mode="hard", correct_grad=False):
    """Loop-based golden model of SupCon / self-paced SupCon written straight
    from the paper's formula (independent of both implementations)."""
    n = z1.shape[0]
    z = np.concatenate([z1, z2], 0).astype(np.float64)
    labels2 = np.concatenate([labels, labels])
    sim = z @ z.T / t
    sim -= sim.max()
    loss_rows = []
    sp_weights = []
    for i in range(2 * n):
        denom = sum(np.exp(sim[i, a]) for a in range(2 * n) if a != i)
        pos = [j for j in range(2 * n) if j != i and labels2[j] == labels2[i]]
        acc = 0.0
        for j in pos:
            log_lik = sim[i, j] - np.log(denom + 1e-16)
            if gamma is None:
                w = 1.0
            else:
                l_ij = -log_lik
                w = float(l_ij <= gamma) if mode == "hard" else max(1 - l_ij / gamma, 0.0)
            sp_weights.append(w)
            acc += w * log_lik
        if pos:  # a row with no positives contributes nothing (matches the
            # reference's mask semantics; fixtures normally always have some)
            loss_rows.append(acc / len(pos))
    loss = -np.mean(loss_rows)
    ratio = np.mean(sp_weights) if sp_weights else 1.0
    if correct_grad and gamma is not None and ratio > 0:
        loss /= ratio
    return loss, ratio


@pytest.fixture
def zpair():
    rng = np.random.RandomState(0)
    z1 = _normalize(rng.randn(12, 16).astype(np.float32))
    z2 = _normalize(rng.randn(12, 16).astype(np.float32))
    labels = rng.randint(0, 3, size=12)
    return z1, z2, labels


def test_supcon_matches_golden(zpair):
    z1, z2, labels = zpair
    loss, aux = supcon_loss(jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels))
    want, _ = golden_supcon(z1, z2, labels)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_supcon_simclr_identity(zpair):
    z1, z2, _ = zpair
    # SimCLR: no target => positives are only the cross-view pairs
    loss, _ = supcon_loss(jnp.asarray(z1), jnp.asarray(z2))
    want, _ = golden_supcon(z1, z2, np.arange(12))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


@pytest.mark.parametrize("mode", ["hard", "soft"])
def test_self_paced_matches_golden(zpair, mode):
    z1, z2, labels = zpair
    gamma = 3.5
    loss, aux = self_paced_supcon_loss(
        jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels),
        gamma=gamma, weight_update=mode)
    want, ratio = golden_supcon(z1, z2, labels, gamma=gamma, mode=mode)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(float(aux.downgrade_ratio), ratio, rtol=1e-5)


def test_self_paced_correct_grad(zpair):
    z1, z2, labels = zpair
    gamma = 3.5
    loss, aux = self_paced_supcon_loss(
        jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels),
        gamma=gamma, weight_update="hard", correct_grad=True)
    want, _ = golden_supcon(z1, z2, labels, gamma=gamma, mode="hard", correct_grad=True)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_self_paced_gamma_inf_equals_supcon(zpair):
    """Reference's own equivalence assertion (contrast_loss3.py:238-258)."""
    z1, z2, labels = zpair
    sp_loss, aux = self_paced_supcon_loss(
        jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels),
        gamma=1e6, weight_update="soft")
    sc_loss, _ = supcon_loss(jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels))
    np.testing.assert_allclose(float(sp_loss), float(sc_loss), rtol=1e-4)
    np.testing.assert_allclose(float(aux.downgrade_ratio), 1.0, rtol=1e-5)


def test_padded_batch_matches_unpadded(zpair):
    z1, z2, labels = zpair
    pad = 4
    z1p = np.concatenate([z1, _normalize(np.ones((pad, 16), np.float32))], 0)
    z2p = np.concatenate([z2, _normalize(np.ones((pad, 16), np.float32))], 0)
    lp = np.concatenate([labels, np.full(pad, 99)])
    valid = np.concatenate([np.ones(12), np.zeros(pad)]).astype(np.float32)
    loss_p, _ = supcon_loss(jnp.asarray(z1p), jnp.asarray(z2p),
                            target=jnp.asarray(lp), valid=jnp.asarray(valid))
    loss, _ = supcon_loss(jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels))
    np.testing.assert_allclose(float(loss_p), float(loss), rtol=1e-5)

    loss_sp_p, _ = self_paced_supcon_loss(jnp.asarray(z1p), jnp.asarray(z2p),
                                          target=jnp.asarray(lp), valid=jnp.asarray(valid),
                                          gamma=3.5)
    loss_sp, _ = self_paced_supcon_loss(jnp.asarray(z1), jnp.asarray(z2),
                                        target=jnp.asarray(labels), gamma=3.5)
    np.testing.assert_allclose(float(loss_sp_p), float(loss_sp), rtol=1e-5)


def test_supcon_is_differentiable(zpair):
    z1, z2, labels = zpair

    def f(a, b):
        loss, _ = self_paced_supcon_loss(a, b, target=jnp.asarray(labels),
                                         gamma=3.5, weight_update="soft")
        return loss

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z2))
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()
    assert np.abs(np.asarray(g1)).sum() > 0


def test_kl_div_is_cross_entropy():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
    target = jnp.asarray(rng.randint(0, 3, (4, 8, 8)))
    onehot = class2one_hot(target, 3)
    probs = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(float(kl_div(probs, onehot)),
                               float(cross_entropy_onehot(logits, onehot)), rtol=1e-5)


def test_entropy_bounds():
    uniform = jnp.full((5, 4), 0.25)
    peaked = jnp.asarray(np.eye(4, dtype=np.float32)[[0, 1, 2, 0, 1]])
    assert float(entropy_loss(peaked)) < 1e-6
    np.testing.assert_allclose(float(entropy_loss(uniform)), np.log(4), rtol=1e-5)


def test_iid_loss_golden():
    rng = np.random.RandomState(2)
    a = rng.rand(32, 5).astype(np.float32)
    a /= a.sum(1, keepdims=True)
    b = rng.rand(32, 5).astype(np.float32)
    b /= b.sum(1, keepdims=True)
    loss, loss_nl = iid_loss(jnp.asarray(a), jnp.asarray(b))
    # golden: direct MI computation
    p = np.einsum("bi,bj->ij", a, b)
    p = (p + p.T) / 2
    p /= p.sum()
    pi = p.sum(1, keepdims=True)
    pj = p.sum(0, keepdims=True)
    want = -(p * (np.log(p + 1e-10) - np.log(pj + 1e-10) - np.log(pi + 1e-10))).sum()
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose(float(loss_nl), want, rtol=1e-4)


def test_iid_segmentation_loss_runs_and_is_finite():
    rng = np.random.RandomState(3)
    x = jax.nn.softmax(jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)), -1)
    y = jax.nn.softmax(jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)), -1)
    loss = iid_segmentation_loss(x, y, padding=3)
    assert np.isfinite(float(loss))
    # identical inputs should give a lower (more informative) loss than noise
    loss_same = iid_segmentation_loss(x, x, padding=3)
    assert float(loss_same) < float(loss)


def test_pui_loss_prefers_agreement():
    rng = np.random.RandomState(4)
    logits = rng.randn(64, 5).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    q = np.exp(rng.randn(64, 5).astype(np.float32))
    q /= q.sum(1, keepdims=True)
    same = float(pui_loss(jnp.asarray(p), jnp.asarray(p)))
    diff = float(pui_loss(jnp.asarray(p), jnp.asarray(q)))
    assert same < diff
