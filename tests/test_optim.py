"""Optimizer zoo golden tests against torch (the reference's optimizer
semantics: deepclustering2 optim zoo, torch L2-style weight decay applied to
the gradient before the adaptive update)."""
import numpy as np
import optax
import pytest

import jax.numpy as jnp

from spcl_tpu.training.optim import build_optimizer

torch = pytest.importorskip("torch")


def _run_optax(tx, w0, grads):
    params = jnp.asarray(w0)
    st = tx.init(params)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, params)
        params = optax.apply_updates(params, u)
    return np.asarray(params)


def _run_torch(opt_ctor, w0, grads):
    p = torch.nn.Parameter(torch.tensor(w0))
    opt = opt_ctor([p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


@pytest.fixture()
def problem():
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(6)]
    return w0, grads


@pytest.mark.parametrize("momentum,nesterov,wd", [
    (0.9, False, 0.0), (0.9, True, 0.0), (0.9, False, 1e-2), (0.0, False, 0.0)])
def test_sgd_matches_torch(problem, momentum, nesterov, wd):
    """build_optimizer("sgd") == torch.optim.SGD (momentum buffer, nesterov
    lookahead, L2-into-gradient weight decay), per step."""
    w0, grads = problem
    ours = _run_optax(
        build_optimizer(name="sgd", lr=0.1, weight_decay=wd,
                        momentum=momentum, nesterov=nesterov), w0, grads)
    ref = _run_torch(
        lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=momentum,
                                   nesterov=nesterov, weight_decay=wd), w0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_sgd_with_momentum_actually_accumulates(problem):
    """Regression for the round-3 gap: "sgd" used to map to optax.identity()
    (plain GD) silently. With momentum it must differ from plain GD."""
    w0, grads = problem
    with_m = _run_optax(build_optimizer(name="sgd", lr=0.1, momentum=0.9), w0, grads)
    plain = _run_optax(build_optimizer(name="sgd", lr=0.1, momentum=0.0), w0, grads)
    assert np.abs(with_m - plain).max() > 1e-3


def test_radam_matches_torch(problem):
    """build_optimizer("RAdam") == torch.optim.RAdam (the reference's default
    optimizer, config/base.yaml Optim.name=RAdam) incl. the rectification
    warmup steps and L2 weight decay."""
    w0, grads = problem
    ours = _run_optax(build_optimizer(name="RAdam", lr=0.01, weight_decay=1e-2),
                      w0, grads)
    ref = _run_torch(lambda ps: torch.optim.RAdam(ps, lr=0.01, weight_decay=1e-2),
                     w0, grads)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
