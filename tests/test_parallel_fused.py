"""Row-sharded fused contrastive loss: the composition of SURVEY §5.7's two
halves — row sharding (parallel/contrastive.py) and the blockwise Pallas
kernel (ops/supcon_pallas.py). Each chip computes only its [2n_local, 2N]
strip; these tests pin exactness against the single-device naive loss on the
virtual 8-device CPU mesh (kernels in interpret mode inside shard_map)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.losses import self_paced_supcon_loss
from spcl_tpu.parallel import make_mesh, shard_batch
from spcl_tpu.parallel.contrastive import make_sharded_supcon_fn


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, jax.devices()
    return make_mesh(8)


def _problem(n=32, d=16, seed=3, invalid_tail=3):
    rng = np.random.RandomState(seed)
    z1 = rng.randn(n, d).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 = rng.randn(n, d).astype(np.float32)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    labels = rng.randint(0, 4, n).astype(np.int32)
    valid = np.ones(n, np.float32)
    if invalid_tail:
        valid[-invalid_tail:] = 0.0
    return z1, z2, labels, valid


def test_fused_threshold_single_source_of_truth():
    """Round-3 regression: the fused-dispatch crossover must come from ONE
    constant (ops.FUSED_MIN_ROWS) at every dispatch site."""
    from spcl_tpu import ops
    from spcl_tpu.hooks import infonce
    from spcl_tpu.parallel import contrastive
    import inspect

    assert infonce._FUSED_MIN_ROWS == ops.FUSED_MIN_ROWS
    # parallel/contrastive.py must reference the shared constant, not a literal
    src = inspect.getsource(contrastive)
    assert "FUSED_MIN_ROWS" in src and "1024" not in src


@pytest.mark.parametrize("mode,correct_grad", [
    ("soft", False), ("soft", True), ("hard", False)])
def test_sharded_fused_matches_single_device(mesh, mode, correct_grad):
    """loss + downgrade ratio of the fused row-strip path == single-device
    naive loss on the gathered batch, incl. invalid (padded) entries."""
    z1, z2, labels, valid = _problem()
    fn = make_sharded_supcon_fn(mesh, weight_update=mode,
                                correct_grad=correct_grad, use_fused=True)
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
    loss, ratio = fn(sh["z1"], sh["z2"], sh["t"], sh["v"], jnp.asarray(3.5))
    ref_loss, ref_aux = self_paced_supcon_loss(
        jnp.asarray(z1), jnp.asarray(z2), gamma=3.5, target=jnp.asarray(labels),
        valid=jnp.asarray(valid), weight_update=mode, correct_grad=correct_grad)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(ratio), float(ref_aux.downgrade_ratio),
                               rtol=1e-5)


def test_sharded_fused_gradients_match_single_device(mesh):
    """dz1/dz2 of the fused strip backward (column term folded in by
    symmetry, no cross-shard grad traffic) == single-device gradients."""
    z1, z2, labels, valid = _problem(seed=11)
    fn = make_sharded_supcon_fn(mesh, weight_update="soft", use_fused=True)
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
    g_sh = jax.jit(jax.grad(
        lambda a, b: fn(a, b, sh["t"], sh["v"], jnp.asarray(3.5))[0],
        argnums=(0, 1)))(sh["z1"], sh["z2"])
    g_ref = jax.grad(lambda a, b: self_paced_supcon_loss(
        a, b, gamma=3.5, target=jnp.asarray(labels), valid=jnp.asarray(valid),
        weight_update="soft")[0], argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-6)


def test_sharded_fused_equals_sharded_naive(mesh):
    """The two row-sharded forms (naive jnp strip vs fused Pallas strip) are
    the same function."""
    z1, z2, labels, valid = _problem(seed=7, invalid_tail=0)
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
    outs = {}
    for fused in (False, True):
        fn = make_sharded_supcon_fn(mesh, weight_update="hard", use_fused=fused)
        loss, ratio = fn(sh["z1"], sh["z2"], sh["t"], sh["v"], jnp.asarray(2.0))
        outs[fused] = (float(loss), float(ratio))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5)
