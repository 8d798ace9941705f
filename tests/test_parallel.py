"""Multi-chip data parallelism on the virtual 8-device CPU mesh.

The reference never had a working distributed path (SURVEY.md §2.11); these
tests validate that the full train step compiles and executes under a `data`
mesh, that gradients are correctly psum'ed (replicated-state consistency),
and that the contrastive loss spans the global batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.parallel import make_mesh, replicate, shard_batch

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, jax.devices()
    return make_mesh(8)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_step_matches_single_device(mesh):
    """Replicated-state GSPMD step must produce the same update as the
    unsharded step on the identical global batch."""
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.augment import AugmentPolicy
    from spcl_tpu.models import UNet
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_finetune_step

    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    optimizer = build_optimizer(name="RAdam", lr=1e-3, weight_decay=0.0)
    sample = jnp.zeros((2, 32, 32, 1), jnp.float32)

    def mk_state():  # independent buffers: train steps donate their state arg
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
        return create_train_state(model_params=variables["params"],
                                  batch_stats=variables.get("batch_stats", {}),
                                  hook_params={}, tx=optimizer)

    step = build_finetune_step(model, optimizer, num_classes=4,
                               policy=AugmentPolicy(crop=32, rot_degrees=0.0,
                                                    hflip=False, vflip=False, jitter=False))
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(4, 5), canvas=32, seed=0)
    batch = ds.batch(np.arange(16))
    key = jax.random.PRNGKey(1)

    s1, m1 = step(mk_state(), jax.device_put(batch), key, {})
    s8, m8 = step(replicate(mk_state(), mesh), shard_batch(batch, mesh),
                  replicate(key, mesh), {})
    np.testing.assert_allclose(float(m1["sup_loss"]), float(m8["sup_loss"]), rtol=1e-5)
    k1 = np.asarray(s1.params["model"]["Conv1"]["conv0"]["kernel"])
    k8 = np.asarray(s8.params["model"]["Conv1"]["conv0"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


def test_sharded_pretrain_step_matches_single_device(mesh):
    """The PAPER's path under the mesh: self-paced contrastive pretrain step
    (two on-device views + SP-InfoNCE over meta-labels) — sharded batch must
    reproduce the unsharded loss and parameter update (GSPMD inserts the
    embedding all-gather + gradient psum)."""
    from spcl_tpu.data import synthetic_dataset
    from spcl_tpu.data.augment import AugmentPolicy
    from spcl_tpu.hooks import SelfPacedINFONCEHook
    from spcl_tpu.models import UNet
    from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range
    from spcl_tpu.training import build_optimizer, create_train_state
    from spcl_tpu.training.steps import build_pretrain_step

    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=100.0,
                                end_value=5.0, mode="soft", max_epoch=2)
    # RAdam: un-adapted (SGD-like) early steps, so epsilon-level grad
    # differences between shardings stay epsilon-level in the params
    # (adam's step-1 g/sqrt(g^2) normalization would amplify them to signs)
    optimizer = build_optimizer(name="RAdam", lr=1e-3)
    sample = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
    acts = jax.eval_shape(lambda v, x: model.apply(v, x, train=False, until="Conv5"),
                          variables, sample)
    sample_acts = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), acts)
    hook_params = {hook.name: hook.build(jax.random.PRNGKey(1), model, sample_acts)}

    def mk_state():
        v = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
        return create_train_state(model_params=v["params"],
                                  batch_stats=v.get("batch_stats", {}),
                                  hook_params=jax.tree_util.tree_map(jnp.copy, hook_params),
                                  tx=optimizer)

    mask = stage_trainable_mask(variables["params"], stages_from_range(None, "Conv5"))
    step = build_pretrain_step(model, [hook], optimizer,
                               policy=AugmentPolicy(crop=32, rot_degrees=10.0),
                               total_freedom=True, until="Conv5", grad_mask=mask)
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(4, 5), canvas=32, seed=0)
    batch = ds.batch(np.arange(16))
    key = jax.random.PRNGKey(2)
    scal = {hook.name: hook.epoch_scalars(0)}

    s1, m1 = step(mk_state(), jax.device_put(batch), key, scal)
    s8, m8 = step(replicate(mk_state(), mesh), shard_batch(batch, mesh),
                  replicate(key, mesh), scal)
    np.testing.assert_allclose(float(m1["reg_loss"]), float(m8["reg_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["hooks"]["sp"]["sp_weight"]),
                               float(m8["hooks"]["sp"]["sp_weight"]), rtol=1e-5)
    k1 = np.asarray(s1.params["model"]["Conv5"]["conv0"]["kernel"])
    k8 = np.asarray(s8.params["model"]["Conv5"]["conv0"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


def test_contrastive_loss_spans_global_batch(mesh):
    """The supcon loss of a sharded z must equal the unsharded loss — i.e.
    GSPMD all-gathers the embeddings so the NxN matrix covers all chips."""
    from spcl_tpu.losses import supcon_loss

    rng = np.random.RandomState(0)
    z1 = rng.randn(32, 16).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 = rng.randn(32, 16).astype(np.float32)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    labels = rng.randint(0, 4, 32)

    f = jax.jit(lambda a, b, t: supcon_loss(a, b, target=t)[0])
    ref = f(jnp.asarray(z1), jnp.asarray(z2), jnp.asarray(labels))
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels}, mesh)
    out = f(sh["z1"], sh["z2"], sh["t"])
    np.testing.assert_allclose(float(ref), float(out), rtol=1e-5)


def test_shard_map_global_contrastive(mesh):
    """Explicit all_gather path (parallel/contrastive.py): per-shard embeddings
    -> global-batch self-paced loss, equal to the single-device value."""
    from spcl_tpu.losses import self_paced_supcon_loss
    from spcl_tpu.parallel.contrastive import make_global_supcon_fn

    rng = np.random.RandomState(5)
    n, d = 32, 16
    z1 = rng.randn(n, d).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 = rng.randn(n, d).astype(np.float32)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    labels = rng.randint(0, 4, n).astype(np.int32)
    valid = np.ones(n, np.float32)

    fn = make_global_supcon_fn(mesh, weight_update="soft")
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
    loss, ratio = fn(sh["z1"], sh["z2"], sh["t"], sh["v"], jnp.asarray(3.5))
    ref_loss, ref_aux = self_paced_supcon_loss(
        jnp.asarray(z1), jnp.asarray(z2), gamma=3.5, target=jnp.asarray(labels),
        weight_update="soft")
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(ratio), float(ref_aux.downgrade_ratio), rtol=1e-5)

    # gradients through the sharded loss match the single-device gradients
    g_sharded = jax.jit(jax.grad(lambda a, b: fn(a, b, sh["t"], sh["v"], jnp.asarray(3.5))[0],
                                 argnums=(0, 1)))(sh["z1"], sh["z2"])
    g_ref = jax.grad(lambda a, b: self_paced_supcon_loss(
        a, b, gamma=3.5, target=jnp.asarray(labels), weight_update="soft")[0],
        argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(g_sharded[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-7)


def test_row_sharded_global_contrastive(mesh):
    """sharded_self_paced_supcon (each chip computes its [2n_local, 2N] row
    block; one psum combines reductions) must equal the single-device loss,
    ratio and gradients — the genuinely scalable form of the global-batch
    matrix (SURVEY 5.7)."""
    from spcl_tpu.losses import self_paced_supcon_loss
    from spcl_tpu.parallel.contrastive import make_sharded_supcon_fn

    rng = np.random.RandomState(9)
    n, d = 32, 16
    z1 = rng.randn(n, d).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 = rng.randn(n, d).astype(np.float32)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    labels = rng.randint(0, 4, n).astype(np.int32)
    valid = np.ones(n, np.float32)
    valid[-3:] = 0.0  # padded tail

    for mode in ("soft", "hard"):
        fn = make_sharded_supcon_fn(mesh, weight_update=mode, correct_grad=True)
        sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
        loss, ratio = fn(sh["z1"], sh["z2"], sh["t"], sh["v"], jnp.asarray(3.5))
        ref_loss, ref_aux = self_paced_supcon_loss(
            jnp.asarray(z1), jnp.asarray(z2), gamma=3.5, target=jnp.asarray(labels),
            valid=jnp.asarray(valid), weight_update=mode, correct_grad=True)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5,
                                   err_msg=mode)
        np.testing.assert_allclose(float(ratio), float(ref_aux.downgrade_ratio),
                                   rtol=1e-5)

    fn = make_sharded_supcon_fn(mesh, weight_update="soft")
    sh = shard_batch({"z1": z1, "z2": z2, "t": labels, "v": valid}, mesh)
    g_sh = jax.jit(jax.grad(
        lambda a, b: fn(a, b, sh["t"], sh["v"], jnp.asarray(3.5))[0],
        argnums=(0, 1)))(sh["z1"], sh["z2"])
    g_ref = jax.grad(lambda a, b: self_paced_supcon_loss(
        a, b, gamma=3.5, target=jnp.asarray(labels), valid=jnp.asarray(valid),
        weight_update="soft")[0], argnums=(0, 1))(jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(g_sh[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_sh[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-7)
