"""Decoder pretraining with the dense InfoNCE hook (reference
PretrainDecoderTrainer + _INFONCEDenseHook, new_pretrain.py / infonce.py:201-241)."""
import numpy as np

from spcl_tpu.data import create_contrastive_loader, synthetic_dataset, get_data
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import INFONCEHook, feature_until_from_hooks
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stages_from_range
from spcl_tpu.training import PretrainDecoderTrainer
import pytest

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48


class _Tiny(PretrainDecoderTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=20.0)


def test_pretrain_decoder_dense_hook(tmp_path):
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                  labeled_batch_size=3, unlabeled_batch_size=3,
                                  load_predefined_list=False)
    loader = create_contrastive_loader(tra, scan_sample_num=3, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = INFONCEHook(name="infonce/Up_conv3/self", feature_name="Up_conv3",
                       contrast_on="self", spatial_size=(5, 5), num_sampled_points=3)
    assert not hook.is_encoder
    until = feature_until_from_hooks(hook)
    assert until == "Up_conv3"
    tr = _Tiny(model=model, labeled_loader=lab, unlabeled_loader=None,
               val_loader=val, test_loader=None, save_dir=str(tmp_path),
               max_epoch=1, num_batches=2,
               config={"Optim": {"name": "RAdam", "lr": 1e-4}},
               crop=CROP, data_name="acdc", contrastive_loader=loader,
               forward_until=until)
    tr.register_hooks(hook)
    # decoder pretrain trains Conv5..Up_conv3, encoder below Conv5 frozen
    tr.set_trainable_stages(stages_from_range("Conv5", until))
    tr.init()
    enc_before = np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"]).copy()
    dec_before = np.asarray(tr.state.params["model"]["Up_conv3"]["conv0"]["kernel"]).copy()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats[hook.name]["loss"]["mean"])
    np.testing.assert_array_equal(
        enc_before, np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"]))
    assert not np.allclose(
        dec_before, np.asarray(tr.state.params["model"]["Up_conv3"]["conv0"]["kernel"]))
    # decoder pretrain shares geometry across views (total_freedom=False)
    assert tr.total_freedom is False
