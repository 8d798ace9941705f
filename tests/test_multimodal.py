"""Multi-modal (channel-stacked) dataset path — reference mmWHS/dual-modality
parity (semi_seg/epochers/helper.py:33-36 concatenates modalities on the
channel axis before the forward)."""
import numpy as np
import pytest

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer


def test_multimodal_batch_shape():
    ds = synthetic_dataset("mmwhsct", num_scans=4, slices_per_scan=(4, 5),
                           canvas=48, channels=2, seed=0)
    batch = ds.batch(np.arange(4))
    assert batch["image"].shape == (4, 48, 48, 2)


class _Tiny(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=32, rot_degrees=10.0)


def test_multimodal_finetune_runs(tmp_path):
    tra = synthetic_dataset("mmwhsct", num_scans=6, slices_per_scan=(4, 6),
                            canvas=48, channels=2, seed=0)
    test = synthetic_dataset("mmwhsct", num_scans=3, slices_per_scan=(4, 6),
                             canvas=48, channels=2, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                  labeled_batch_size=3, unlabeled_batch_size=3,
                                  load_predefined_list=False)
    model = UNet(input_dim=2, num_classes=5, max_channel=128)
    tr = _Tiny(model=model, labeled_loader=lab, unlabeled_loader=None,
               val_loader=val, test_loader=None, save_dir=str(tmp_path),
               max_epoch=1, num_batches=2,
               config={"Optim": {"name": "RAdam", "lr": 1e-4}},
               crop=32, data_name="mmwhsct")
    tr.init()
    score = tr.start_training()
    assert 0.0 <= score <= 1.0
