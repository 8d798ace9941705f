"""Step-cache behavior: trainers with identical step-defining config share
one compiled step (the finetune sweep pays one compile, not one per ratio);
different configs do not collide."""
import numpy as np

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer
import pytest

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48
CONFIG = {"Optim": {"name": "adam", "lr": 1e-3}}


class _Tiny(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


_TRA = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
_TEST = synthetic_dataset("acdc", num_scans=4, canvas=CANVAS, seed=1, mode="val")


def _mk(tmp_path, tag, labeled=2, lr=1e-3, seed=7):
    # step sharing requires shared ROOT datasets (one DeviceStore); the
    # entry layer guarantees this via its dataset cache
    tra, test = _TRA, _TEST
    lab, _, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=labeled,
                              labeled_batch_size=3, unlabeled_batch_size=3,
                              load_predefined_list=False)
    tr = _Tiny(model=UNet(input_dim=1, num_classes=4, max_channel=128),
               labeled_loader=lab, unlabeled_loader=None, val_loader=val,
               test_loader=None, save_dir=str(tmp_path / tag), max_epoch=1,
               num_batches=2, config={"Optim": {"name": "adam", "lr": lr}},
               seed=seed, crop=CROP)
    tr.init()
    return tr


def test_identical_config_shares_step(tmp_path):
    a = _mk(tmp_path, "a", labeled=2)
    b = _mk(tmp_path, "b", labeled=4)  # different data, same program
    assert a._train_step is b._train_step
    assert a._eval_step is b._eval_step
    # and both actually train
    sa = a.start_training()
    sb = b.start_training()
    assert np.isfinite(sa) and np.isfinite(sb)


def test_different_lr_does_not_collide(tmp_path):
    a = _mk(tmp_path, "a2", lr=1e-3)
    c = _mk(tmp_path, "c", lr=5e-4)
    assert a._train_step is not c._train_step
