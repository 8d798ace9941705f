"""Learning-dynamics validation: supervised finetune on the (easy) synthetic
blob dataset must actually learn — per-scan val Dice climbs well above
chance within a few epochs. The reference has no equivalent check
(SURVEY.md §4: its integration tests only assert that batches run)."""
import numpy as np

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer
import pytest

pytestmark = pytest.mark.slow  # multi-epoch integration (see pyproject)

CANVAS, CROP = 64, 48


class _Tiny(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0, jitter=False)


def test_finetune_learns_synthetic(tmp_path):
    tra = synthetic_dataset("acdc", num_scans=10, slices_per_scan=(6, 8),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(6, 8),
                             canvas=CANVAS, seed=1, mode="val")
    lab, _, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=10,
                              labeled_batch_size=8, unlabeled_batch_size=8,
                              load_predefined_list=False)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    tr = _Tiny(model=model, labeled_loader=lab, unlabeled_loader=None,
               val_loader=val, test_loader=None, save_dir=str(tmp_path),
               max_epoch=3, num_batches=40,
               config={"Optim": {"name": "adam", "lr": 1e-3}},
               crop=CROP, data_name="acdc")
    tr.init()
    _, score_epoch0 = tr._run_eval_epoch(tr._val_loader)  # untrained
    best = tr.start_training()
    assert best > score_epoch0 + 0.1, (score_epoch0, best)
    assert best > 0.3, best
