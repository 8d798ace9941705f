"""Host-batch streaming mode (device_data=False): batches ship from host
with depth-3 device prefetch instead of HBM-resident index gathers — the
path for datasets too large for device memory (device_store.py docstring).
Previously untested; covers Trainer._train_streams / _run_eval_epoch /
_PretrainTrainer host branches and data/loader.device_prefetch."""
import numpy as np

from spcl_tpu.data import create_contrastive_loader, get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import ConsistencyTrainerHook, SelfPacedINFONCEHook
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer, PretrainEncoderTrainer, SemiTrainer
import pytest

pytestmark = pytest.mark.slow  # multi-epoch integration (see pyproject)

CANVAS, CROP = 64, 48


class _FT(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


class _Semi(SemiTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


class _Pre(PretrainEncoderTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


def _loaders():
    tra = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(5, 7),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=3, canvas=CANVAS, seed=1, mode="val")
    return tra, get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                         labeled_batch_size=3, unlabeled_batch_size=3,
                         load_predefined_list=False)


def test_finetune_host_streaming(tmp_path):
    _, (lab, unlab, val, tst) = _loaders()
    tr = _FT(model=UNet(input_dim=1, num_classes=4, max_channel=128),
             labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
             test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
             config={"Optim": {"name": "adam", "lr": 1e-3}}, crop=CROP,
             device_data=False)
    tr.init()
    score = tr.start_training()
    assert 0.0 <= score <= 1.0
    assert (tmp_path / "last.ckpt").exists()


def test_semi_host_streaming_with_hook(tmp_path):
    _, (lab, unlab, val, tst) = _loaders()
    tr = _Semi(model=UNet(input_dim=1, num_classes=4, max_channel=128),
               labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
               test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
               config={"Optim": {"name": "adam", "lr": 1e-3}}, crop=CROP,
               device_data=False)
    tr.register_hooks(ConsistencyTrainerHook(weight=0.1))
    tr.init()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["tra"]["sup_loss"]["mean"])
    assert np.isfinite(stats["consistency"]["loss"]["mean"])


def test_pretrain_host_streaming(tmp_path):
    tra, (lab, unlab, val, tst) = _loaders()
    closer = create_contrastive_loader(tra, scan_sample_num=3, seed=0)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=100.0,
                                end_value=5.0, mode="soft", max_epoch=1)
    tr = _Pre(model=UNet(input_dim=1, num_classes=4, max_channel=128),
              labeled_loader=lab, unlabeled_loader=None, val_loader=val,
              test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
              config={"Optim": {"name": "adam", "lr": 1e-3}}, crop=CROP,
              contrastive_loader=closer, forward_until="Conv5",
              device_data=False)
    tr.register_hooks(hook)
    tr.init()
    tr.start_training()
    import pandas as pd
    df = pd.read_csv(tmp_path / "storage.csv")
    assert np.isfinite(df["tra/reg_loss/mean"]).all()
    assert np.isfinite(df["sp/sp_weight/mean"]).all()
    assert (tmp_path / "last.ckpt").exists()
