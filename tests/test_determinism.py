"""Determinism and auxiliary-plumbing tests: same seed -> bit-identical run;
device prefetch; limited iteration; TB writer tolerance."""
import numpy as np

from spcl_tpu.data import (HostLoader, InfiniteRandomSampler, LimitedIterationSampler,
                           device_prefetch, get_data, synthetic_dataset)
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer
from spcl_tpu.writer import SummaryWriter
import pytest

pytestmark = pytest.mark.slow  # multi-epoch integration (see pyproject)

CANVAS, CROP = 64, 48


class _Tiny(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


def _run(tmp_path, tag):
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, canvas=CANVAS, seed=1, mode="val")
    lab, _, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=4,
                              labeled_batch_size=3, unlabeled_batch_size=3,
                              load_predefined_list=False)
    tr = _Tiny(model=UNet(input_dim=1, num_classes=4, max_channel=128),
               labeled_loader=lab, unlabeled_loader=None, val_loader=val,
               test_loader=None, save_dir=str(tmp_path / tag), max_epoch=1,
               num_batches=3, config={"Optim": {"name": "adam", "lr": 1e-3}},
               seed=42, crop=CROP)
    tr.init()
    tr.start_training()
    return np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"])


def test_same_seed_bit_identical(tmp_path):
    k1 = _run(tmp_path, "a")
    k2 = _run(tmp_path, "b")
    np.testing.assert_array_equal(k1, k2)


def test_device_prefetch_preserves_order():
    ds = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(4, 5), canvas=32, seed=0)
    loader = HostLoader(ds, LimitedIterationSampler(
        iter(InfiniteRandomSampler(ds, batch_size=4, seed=0)), stop_iteration=5))
    direct = [np.asarray(b["scan_idx"]) for b in loader]
    loader2 = HostLoader(ds, LimitedIterationSampler(
        iter(InfiniteRandomSampler(ds, batch_size=4, seed=0)), stop_iteration=5))
    prefetched = [np.asarray(b["scan_idx"]) for b in device_prefetch(iter(loader2), depth=2)]
    assert len(direct) == len(prefetched) == 5
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a, b)


def test_writer_tolerates_weird_values(tmp_path):
    w = SummaryWriter(log_dir=str(tmp_path))
    w.add_scalars_from_meter_interface(
        1, tra={"loss": {"mean": 1.0}, "dice": {"DSC_mean": float("nan")},
                "note": {"text": "not-a-number"}})
    w.add_matrix_image("sp_mask", np.random.rand(8, 8), 1)
    w.flush()
    w.close()
