"""Packed eval (`Trainer.packed_eval`) must reproduce the per-scan eval.

The reference evals one scan per batch (ScanBatchSampler, sampler.py:249-284)
so its 3D dice groups naturally; the packed path chops the same slices into
fixed-size programs across scan boundaries and regroups by per-slice scan
name — the per-scan dice must come out identical (only the batch geometry
changes, not the math)."""
import numpy as np
import pytest

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.models import UNet
from spcl_tpu.training import FineTuneTrainer

CANVAS, CROP = 48, 32


class _Tiny(FineTuneTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tra = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(4, 7),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(4, 7),
                             canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test,
                                  labeled_scan_num=2, labeled_batch_size=3,
                                  unlabeled_batch_size=3,
                                  load_predefined_list=False)
    tr = _Tiny(model=UNet(input_dim=1, num_classes=4, max_channel=128),
               labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
               test_loader=None,
               save_dir=str(tmp_path_factory.mktemp("packed_eval")),
               max_epoch=1, num_batches=1,
               config={"Optim": {"name": "RAdam", "lr": 1e-4}},
               crop=CROP, data_name="acdc")
    tr.init()
    return tr


def test_packed_eval_matches_per_scan(trainer):
    stats_scan, score_scan = trainer._run_eval_epoch(trainer._val_loader)
    # 5 deliberately indivisible: chunks cross scan boundaries + tail padding
    trainer._config.setdefault("Trainer", {})["packed_eval"] = 5
    try:
        stats_packed, score_packed = trainer._run_eval_epoch(trainer._val_loader)
    finally:
        trainer._config["Trainer"]["packed_eval"] = 0
    assert score_packed == pytest.approx(score_scan, rel=1e-5)
    for k in stats_scan["dice"]:
        assert stats_packed["dice"][k] == pytest.approx(
            stats_scan["dice"][k], rel=1e-5), k
    # eval loss weighting legitimately shifts (per-chunk vs per-scan means)
    assert np.isfinite(stats_packed["loss"]["mean"])


def test_packed_batches_cover_every_slice_once(trainer):
    loader = trainer._val_loader
    seen = []
    for gidx, names in trainer._packed_eval_batches(loader, 5):
        keep = gidx >= 0
        assert len(names) == len(gidx)
        assert all(n != "" for n, k in zip(names, keep) if k)
        seen.extend(gidx[keep].tolist())
    ds = loader.dataset
    expect = sorted(
        int(g) for s, idx in ds.scan_to_indices().items()
        for g in np.asarray(ds.to_global(idx)))
    assert sorted(seen) == expect
