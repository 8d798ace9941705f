"""Coverage for secondary behavior flags: two_stage / disable_bn forward
modes (reference new_epocher.py:205-226) and the exclude_other_pos SupCon
denominator (contrast_loss3.py:97-100)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.data import get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import ConsistencyTrainerHook
from spcl_tpu.losses import supcon_loss
from spcl_tpu.models import UNet
from spcl_tpu.training import SemiTrainer

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48


class _Tiny(SemiTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


@pytest.mark.parametrize("two_stage,disable_bn", [(True, False), (True, True)])
def test_two_stage_semi(tmp_path, two_stage, disable_bn):
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                  labeled_batch_size=3, unlabeled_batch_size=3,
                                  load_predefined_list=False)
    tr = _Tiny(model=UNet(input_dim=1, num_classes=4, max_channel=128),
               labeled_loader=lab, unlabeled_loader=unlab, val_loader=val,
               test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
               config={"Optim": {"name": "adam", "lr": 1e-3}}, crop=CROP,
               two_stage=two_stage, disable_bn=disable_bn)
    tr.register_hooks(ConsistencyTrainerHook(weight=0.1))
    tr.init()
    bn_before = np.asarray(tr.state.batch_stats["Conv1"]["bn0"]["mean"]).copy()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["tra"]["sup_loss"]["mean"])
    bn_after = np.asarray(tr.state.batch_stats["Conv1"]["bn0"]["mean"])
    # labeled pass always updates BN stats, even when the unlabeled pass is frozen
    assert not np.allclose(bn_before, bn_after)


def test_exclude_other_pos_golden():
    rng = np.random.RandomState(3)
    z1 = rng.randn(8, 12).astype(np.float32)
    z1 /= np.linalg.norm(z1, axis=1, keepdims=True)
    z2 = rng.randn(8, 12).astype(np.float32)
    z2 /= np.linalg.norm(z2, axis=1, keepdims=True)
    labels = rng.randint(0, 2, 8)
    loss, _ = supcon_loss(jnp.asarray(z1), jnp.asarray(z2), target=jnp.asarray(labels),
                          exclude_other_pos=True)
    # golden: loop implementation of the exclude_other_pos denominator
    n = 8
    z = np.concatenate([z1, z2]).astype(np.float64)
    lab2 = np.concatenate([labels, labels])
    sim = z @ z.T / 0.07
    sim -= sim.max()
    rows = []
    for i in range(2 * n):
        pos = [j for j in range(2 * n) if j != i and lab2[j] == lab2[i]]
        neg = [j for j in range(2 * n) if j != i and lab2[j] != lab2[i]]
        neg_sum = sum(np.exp(sim[i, j]) for j in neg)
        neg_ratio = len(neg) / (len(pos) + len(neg))
        acc = sum(sim[i, p] - np.log(np.exp(sim[i, p]) + neg_sum / (neg_ratio + 1e-4) + 1e-16)
                  for p in pos)
        rows.append(acc / len(pos))
    want = -np.mean(rows)
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
