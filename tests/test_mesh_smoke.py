"""FAST mesh smoke (deliberately NOT marked slow — VERDICT r3 item 9): the
5-minute suite must exercise the Trainer's multi-chip path at all. One tiny
Trainer.mesh=8 pretrain epoch with the row-sharded global contrastive
criterion; bit-match burden lives in the slow tests (test_mesh_trainer.py)."""
import jax
import numpy as np
import pytest

from spcl_tpu.data import create_contrastive_loader, get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import SelfPacedINFONCEHook, feature_until_from_hooks
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stages_from_range
from spcl_tpu.training import PretrainEncoderTrainer

CANVAS, CROP = 40, 32


class _Pretrain(PretrainEncoderTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=10.0)


def _mk(tmp_path, mesh, layout="nhwc"):
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(3, 4),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=2, slices_per_scan=(3, 4),
                             canvas=CANVAS, seed=1, mode="val")
    lab, _, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                              labeled_batch_size=8, unlabeled_batch_size=8,
                              load_predefined_list=False, pad_eval_to=8)
    closer = create_contrastive_loader(tra, scan_sample_num=8, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128,
                 small_c_layout=layout)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e3,
                                end_value=10, mode="soft", max_epoch=1,
                                global_contrast="row_sharded")
    until = feature_until_from_hooks(hook)
    tr = _Pretrain(model=model, labeled_loader=lab, unlabeled_loader=None,
                   val_loader=val, test_loader=None, save_dir=str(tmp_path),
                   max_epoch=1, num_batches=1,
                   config={"Optim": {"name": "RAdam", "lr": 1e-4}},
                   crop=CROP, data_name="acdc", contrastive_loader=closer,
                   forward_until=until, mesh=mesh)
    tr.register_hooks(hook)
    tr.set_trainable_stages(stages_from_range(None, until))
    return tr


def test_mesh_pretrain_smoke(tmp_path):
    """One epoch of mesh=8 pretrain with the row-sharded criterion completes
    with finite loss through the full Trainer loop."""
    assert len(jax.devices()) >= 8
    tr = _mk(tmp_path, mesh=8)
    tr.init()
    assert tr.n_shards == 8
    tr.start_training()
    reg = tr._storage.state_dict()["history"][1]["tra/reg_loss/mean"]
    assert np.isfinite(reg)
    ratio = tr._storage.state_dict()["history"][1]["sp/sp_weight/mean"]
    assert 0.0 < ratio <= 1.0


def test_mesh_rejects_pallas_stage_layout(tmp_path):
    """ADVICE r3: pallas_call has no GSPMD partitioning rule — the Trainer
    must refuse the combination instead of silently replicating per chip."""
    tr = _mk(tmp_path, mesh=8, layout="pallas")
    with pytest.raises(ValueError, match="small_c_layout"):
        tr.init()
