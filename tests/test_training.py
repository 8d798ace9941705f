"""End-to-end trainer smoke tests on the synthetic dataset (CPU, tiny shapes).

The reference has no runnable integration tests without downloaded data + a
GPU (SURVEY.md §4); these replace them with a synthetic fixture.
"""
import numpy as np
import pytest

from spcl_tpu.data import create_contrastive_loader, get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import (
    ConsistencyTrainerHook, EntropyMinTrainerHook, MeanTeacherTrainerHook,
    MixUpHook, SelfPacedINFONCEHook, create_hook_from_config,
    feature_until_from_hooks,
)
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stages_from_range
from spcl_tpu.training import (
    AdversarialTrainer, FineTuneTrainer, MixUpTrainer, PretrainEncoderTrainer,
    SemiTrainer,
)

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48
CONFIG = {"Optim": {"name": "RAdam", "lr": 1e-4, "weight_decay": 1e-5},
          "Scheduler": {"multiplier": 10, "warmup_max": 2}}


def small_policy():
    return AugmentPolicy(crop=CROP, rot_degrees=20.0, jitter=True)


class _TestPolicyMixin:
    @property
    def train_policy(self):
        return small_policy()


class TinyFineTune(_TestPolicyMixin, FineTuneTrainer):
    pass


class TinySemi(_TestPolicyMixin, SemiTrainer):
    pass


class TinyMixUp(_TestPolicyMixin, MixUpTrainer):
    pass


class TinyAdv(_TestPolicyMixin, AdversarialTrainer):
    pass


class TinyPretrain(_TestPolicyMixin, PretrainEncoderTrainer):
    pass


@pytest.fixture(scope="module")
def loaders():
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(6, 8), canvas=CANVAS,
                             seed=1, mode="val")
    return get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                    labeled_batch_size=3, unlabeled_batch_size=3,
                    load_predefined_list=False)


def _mk(trainer_cls, loaders, tmp_path, **kw):
    lab, unlab, val, test = loaders
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    return trainer_cls(model=model, labeled_loader=lab, unlabeled_loader=unlab,
                       val_loader=val, test_loader=None, save_dir=str(tmp_path),
                       max_epoch=1, num_batches=2, config=dict(CONFIG),
                       crop=CROP, data_name="acdc", **kw)


def test_finetune_trainer_end_to_end(loaders, tmp_path):
    tr = _mk(TinyFineTune, loaders, tmp_path)
    tr.init()
    score = tr.start_training()
    assert 0.0 <= score <= 1.0
    assert (tmp_path / "last.ckpt").exists()
    assert (tmp_path / "best.ckpt").exists()
    assert (tmp_path / "storage.csv").exists()
    assert (tmp_path / ".success").exists()


def test_finetune_resume_roundtrip(loaders, tmp_path):
    tr = _mk(TinyFineTune, loaders, tmp_path / "a")
    tr.init()
    tr.start_training()
    tr2 = _mk(TinyFineTune, loaders, tmp_path / "b")
    tr2.init()
    tr2.resume_from_path(str(tmp_path / "a" / "last.ckpt"))
    assert tr2._cur_epoch == 1
    assert int(tr2.state.step) == int(tr.state.step)
    np.testing.assert_allclose(
        np.asarray(tr2.state.params["model"]["Conv1"]["conv0"]["kernel"]),
        np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"]))


def test_semi_trainer_with_hooks(loaders, tmp_path):
    tr = _mk(TinySemi, loaders, tmp_path)
    tr.register_hooks(ConsistencyTrainerHook(weight=0.1),
                      EntropyMinTrainerHook(weight=0.01))
    tr.init()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["tra"]["reg_loss"]["mean"])
    assert np.isfinite(stats["consistency"]["loss"]["mean"])
    assert np.isfinite(stats["entmin"]["loss"]["mean"])


def test_semi_trainer_mean_teacher(loaders, tmp_path):
    tr = _mk(TinySemi, loaders, tmp_path)
    tr.register_hooks(MeanTeacherTrainerHook(weight=0.1))
    tr.init()
    assert tr.state.teacher_params is not None
    before = np.asarray(tr.state.teacher_params["Conv1"]["conv0"]["kernel"]).copy()
    tr._run_train_epoch()
    after = np.asarray(tr.state.teacher_params["Conv1"]["conv0"]["kernel"])
    assert not np.allclose(before, after)  # EMA moved


def test_mixup_trainer(loaders, tmp_path):
    tr = _mk(TinyMixUp, loaders, tmp_path)
    tr.register_hooks(MixUpHook(weight=0.1))
    tr.init()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["mix_reg"]["loss"]["mean"])


def test_adversarial_trainer(loaders, tmp_path):
    tr = _mk(TinyAdv, loaders, tmp_path, reg_weight=0.01)
    tr.init()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["adv_reg"]["gen_loss"]["mean"])
    assert np.isfinite(stats["adv_reg"]["dis_loss"]["mean"])


def test_pretrain_encoder_self_paced(loaders, tmp_path):
    lab, unlab, val, test = loaders
    # the contrastive stream uses the FULL train set (reference _helper.py:30-74)
    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8), canvas=CANVAS, seed=0)
    closer = create_contrastive_loader(tra, scan_sample_num=3, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e4, end_value=20,
                                mode="soft", max_epoch=2)
    until = feature_until_from_hooks(hook)
    assert until == "Conv5"
    trainable = stages_from_range(None, "Conv5")
    tr = TinyPretrain(model=model, labeled_loader=lab, unlabeled_loader=None,
                      val_loader=val, test_loader=None, save_dir=str(tmp_path),
                      max_epoch=2, num_batches=2, config=dict(CONFIG), crop=CROP,
                      data_name="acdc", contrastive_loader=closer, forward_until=until)
    tr.register_hooks(hook)
    tr.set_trainable_stages(trainable)
    tr.init()
    # encoder pretrain stops the param tree at Conv5: no decoder params exist,
    # so the optimizer never allocates moments for them
    assert "Up_conv2" not in tr.state.params["model"]
    encoder_kernel_before = np.asarray(
        tr.state.params["model"]["Conv5"]["conv0"]["kernel"]).copy()
    tr.start_training()
    assert not np.allclose(
        encoder_kernel_before, np.asarray(tr.state.params["model"]["Conv5"]["conv0"]["kernel"]))
    assert (tmp_path / "last.ckpt").exists()
    # gamma schedule stepped
    assert hook.scheduler.epoch == 2

    # partial-tree warm start: a full-model finetune loads the encoder weights
    from spcl_tpu.training.checkpoint import load_model_params
    import jax, jax.numpy as jnp
    full = model.init(jax.random.PRNGKey(9), jnp.zeros((1, CROP, CROP, 1)), train=False)
    params, stats = load_model_params(str(tmp_path / "last.ckpt"),
                                      {"params": full["params"],
                                       "batch_stats": full.get("batch_stats", {})})
    np.testing.assert_allclose(np.asarray(params["Conv5"]["conv0"]["kernel"]),
                               np.asarray(tr.state.params["model"]["Conv5"]["conv0"]["kernel"]))
    assert "Up_conv2" in params  # decoder keeps its fresh init


def test_hook_creation_from_config():
    cfg = {"SPInfonceParams": {"feature_names": "Conv5", "weights": 1,
                               "contrast_ons": "partition", "begin_values": 10000,
                               "end_values": 10000, "mode": "soft", "p": 0.5,
                               "correct_grad": True},
           "MixUpParams": {"weight": 0.01, "enable_bn": True}}
    hooks = create_hook_from_config(cfg, max_epoch=80)
    names = {h.__class__.__name__ for h in hooks}
    assert names == {"SelfPacedINFONCEHook", "MixUpHook"}
