"""Batch-0 similarity/mask/self-paced-weight TensorBoard dumps (VERDICT r1
item 6; reference semi_seg/hooks/infonce.py:185-193,263-266 plots sim_exp,
sim_logits, pos_mask each epoch, sp_mask for the self-paced hook)."""
import numpy as np

from spcl_tpu.data import create_contrastive_loader, get_data, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.hooks import SelfPacedINFONCEHook
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stages_from_range
from spcl_tpu.training import PretrainEncoderTrainer
import pytest

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48


class TinyPretrain(PretrainEncoderTrainer):
    @property
    def train_policy(self):
        return AugmentPolicy(crop=CROP, rot_degrees=20.0, jitter=True)


def _image_tags(log_dir):
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
    acc = EventAccumulator(str(log_dir), size_guidance={"images": 0})
    acc.Reload()
    return acc.Tags().get("images", [])


def test_pretrain_dumps_sim_and_sp_matrices(tmp_path):
    tra = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(6, 8),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=3, slices_per_scan=(6, 8),
                             canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, tst = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                    labeled_batch_size=3, unlabeled_batch_size=3,
                                    load_predefined_list=False)
    closer = create_contrastive_loader(tra, scan_sample_num=3, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition", feature_name="Conv5",
                                contrast_on="partition", begin_value=1e4, end_value=20,
                                mode="soft", max_epoch=2)
    tr = TinyPretrain(model=model, labeled_loader=lab, unlabeled_loader=None,
                      val_loader=val, test_loader=None, save_dir=str(tmp_path),
                      max_epoch=2, num_batches=2,
                      config={"Optim": {"name": "RAdam", "lr": 1e-4},
                              "Trainer": {"dump_matrices": True}},
                      crop=CROP, data_name="acdc", contrastive_loader=closer,
                      forward_until="Conv5")
    tr.register_hooks(hook)
    tr.set_trainable_stages(stages_from_range(None, "Conv5"))
    tr.init()
    assert tr._matrix_probe is not None
    tr.start_training()
    tr._writer.close()
    tags = _image_tags(tmp_path)
    for name in ("sim_logits", "sim_exp", "pos_mask", "sp_mask"):
        assert f"spinfonce/Conv5/partition/{name}" in tags, tags


def test_matrix_probe_values_match_loss_aux(tmp_path):
    """The probe's pos_mask/sp_mask equal a direct loss call with the same
    embeddings (the probe is a re-computation, not a separate code path)."""
    import jax
    import jax.numpy as jnp
    from spcl_tpu.losses.supcon import self_paced_supcon_loss

    rng = np.random.default_rng(0)
    z = rng.normal(size=(8, 16)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    z1, z2 = jnp.asarray(z[:4]), jnp.asarray(z[4:])
    target = jnp.asarray([0, 0, 1, 1], jnp.int32)
    _, aux = self_paced_supcon_loss(z1, z2, target=target, gamma=2.0,
                                    weight_update="hard", return_matrices=True)
    assert aux.sim_logits.shape == (8, 8)
    assert aux.pos_mask.shape == (8, 8)
    # diagonal excluded; tiled meta-label positives present
    m = np.asarray(aux.pos_mask)
    assert (np.diag(m) == 0).all()
    assert m[0, 1] == 1 and m[0, 4] == 1 and m[0, 2] == 0
    # hard mode: weights binary on positives, exactly 1 off the positive mask
    # (reference torch.max(w, 1 - pos_mask), contrast_loss3.py:207-214)
    sp = np.asarray(aux.sp_mask)
    assert set(np.unique(sp[m == 1])) <= {0.0, 1.0}
    assert (sp[m == 0] == 1).all()
