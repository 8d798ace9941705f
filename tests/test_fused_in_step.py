"""The fused Pallas criterion inside a REAL pretrain train step (VERDICT r1
item 7): one optimizer step through build_pretrain_step with use_fused=True
must match the naive-jnp path — loss, downgrade ratio, and the updated
parameters. On CPU the kernel runs in interpret mode; the same code path
compiles to Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from spcl_tpu.data import create_contrastive_loader, synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.data.device_store import DeviceStore
from spcl_tpu.hooks import SelfPacedINFONCEHook
from spcl_tpu.hooks.infonce import _FUSED_MIN_ROWS, _use_fused
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range
from spcl_tpu.training import build_optimizer, create_train_state
from spcl_tpu.training.steps import build_pretrain_step
import pytest

pytestmark = pytest.mark.slow  # step-compile/integration heavy (see pyproject)

CANVAS, CROP = 64, 48


def _setup(use_fused):
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                contrast_on="partition", begin_value=100.0,
                                end_value=5.0, mode="soft", max_epoch=2,
                                use_fused=use_fused)
    optimizer = build_optimizer(name="adam", lr=1e-3)
    ds = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
    acts = jax.eval_shape(lambda v, x: model.apply(v, x, train=False, until="Conv5"),
                          variables, sample)
    sample_acts = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), acts)
    hook_params = {hook.name: hook.build(jax.random.PRNGKey(1), model, sample_acts)}
    state = create_train_state(model_params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               hook_params=hook_params, tx=optimizer,
                               base_key=jax.random.PRNGKey(7))
    mask = stage_trainable_mask(variables["params"], stages_from_range(None, "Conv5"))
    step = build_pretrain_step(model, [hook], optimizer,
                               policy=AugmentPolicy(crop=CROP, rot_degrees=10.0),
                               total_freedom=True, until="Conv5", grad_mask=mask,
                               store=store)
    loader = create_contrastive_loader(ds, scan_sample_num=4, seed=0)
    it = iter(loader.sampler)
    mat = np.stack([np.asarray(ds.to_global(next(it)), np.int32) for _ in range(2)])
    return state, step, jax.device_put(mat), {hook.name: hook.epoch_scalars(0)}


def test_fused_step_matches_naive_step():
    # identical init/keys/batch for both paths (seeded)
    state_f, step_f, mat_f, scal = _setup(use_fused=True)
    state_n, step_n, mat_n, _ = _setup(use_fused=False)
    np.testing.assert_array_equal(np.asarray(mat_f), np.asarray(mat_n))

    state_f, m_f = step_f.epoch_step(state_f, mat_f, scal)
    state_n, m_n = step_n.epoch_step(state_n, mat_n, scal)
    np.testing.assert_allclose(float(m_f["reg_loss"]), float(m_n["reg_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_f["hooks"]["sp"]["sp_weight"]),
                               float(m_n["hooks"]["sp"]["sp_weight"]), rtol=1e-5)
    # the optimizer update (i.e. the gradients) must agree too
    kf = np.asarray(state_f.params["model"]["Conv5"]["conv0"]["kernel"])
    kn = np.asarray(state_n.params["model"]["Conv5"]["conv0"]["kernel"])
    np.testing.assert_allclose(kf, kn, rtol=1e-4, atol=1e-7)
    pf = np.asarray(jax.tree_util.tree_leaves(state_f.params["hooks"])[0])
    pn = np.asarray(jax.tree_util.tree_leaves(state_n.params["hooks"])[0])
    np.testing.assert_allclose(pf, pn, rtol=1e-4, atol=1e-7)


def test_auto_selection_crossover(monkeypatch):
    """auto -> fused exactly on TPU at 2N >= _FUSED_MIN_ROWS."""
    import spcl_tpu.hooks.infonce as inf
    assert not _use_fused("auto", 4096)  # CPU test backend: naive
    monkeypatch.setattr(inf.jax, "default_backend", lambda: "tpu")
    assert inf._use_fused("auto", _FUSED_MIN_ROWS)
    assert not inf._use_fused("auto", _FUSED_MIN_ROWS - 2)
    assert inf._use_fused(True, 4)
    assert not inf._use_fused(False, 1 << 20)
