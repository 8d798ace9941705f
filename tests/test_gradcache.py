"""Gradient-cache chunked pretrain step (training/gradcache.py).

The core claim under test: the two-pass cached gradient (encode chunks
without grads -> differentiate the loss on the [2N, D] embeddings -> re-encode
each chunk pulling the cached cotangent through a VJP) is EXACTLY the
gradient of the same chunked computation by direct backprop (Gao et al. 2021).
Everything else (optimizer, masks, trainer wiring) reuses the monolithic
step's parts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.data import synthetic_dataset
from spcl_tpu.data.augment import AugmentPolicy
from spcl_tpu.data.device_store import DeviceStore
from spcl_tpu.data.samplers import InfiniteRandomSampler
from spcl_tpu.hooks import INFONCEHook, SelfPacedINFONCEHook
from spcl_tpu.models import UNet
from spcl_tpu.models.masking import stage_trainable_mask, stages_from_range
from spcl_tpu.training import build_optimizer, create_train_state
from spcl_tpu.training.gradcache import build_gradcache_pretrain_step

CANVAS, CROP = 48, 32


def _setup(num_chunks, batch_size=6, two_hooks=True, max_channel=128,
           mesh=None, global_contrast="replicated"):
    model = UNet(input_dim=1, num_classes=4, max_channel=max_channel)
    hooks = [SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                  contrast_on="partition", begin_value=50.0,
                                  end_value=5.0, mode="soft", max_epoch=2,
                                  use_fused=False,
                                  global_contrast=global_contrast)]
    if two_hooks:
        hooks.append(INFONCEHook(name="nce", feature_name="Conv5",
                                 contrast_on="patient", weight=0.5,
                                 use_fused=False,
                                 global_contrast=global_contrast))
    optimizer = build_optimizer(name="adam", lr=1e-3)
    ds = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(6, 8),
                           canvas=CANVAS, seed=0)
    store = DeviceStore.for_dataset(ds)
    sample = jnp.zeros((2, CROP, CROP, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False, until="Conv5")
    acts = jax.eval_shape(lambda v, x: model.apply(v, x, train=False, until="Conv5"),
                          variables, sample)
    sample_acts = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), acts)
    hook_params = {h.name: h.build(jax.random.PRNGKey(i + 1), model, sample_acts)
                   for i, h in enumerate(hooks)}
    state = create_train_state(model_params=variables["params"],
                               batch_stats=variables.get("batch_stats", {}),
                               hook_params=hook_params, tx=optimizer,
                               base_key=jax.random.PRNGKey(7))
    mask = stage_trainable_mask(variables["params"], stages_from_range(None, "Conv5"))
    step = build_gradcache_pretrain_step(
        model, hooks, optimizer, policy=AugmentPolicy(crop=CROP, rot_degrees=10.0),
        total_freedom=True, until="Conv5", num_chunks=num_chunks,
        grad_mask=mask, store=store, mesh=mesh)
    it = iter(InfiniteRandomSampler(ds, batch_size=batch_size, seed=0))
    mat = np.stack([np.asarray(ds.to_global(next(it)), np.int32) for _ in range(2)])
    scalars = {h.name: h.epoch_scalars(0) for h in hooks}
    return state, step, jax.device_put(mat), scalars


def _assert_tree_close(a, b, rtol=5e-5, atol=1e-5):
    # f32: XLA fuses/associates the two gradient schedules differently
    # (scan-accumulated VJPs vs one backward graph); observed deltas are
    # <=6e-6 absolute on O(0.1-1) grads. A logic error (dropped chunk, wrong
    # cotangent) shows up as O(1) relative error, far outside this band.
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_cached_grads_match_direct_backprop():
    """Two-pass cached gradient == jax.grad of the identical chunked loss:
    loss, BN stats, per-hook metrics, and EVERY parameter gradient (model
    under the stage mask is applied later; here raw grads must agree)."""
    state, step, mat, scalars = _setup(num_chunks=3)
    key = jax.random.PRNGKey(3)
    (ld, (stats_d, metrics_d)), gd = step.direct_value_and_grad(
        state, mat[0], key, scalars)
    (lc, (stats_c, metrics_c)), gc = step.cached_value_and_grad(
        state, mat[0], key, scalars)
    np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
    _assert_tree_close(stats_d, stats_c, rtol=1e-6)
    np.testing.assert_allclose(float(metrics_d["sp"]["sp_weight"]),
                               float(metrics_c["sp"]["sp_weight"]), rtol=1e-6)
    _assert_tree_close(gd, gc)


def test_single_chunk_also_exact():
    state, step, mat, scalars = _setup(num_chunks=1, two_hooks=False)
    key = jax.random.PRNGKey(5)
    (ld, _), gd = step.direct_value_and_grad(state, mat[0], key, scalars)
    (lc, _), gc = step.cached_value_and_grad(state, mat[0], key, scalars)
    np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
    _assert_tree_close(gd, gc)


def test_step_updates_params_and_chains_bn_stats():
    """The jitted epoch_step path: params move, step increments, loss finite,
    BN running stats actually change (chunk-chained updates)."""
    state, step, mat, scalars = _setup(num_chunks=2)
    before = np.asarray(state.params["model"]["Conv1"]["conv0"]["kernel"]).copy()
    stats_before = np.asarray(
        jax.tree_util.tree_leaves(state.batch_stats)[0]).copy()
    state, metrics = step.epoch_step(state, mat, scalars)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["reg_loss"]))
    after = np.asarray(state.params["model"]["Conv1"]["conv0"]["kernel"])
    assert np.abs(after - before).max() > 0
    stats_after = np.asarray(jax.tree_util.tree_leaves(state.batch_stats)[0])
    assert np.abs(stats_after - stats_before).max() > 0


def test_indivisible_batch_raises():
    state, step, mat, scalars = _setup(num_chunks=4)  # batch 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        step.epoch_step(state, mat, scalars)


def test_decoder_hook_rejected():
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    dense = INFONCEHook(name="dense", feature_name="Up_conv3", use_fused=False)
    with pytest.raises(NotImplementedError, match="encoder"):
        build_gradcache_pretrain_step(
            model, [dense], build_optimizer(name="adam", lr=1e-3),
            policy=AugmentPolicy(crop=CROP), total_freedom=True,
            until="Up_conv3", num_chunks=2)


def test_mesh_gradcache_matches_direct_oracle():
    """The three scaling axes composed — 8-device mesh x chunked two-pass
    grads x ROW-SHARDED global criterion: the cached gradient equals autodiff
    through the shard_map'ed chunked loss (per-chip chunk VJPs + grad psum ==
    d(global loss)/d(params))."""
    from spcl_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    state, step, mat, scalars = _setup(num_chunks=2, batch_size=16, mesh=mesh,
                                       global_contrast="row_sharded")
    key = jax.random.PRNGKey(3)
    (ld, _), gd = step.direct_value_and_grad(state, mat[0], key, scalars)
    (lc, (_, metrics_c)), gc = step.cached_value_and_grad(state, mat[0], key, scalars)
    np.testing.assert_allclose(float(ld), float(lc), rtol=1e-6)
    assert np.isfinite(float(metrics_c["sp"]["sp_weight"]))
    _assert_tree_close(gd, gc)


def test_mesh_gradcache_replicated_criterion_same_loss():
    """replicated vs row_sharded criteria under mesh gradcache: identical
    loss and grads (the same global function, different placement)."""
    from spcl_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(4)
    sr, stepr, matr, scal = _setup(num_chunks=2, batch_size=16, mesh=mesh,
                                   global_contrast="replicated", two_hooks=False)
    ss, steps_, mats, _ = _setup(num_chunks=2, batch_size=16, mesh=mesh,
                                 global_contrast="row_sharded", two_hooks=False)
    np.testing.assert_array_equal(np.asarray(matr), np.asarray(mats))
    (lr, _), gr = stepr.cached_value_and_grad(sr, matr[0], key, scal)
    (ls, _), gs = steps_.cached_value_and_grad(ss, mats[0], key, scal)
    np.testing.assert_allclose(float(lr), float(ls), rtol=1e-6)
    _assert_tree_close(gr, gs)


def test_mesh_gradcache_absolute_vs_single_device():
    """Ground truth: with DETERMINISTIC geometry (crop == canvas, no
    rotation/flips/jitter — keys become irrelevant), an 8-chip mesh run with
    1 chunk/chip computes exactly the same per-sample embeddings and chunk
    boundaries as a single-device run with 8 chunks — so loss AND parameter
    grads must match absolutely (BN running stats differ by chaining vs
    pmean; normalization doesn't depend on them)."""
    from spcl_tpu.parallel import make_mesh

    def build(mesh, num_chunks):
        model = UNet(input_dim=1, num_classes=4, max_channel=128)
        hook = SelfPacedINFONCEHook(name="sp", feature_name="Conv5",
                                    contrast_on="partition", begin_value=50.0,
                                    end_value=5.0, mode="soft", max_epoch=2,
                                    use_fused=False,
                                    global_contrast="row_sharded")
        optimizer = build_optimizer(name="adam", lr=1e-3)
        ds = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(6, 8),
                               canvas=CANVAS, seed=0)
        store = DeviceStore.for_dataset(ds)
        sample = jnp.zeros((2, CANVAS, CANVAS, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), sample, train=False,
                               until="Conv5")
        acts = jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False, until="Conv5"),
            variables, sample)
        sample_acts = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), acts)
        hook_params = {hook.name: hook.build(jax.random.PRNGKey(1), model,
                                             sample_acts)}
        state = create_train_state(model_params=variables["params"],
                                   batch_stats=variables.get("batch_stats", {}),
                                   hook_params=hook_params, tx=optimizer,
                                   base_key=jax.random.PRNGKey(7))
        # crop == canvas, zero rotation, no flips/jitter -> geometry is the
        # identity regardless of PRNG keys
        policy = AugmentPolicy(crop=CANVAS, rot_degrees=0.0, hflip=False,
                               vflip=False, crop_padding=0, jitter=False)
        step = build_gradcache_pretrain_step(
            model, [hook], optimizer, policy=policy, total_freedom=True,
            until="Conv5", num_chunks=num_chunks, flip_threshold=0.0,
            store=store, mesh=mesh)
        it = iter(InfiniteRandomSampler(ds, batch_size=16, seed=0))
        mat = np.asarray(ds.to_global(next(it)), np.int32)
        return state, step, jax.device_put(mat), {hook.name: hook.epoch_scalars(0)}

    key = jax.random.PRNGKey(11)
    s1, step1, mat1, scal = build(None, 8)          # 1 device x 8 chunks
    s8, step8, mat8, _ = build(make_mesh(8), 1)     # 8 chips x 1 chunk
    np.testing.assert_array_equal(np.asarray(mat1), np.asarray(mat8))
    (l1, _), g1 = step1.cached_value_and_grad(s1, mat1, key, scal)
    (l8, _), g8 = step8.cached_value_and_grad(s8, mat8, key, scal)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-6)
    _assert_tree_close(g1, g8)


def test_mesh_gradcache_step_runs():
    """The jitted mesh epoch_step surface: params move, loss finite."""
    from spcl_tpu.parallel import make_mesh
    mesh = make_mesh(8)
    state, step, mat, scalars = _setup(num_chunks=2, batch_size=16, mesh=mesh,
                                       global_contrast="row_sharded",
                                       two_hooks=False)
    before = np.asarray(state.params["model"]["Conv1"]["conv0"]["kernel"]).copy()
    state, metrics = step.epoch_step(state, mat, scalars)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["reg_loss"]))
    after = np.asarray(state.params["model"]["Conv1"]["conv0"]["kernel"])
    assert np.abs(after - before).max() > 0


@pytest.mark.slow
def test_trainer_mesh_grad_cache(tmp_path):
    """Trainer.mesh=8 x Trainer.grad_cache x row-sharded criterion: the full
    three-axis composition drives a real pretrain epoch end to end."""
    from spcl_tpu.data import create_contrastive_loader, get_data
    from spcl_tpu.hooks import feature_until_from_hooks
    from spcl_tpu.models.masking import stages_from_range
    from spcl_tpu.training import PretrainEncoderTrainer

    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(6, 8),
                             canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                  labeled_batch_size=8, unlabeled_batch_size=8,
                                  load_predefined_list=False)
    closer = create_contrastive_loader(tra, scan_sample_num=8, seed=0)  # 24 slices
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition",
                                feature_name="Conv5", contrast_on="partition",
                                begin_value=50.0, end_value=5.0, mode="soft",
                                max_epoch=1, global_contrast="row_sharded")
    until = feature_until_from_hooks(hook)
    config = {"Optim": {"name": "RAdam", "lr": 1e-4, "weight_decay": 1e-5},
              "Scheduler": {"multiplier": 10, "warmup_max": 2},
              "Trainer": {"grad_cache": 3}}  # 24/8 = 3 slices/chip -> 3 chunks
    tr = PretrainEncoderTrainer(
        model=model, labeled_loader=lab, unlabeled_loader=None, val_loader=val,
        test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
        config=config, crop=CROP, data_name="acdc", contrastive_loader=closer,
        forward_until=until, mesh=8)
    tr.register_hooks(hook)
    tr.set_trainable_stages(stages_from_range(None, "Conv5"))
    tr.init()
    assert getattr(tr._train_step, "num_chunks", None) == 3
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["tra"]["reg_loss"]["mean"])


@pytest.mark.slow
def test_trainer_grad_cache_knob(tmp_path):
    """Trainer.grad_cache=3 drives a real pretrain epoch end to end (the
    contrastive batch is 3 scans x 3 partitions = 9 slices -> 3 chunks)."""
    from spcl_tpu.data import create_contrastive_loader, get_data
    from spcl_tpu.hooks import feature_until_from_hooks
    from spcl_tpu.models.masking import stages_from_range
    from spcl_tpu.training import PretrainEncoderTrainer

    tra = synthetic_dataset("acdc", num_scans=8, slices_per_scan=(6, 8),
                            canvas=CANVAS, seed=0)
    test = synthetic_dataset("acdc", num_scans=4, slices_per_scan=(6, 8),
                             canvas=CANVAS, seed=1, mode="val")
    lab, unlab, val, _ = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                  labeled_batch_size=3, unlabeled_batch_size=3,
                                  load_predefined_list=False)
    closer = create_contrastive_loader(tra, scan_sample_num=3, seed=0)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    hook = SelfPacedINFONCEHook(name="spinfonce/Conv5/partition",
                                feature_name="Conv5", contrast_on="partition",
                                begin_value=50.0, end_value=5.0, mode="soft",
                                max_epoch=1, use_fused=False)
    until = feature_until_from_hooks(hook)
    config = {"Optim": {"name": "RAdam", "lr": 1e-4, "weight_decay": 1e-5},
              "Scheduler": {"multiplier": 10, "warmup_max": 2},
              "Trainer": {"grad_cache": 3}}
    tr = PretrainEncoderTrainer(
        model=model, labeled_loader=lab, unlabeled_loader=None, val_loader=val,
        test_loader=None, save_dir=str(tmp_path), max_epoch=1, num_batches=2,
        config=config, crop=CROP, data_name="acdc", contrastive_loader=closer,
        forward_until=until)
    tr.register_hooks(hook)
    tr.set_trainable_stages(stages_from_range(None, "Conv5"))
    tr.init()
    assert getattr(tr._train_step, "num_chunks", None) == 3
    before = np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"]).copy()
    stats = tr._run_train_epoch()
    assert np.isfinite(stats["tra"]["reg_loss"]["mean"])
    after = np.asarray(tr.state.params["model"]["Conv1"]["conv0"]["kernel"])
    assert np.abs(after - before).max() > 0
