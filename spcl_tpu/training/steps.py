"""Jitted step builders — the TPU equivalents of the reference epochers' inner loops.

Each builder closes over the *static* configuration (model, hooks, optimizer,
augmentation policy) and returns a jitted function over the *dynamic* state
(TrainState, batch, PRNG key, per-epoch scalars). One XLA program fuses
augmentation -> forward -> losses (incl. hook regularizers) -> backward ->
optimizer update -> EMA. The reference's host-side loops
(semi_seg/epochers/new_epocher.py:145-238, new_pretrain.py:19-126,
new_comparable.py:18-206) map here 1:1, with augmentation moved on device.

Multi-chip: wrap any of these steps with spcl_tpu.parallel.shard_step to run
under a `data`-axis mesh (gradient psum + contrastive all_gather).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .state import TrainState
from ..data.augment import (AugmentPolicy, apply_flip, augment_once, augment_twice,
                            center_crop, flip_params, mesh_warp_block)
from ..data.device_store import DeviceStore, gather_from
from ..hooks.base import TrainerHook
from ..losses.functional import class2one_hot
from ..meters.dice import dice_stats_from_labels
from ..models.masking import zero_grads_by_mask


def _epoch_row(state: TrainState, epoch_idx: jnp.ndarray):
    """Epoch-batched mode: the trainer uploads the WHOLE epoch's index matrix
    [num_batches, B] once; each step selects its row by state.step and derives
    its PRNG key from state.base_key — leaving ONE runtime RPC per step (the
    execute). Valid because every epoch runs exactly num_batches steps."""
    nb = epoch_idx.shape[0]
    row = jax.lax.rem(state.step, nb)
    idx = jax.lax.dynamic_index_in_dim(epoch_idx, row, axis=0, keepdims=False)
    key = jax.random.fold_in(state.base_key, state.step)
    return idx, key


def _resolve_batch(store_arrays, batch_or_idx):
    """Steps accept either a host batch dict or, with a DeviceStore, a [B]
    int32 global-index vector — the batch is gathered in HBM (the only
    per-step H2D traffic is the index vector). The store arrays travel as
    EXPLICIT jit args (closure capture re-materializes them per call)."""
    if store_arrays is None:
        return batch_or_idx
    return gather_from(store_arrays, batch_or_idx)


def _as_float_image(img):
    """Batches ship images as packed uint8 (4x less H2D traffic over the
    device link); scale to [0, 1] float on device. Float inputs pass through."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def _as_int_label(lab):
    return lab.astype(jnp.int32)


def _masked_ce(logits, onehot, valid, pixel_mask=None):
    """Pixel-mean CE over valid slices (kl_div(softmax, onehot) parity).
    `pixel_mask` [B, h, w] additionally restricts to in-frame pixels (the
    shortest-side val-resize path pads non-square frames)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)  # [B, h, w]
    m = valid[:, None, None] * jnp.ones_like(ce)
    if pixel_mask is not None:
        m = m * pixel_mask
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def _apply_model(model, params, batch_stats, x, *, train, until=None, update_stats=True):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        acts, mut = model.apply(variables, x, train=True, until=until, mutable=["batch_stats"])
        new_stats = mut["batch_stats"] if update_stats else batch_stats
        return acts, new_stats
    return model.apply(variables, x, train=False, until=until), batch_stats


def _optimizer_update(optimizer, grads, state: TrainState, grad_mask):
    if grad_mask is not None:
        grads = {"model": zero_grads_by_mask(grads["model"], grad_mask),
                 "hooks": grads["hooks"]}
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return new_params, new_opt


def _ema_after_step(state: TrainState, new_params, alpha_max: float):
    if state.teacher_params is None:
        return None
    alpha = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 2.0), alpha_max)
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s, state.teacher_params, new_params["model"])


# =============================================================================== eval
def build_eval_step(model, *, num_classes: int, crop: int,
                    store: Optional[DeviceStore] = None,
                    val_policy: Optional[AugmentPolicy] = None,
                    out_size: Optional[int] = None) -> Callable:
    """Per-scan eval step (reference EvalEpocher, new_epocher.py:56-97):
    val transform (center crop, or plain resize for the resize-based
    datasets) -> forward -> masked CE + per-slice dice stats.

    `out_size` > crop: shortest-side val resize (Resize(int), prostate) on
    non-square slices — the frame pads into the static canvas and loss/dice
    restrict to frame pixels, matching the reference's resize-only val
    geometry (semi_seg/augment.py:84-87)."""
    shortest_side = val_policy is not None and isinstance(val_policy.resize, int)
    out = crop if out_size is None else int(out_size)

    @jax.jit
    def _eval(params, batch_stats, batch, store_arrays):
        batch = _resolve_batch(store_arrays, batch)
        from ..data.augment import center_geometric, frame_pixel_mask, apply_geometric
        pol = val_policy if val_policy is not None else AugmentPolicy(crop=crop)
        geo = center_geometric(batch["image"].shape[0], pol,
                               batch["image"].shape[1], batch.get("size"), out)
        img, lab = apply_geometric(_as_float_image(batch["image"]),
                                   _as_int_label(batch["label"]), geo, out,
                                   max_degrees=0.0)
        pix = frame_pixel_mask(geo, out) if shortest_side else None
        acts, _ = _apply_model(model, params, batch_stats, img, train=False)
        logits = acts["logits"]
        onehot = class2one_hot(lab, num_classes)
        loss = _masked_ce(logits, onehot, batch["valid"], pixel_mask=pix)
        pred = jnp.argmax(logits, axis=-1)
        # outside-frame pixels exist only in our padding: restrict dice stats
        # to frame pixels (every class, incl. background) so they match the
        # reference's resize-only val geometry exactly
        inter, union = dice_stats_from_labels(pred, lab, num_classes,
                                              batch["valid"], pixel_mask=pix)
        return {"loss": loss, "inter": inter, "union": union}

    arrays = store.arrays if store is not None else None

    def eval_step(params, batch_stats, batch):
        return _eval(params, batch_stats, batch, arrays)

    return eval_step


# =============================================================================== finetune
def build_finetune_step(model, optimizer, *, num_classes: int, policy: AugmentPolicy,
                        grad_mask=None, hooks: Sequence[TrainerHook] = (),
                        store: Optional[DeviceStore] = None) -> Callable:
    """Labeled-only step (reference FineTuneEpocher, new_epocher.py:241-289).

    Optional labeled-only hooks (MixUpHook — reference MixUpEpocher,
    new_comparable.py:18-86) get a ctx with both labeled views + apply_student.
    """
    hooks = tuple(hooks)

    def loss_fn(params, batch_stats, batch, key, hook_scalars):
        k_aug, k_hooks = jax.random.split(key)
        image = _as_float_image(batch["image"])
        label = _as_int_label(batch["label"])
        if hooks:
            (img, lab), (img2, lab2) = augment_twice(
                k_aug, image, label, policy, total_freedom=True,
                sizes=batch.get("size"))
        else:
            img, lab = augment_once(k_aug, image, label, policy,
                                    sizes=batch.get("size"))
        acts, new_stats = _apply_model(model, params["model"], batch_stats, img, train=True)
        logits = acts["logits"]
        onehot = class2one_hot(lab, num_classes)
        sup = _masked_ce(logits, onehot, batch["valid"])

        reg_total = jnp.zeros((), jnp.float32)
        hook_metrics = {}
        if hooks:
            def apply_student(images):
                a, _ = _apply_model(model, params["model"], new_stats, images,
                                    train=True, update_stats=False)
                return a["logits"]

            ctx = {"acts": acts, "key": k_hooks, "num_classes": num_classes,
                   "valid": batch["valid"], "apply_student": apply_student,
                   "labeled_image": img, "labeled_onehot": onehot,
                   "labeled_image_tf": img2,
                   "labeled_onehot_tf": class2one_hot(lab2, num_classes)}
            for h in hooks:
                l, m = h.loss_fn(params["hooks"].get(h.name), ctx,
                                 hook_scalars.get(h.name, {}))
                reg_total = reg_total + l
                hook_metrics[h.name] = m
        total = sup + reg_total
        return total, (new_stats, logits, lab, sup, hook_metrics)

    def _step_body(state: TrainState, batch, key, hook_scalars):
        (_, (new_stats, logits, lab, sup, hook_metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, key, hook_scalars)
        new_params, new_opt = _optimizer_update(optimizer, grads, state, grad_mask)
        pred = jnp.argmax(logits, axis=-1)
        inter, union = dice_stats_from_labels(pred, lab, num_classes, batch["valid"])
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"sup_loss": sup, "inter": inter, "union": union,
                           "hooks": hook_metrics}

    @partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch, key, hook_scalars, store_arrays):
        return _step_body(state, _resolve_batch(store_arrays, batch), key, hook_scalars)

    arrays = store.arrays if store is not None else None

    @partial(jax.jit, donate_argnums=(0,))
    def _epoch_step(state: TrainState, epoch_idx, hook_scalars, store_arrays):
        idx, key = _epoch_row(state, epoch_idx)
        return _step_body(state, _resolve_batch(store_arrays, idx), key, hook_scalars)

    def step(state, batch, key, hook_scalars):
        return _step(state, batch, key, hook_scalars, arrays)

    def epoch_step(state, epoch_idx, hook_scalars):
        return _epoch_step(state, epoch_idx, hook_scalars, arrays)

    step.epoch_step = epoch_step
    return step


# =============================================================================== semi
def build_semi_step(model, hooks: Sequence[TrainerHook], optimizer, *,
                    num_classes: int, policy: AugmentPolicy, grad_mask=None,
                    flip_threshold: float = 0.8, two_stage: bool = False,
                    disable_bn: bool = False, ema_alpha: float = 0.999,
                    store: Optional[DeviceStore] = None, mesh=None) -> Callable:
    """Semi-supervised step (reference SemiSupervisedEpocher._run_semi,
    new_epocher.py:145-238): sup CE on labeled view + sum of hook regularizers
    on the unlabeled pair; optional two-stage forward with frozen BN stats for
    the unlabeled pass; EMA teacher maintained when any hook needs it."""
    hooks = tuple(hooks)
    needs_teacher = any(h.needs_teacher for h in hooks)
    needs_mixup = any(isinstance_name(h) == "MixUpHook" for h in hooks)
    warp_block = mesh_warp_block(mesh)  # see augment.mesh_warp_block

    def loss_fn(params, batch_stats, teacher_params, batch_l, batch_u, key, hook_scalars):
        k_lab, k_unl, k_flip, k_hooks = jax.random.split(key, 4)
        image_l = _as_float_image(batch_l["image"])
        label_l = _as_int_label(batch_l["label"])
        if needs_mixup:
            # mixup consumes both labeled views (reference new_comparable.py:18-86)
            (img_l, lab_l), (img_l2, lab_l2) = augment_twice(
                k_lab, image_l, label_l, policy, total_freedom=True,
                sizes=batch_l.get("size"), block=warp_block)
        else:
            img_l, lab_l = augment_once(k_lab, image_l, label_l, policy,
                                        sizes=batch_l.get("size"), block=warp_block)
        (img_u, _), (img_u_cf, _) = augment_twice(
            k_unl, _as_float_image(batch_u["image"]), None, policy,
            total_freedom=False, sizes=batch_u.get("size"), block=warp_block)
        n_l, n_u = img_l.shape[0], img_u.shape[0]
        fp = flip_params(k_flip, n_u, threshold=flip_threshold)
        img_u_tf = apply_flip(img_u_cf, fp)

        if not two_stage:
            x = jnp.concatenate([img_l, img_u, img_u_tf], axis=0)
            acts, new_stats = _apply_model(model, params["model"], batch_stats, x, train=True)
            logits = acts["logits"]
            logits_l = logits[:n_l]
            logits_u = logits[n_l:n_l + n_u]
            logits_u_tf = logits[n_l + n_u:]
        else:
            acts_l, stats1 = _apply_model(model, params["model"], batch_stats, img_l, train=True)
            acts, new_stats = _apply_model(model, params["model"], stats1,
                                           jnp.concatenate([img_u, img_u_tf], axis=0),
                                           train=True, update_stats=not disable_bn)
            logits_l = acts_l["logits"]
            logits_u = acts["logits"][:n_u]
            logits_u_tf = acts["logits"][n_u:]

        onehot_l = class2one_hot(lab_l, num_classes)
        sup = _masked_ce(logits_l, onehot_l, batch_l["valid"])

        # replay the same flips on the unlabeled logits (reference :169-170)
        logits_u_flipped = apply_flip(logits_u, fp)

        def apply_student(images):
            a, _ = _apply_model(model, params["model"], new_stats, images,
                                train=True, update_stats=False)
            return a["logits"]

        ctx = {
            "acts": acts, "n_unl": n_u, "flip": fp,
            "unlabeled_tf_logits": logits_u_tf, "unlabeled_logits_tf": logits_u_flipped,
            "unlabeled_image": img_u, "unlabeled_image_tf": img_u_tf,
            "partition": batch_u["partition"], "patient": batch_u["patient"],
            "cycle": batch_u["cycle"], "scan_idx": batch_u["scan_idx"],
            "valid": batch_u["valid"], "key": k_hooks, "mesh": mesh,
            "apply_student": apply_student, "num_classes": num_classes,
            "labeled_image": img_l, "labeled_onehot": onehot_l,
        }
        if needs_teacher:
            def apply_teacher(images):
                a, _ = _apply_model(model, jax.lax.stop_gradient(teacher_params),
                                    batch_stats, images, train=True, update_stats=False)
                return jax.lax.stop_gradient(a["logits"])

            ctx["teacher_logits_tf"] = apply_flip(apply_teacher(img_u), fp)
            ctx["apply_teacher"] = apply_teacher
        if needs_mixup:
            ctx["labeled_image_tf"] = img_l2
            ctx["labeled_onehot_tf"] = class2one_hot(lab_l2, num_classes)

        reg_total = jnp.zeros((), jnp.float32)
        hook_metrics = {}
        for h in hooks:
            h_params = params["hooks"].get(h.name)
            l, m = h.loss_fn(h_params, ctx, hook_scalars.get(h.name, {}))
            reg_total = reg_total + l
            hook_metrics[h.name] = m

        total = sup + reg_total
        aux = {"new_stats": new_stats, "sup_loss": sup, "reg_loss": reg_total,
               "logits_l": logits_l, "lab_l": lab_l, "hook_metrics": hook_metrics}
        return total, aux

    def _step_body(state: TrainState, batch_l, batch_u, key, hook_scalars):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.teacher_params,
            batch_l, batch_u, key, hook_scalars)
        new_params, new_opt = _optimizer_update(optimizer, grads, state, grad_mask)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=aux["new_stats"], opt_state=new_opt)
        if needs_teacher:
            new_state = new_state.replace(
                teacher_params=_ema_after_step(state, new_params, ema_alpha))
        pred = jnp.argmax(aux["logits_l"], axis=-1)
        inter, union = dice_stats_from_labels(pred, aux["lab_l"], num_classes, batch_l["valid"])
        metrics = {"sup_loss": aux["sup_loss"], "reg_loss": aux["reg_loss"],
                   "inter": inter, "union": union, "hooks": aux["hook_metrics"]}
        return new_state, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch_l, batch_u, key, hook_scalars, store_arrays):
        return _step_body(state, _resolve_batch(store_arrays, batch_l),
                          _resolve_batch(store_arrays, batch_u), key, hook_scalars)

    @partial(jax.jit, donate_argnums=(0,))
    def _epoch_step(state: TrainState, epoch_idx_l, epoch_idx_u, hook_scalars,
                    store_arrays):
        idx_l, key = _epoch_row(state, epoch_idx_l)
        nb = epoch_idx_u.shape[0]
        idx_u = jax.lax.dynamic_index_in_dim(
            epoch_idx_u, jax.lax.rem(state.step, nb), axis=0, keepdims=False)
        return _step_body(state, _resolve_batch(store_arrays, idx_l),
                          _resolve_batch(store_arrays, idx_u), key, hook_scalars)

    arrays = store.arrays if store is not None else None

    def step(state, batch_l, batch_u, key, hook_scalars):
        return _step(state, batch_l, batch_u, key, hook_scalars, arrays)

    def epoch_step(state, epoch_idx_l, epoch_idx_u, hook_scalars):
        return _epoch_step(state, epoch_idx_l, epoch_idx_u, hook_scalars, arrays)

    step.epoch_step = epoch_step
    return step


def isinstance_name(obj) -> str:
    return obj.__class__.__name__


def wrap_pretrain_style_step(step_body, store: Optional[DeviceStore]):
    """Jit/donate/epoch plumbing shared by every (state, batch, key, scalars)
    pretrain-shaped step body (build_pretrain_step and the gradient-cache
    step in training/gradcache.py): donated-state jit, the DeviceStore
    arrays as explicit args, and the epoch-batched entry (_epoch_row)."""
    def raw_step(state: TrainState, batch, key, hook_scalars, store_arrays=None):
        return step_body(state, _resolve_batch(store_arrays, batch), key, hook_scalars)

    jitted = partial(jax.jit, donate_argnums=(0,))(raw_step)

    @partial(jax.jit, donate_argnums=(0,))
    def _epoch_step(state: TrainState, epoch_idx, hook_scalars, store_arrays):
        idx, key = _epoch_row(state, epoch_idx)
        return step_body(state, _resolve_batch(store_arrays, idx), key, hook_scalars)

    arrays = store.arrays if store is not None else None

    def step(state, batch, key, hook_scalars):
        return jitted(state, batch, key, hook_scalars, arrays)

    def epoch_step(state, epoch_idx, hook_scalars):
        return _epoch_step(state, epoch_idx, hook_scalars, arrays)

    step.raw = raw_step  # for lax.scan'ed multi-step drivers (bench, big runs)
    step.epoch_step = epoch_step
    step.store_arrays = arrays
    return step


# =============================================================================== pretrain
def build_pretrain_step(model, hooks: Sequence[TrainerHook], optimizer, *,
                        policy: AugmentPolicy, total_freedom: bool, until: Optional[str],
                        grad_mask=None, flip_threshold: float = 0.8,
                        store: Optional[DeviceStore] = None, mesh=None) -> Callable:
    """Contrastive pretrain step (reference _PretrainEpocherMixin,
    new_pretrain.py:19-126): two on-device views, view-2 additionally flipped
    with replayable params, partial forward to `until`, loss = hook sum.

    `mesh` (the Trainer's device mesh, or None) reaches the hooks via ctx so
    contrastive criteria can choose the row-sharded global-batch form
    (hooks/infonce.py global_contrast="row_sharded")."""
    hooks = tuple(hooks)

    warp_block = mesh_warp_block(mesh)  # see augment.mesh_warp_block

    def loss_fn(params, batch_stats, batch, key, hook_scalars):
        k_aug, k_flip, k_hooks = jax.random.split(key, 3)
        (v1, _), (v2, _) = augment_twice(k_aug, _as_float_image(batch["image"]),
                                         None, policy, total_freedom=total_freedom,
                                         sizes=batch.get("size"), block=warp_block)
        n = v1.shape[0]
        fp = flip_params(k_flip, n, threshold=flip_threshold)
        v2 = apply_flip(v2, fp)
        x = jnp.concatenate([v1, v2], axis=0)
        acts, new_stats = _apply_model(model, params["model"], batch_stats, x,
                                       train=True, until=until)
        ctx = {
            "acts": acts, "n_unl": n, "flip": fp,
            "unlabeled_tf_logits": None, "unlabeled_logits_tf": None,
            "partition": batch["partition"], "patient": batch["patient"],
            "cycle": batch["cycle"], "scan_idx": batch["scan_idx"],
            "valid": batch["valid"], "key": k_hooks, "mesh": mesh,
        }
        total = jnp.zeros((), jnp.float32)
        hook_metrics = {}
        for h in hooks:
            h_params = params["hooks"].get(h.name)
            l, m = h.loss_fn(h_params, ctx, hook_scalars.get(h.name, {}))
            total = total + l
            hook_metrics[h.name] = m
        return total, (new_stats, hook_metrics)

    def _step_body(state: TrainState, batch, key, hook_scalars):
        (loss, (new_stats, hook_metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, key, hook_scalars)
        new_params, new_opt = _optimizer_update(optimizer, grads, state, grad_mask)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"reg_loss": loss, "hooks": hook_metrics}

    return wrap_pretrain_style_step(_step_body, store)


# =============================================================================== matrix probe
def build_matrix_probe(model, hooks: Sequence[TrainerHook], *, policy: AugmentPolicy,
                       total_freedom: bool, until: Optional[str] = None,
                       flip_threshold: float = 0.8,
                       store: Optional[DeviceStore] = None) -> Optional[Callable]:
    """Once-per-epoch diagnostics program: recompute batch 0's contrastive
    matrices (sim logits / exp, pos mask, sp mask) for every hook exposing
    `matrices_fn` — the reference plots these to TensorBoard on the first
    batch of each epoch (semi_seg/hooks/infonce.py:185-193,263-266). Kept out
    of the hot step so the [2N,2N] tensors only exist in this tiny program.
    Returns None when no registered hook produces matrices."""
    hooks = tuple(h for h in hooks if hasattr(h, "matrices_fn"))
    if not hooks:
        return None

    @jax.jit
    def _probe(params, batch_stats, batch, key, hook_scalars, store_arrays):
        batch = _resolve_batch(store_arrays, batch)
        k_aug, k_flip, k_hooks = jax.random.split(key, 3)
        (v1, _), (v2, _) = augment_twice(k_aug, _as_float_image(batch["image"]),
                                         None, policy, total_freedom=total_freedom,
                                         sizes=batch.get("size"))
        n = v1.shape[0]
        fp = flip_params(k_flip, n, threshold=flip_threshold)
        v2 = apply_flip(v2, fp)
        acts = model.apply({"params": params["model"], "batch_stats": batch_stats},
                           jnp.concatenate([v1, v2], axis=0), train=False, until=until)
        ctx = {"acts": acts, "n_unl": n, "flip": fp,
               "partition": batch["partition"], "patient": batch["patient"],
               "cycle": batch["cycle"], "scan_idx": batch["scan_idx"],
               "valid": batch["valid"], "key": k_hooks}
        return {h.name: h.matrices_fn(params["hooks"].get(h.name), ctx,
                                      hook_scalars.get(h.name, {}))
                for h in hooks}

    arrays = store.arrays if store is not None else None

    def probe(params, batch_stats, batch, key, hook_scalars):
        return _probe(params, batch_stats, batch, key, hook_scalars, arrays)

    return probe


# =============================================================================== adversarial
def build_adversarial_step(model, discr, optimizer, discr_optimizer, *,
                           num_classes: int, policy: AugmentPolicy,
                           reg_weight: float, dis_consider_image: bool = False,
                           store: Optional[DeviceStore] = None) -> Callable:
    """DCGAN-style adversarial baseline (reference AdversarialEpocher,
    new_comparable.py:89-206): generator = segmentor (sup CE + fool-D on
    unlabeled), discriminator = labeled(real)/unlabeled(fake) BCE."""

    def gen_loss_fn(params, batch_stats, discr_params, batch_l, batch_u, key):
        k_l, k_u = jax.random.split(key)
        img_l, lab_l = augment_once(k_l, _as_float_image(batch_l["image"]),
                                    _as_int_label(batch_l["label"]), policy,
                                    sizes=batch_l.get("size"))
        img_u, _ = augment_once(k_u, _as_float_image(batch_u["image"]), None, policy,
                                sizes=batch_u.get("size"))
        acts_l, stats1 = _apply_model(model, params["model"], batch_stats, img_l, train=True)
        logits_l = acts_l["logits"]
        onehot_l = class2one_hot(lab_l, num_classes)
        sup = _masked_ce(logits_l, onehot_l, batch_l["valid"])
        gen_err = jnp.zeros((), jnp.float32)
        logits_u = None
        new_stats = stats1
        if reg_weight > 0:
            acts_u, new_stats = _apply_model(model, params["model"], stats1, img_u, train=True)
            logits_u = acts_u["logits"]
            d_in = jax.nn.softmax(logits_u, axis=-1)
            if dis_consider_image:
                d_in = jnp.concatenate([img_u, d_in], axis=-1)
            d_out = discr.apply(discr_params, d_in)
            # BCE towards TRUE label (non-saturating generator objective)
            gen_err = jnp.mean(optax.sigmoid_binary_cross_entropy(d_out, jnp.ones_like(d_out)))
        total = sup + reg_weight * gen_err
        return total, (new_stats, logits_l, lab_l, logits_u, img_l, img_u, sup, gen_err)

    def discr_loss_fn(discr_params, logits_l, logits_u, img_l, img_u):
        def d_apply(logits, img):
            d_in = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)
            if dis_consider_image:
                d_in = jnp.concatenate([img, d_in], axis=-1)
            return discr.apply(discr_params, d_in)

        out_l = d_apply(logits_l, img_l)
        out_u = d_apply(logits_u, img_u)
        loss = (jnp.mean(optax.sigmoid_binary_cross_entropy(out_l, jnp.ones_like(out_l)))
                + jnp.mean(optax.sigmoid_binary_cross_entropy(out_u, jnp.zeros_like(out_u))))
        return loss

    @partial(jax.jit, donate_argnums=(0,))
    def _step(state: TrainState, batch_l, batch_u, key, store_arrays):
        batch_l = _resolve_batch(store_arrays, batch_l)
        batch_u = _resolve_batch(store_arrays, batch_u)
        (_, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.discr_params, batch_l, batch_u, key)
        new_stats, logits_l, lab_l, logits_u, img_l, img_u, sup, gen_err = aux
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt)
        dis_loss = jnp.zeros((), jnp.float32)
        if reg_weight > 0:
            dis_loss, d_grads = jax.value_and_grad(discr_loss_fn)(
                state.discr_params, logits_l, logits_u, img_l, img_u)
            d_grads = jax.tree_util.tree_map(lambda g: g * reg_weight, d_grads)
            d_updates, new_d_opt = discr_optimizer.update(d_grads, state.discr_opt_state,
                                                          state.discr_params)
            new_d_params = optax.apply_updates(state.discr_params, d_updates)
            state = state.replace(discr_params=new_d_params, discr_opt_state=new_d_opt)
        pred = jnp.argmax(logits_l, axis=-1)
        inter, union = dice_stats_from_labels(pred, lab_l, num_classes, batch_l["valid"])
        return state, {"sup_loss": sup, "gen_loss": gen_err, "dis_loss": dis_loss,
                       "inter": inter, "union": union}

    arrays = store.arrays if store is not None else None

    def step(state, batch_l, batch_u, key):
        return _step(state, batch_l, batch_u, key, arrays)

    return step
