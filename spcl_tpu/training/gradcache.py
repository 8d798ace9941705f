"""Gradient-cache chunked contrastive pretraining — decouples encoder
activation memory from the contrastive batch size.

The reference caps the contrastive batch at 2N=60 (config/pretrain.yaml:14-17)
because its step is monolithic twice over: the loss materializes >=5 [2N,2N]
tensors (contrastyou/losses/contrast_loss3.py:156-196) AND the encoder
forward/backward stores activations for all 2N views at once. The fused
Pallas criterion (ops/supcon_pallas.py) and the row-sharded form
(parallel/contrastive.py) removed the loss wall; this module removes the
remaining one — the O(2N) stored encoder activations (~7 MB/slice bf16 at
224^2 UNet-256, i.e. HBM-full near 2N~4k on a 16 GB chip) — with the
two-pass gradient-cache schedule (Gao et al. 2021, "Scaling Deep Contrastive
Learning Batch Size under Memory Limited Setup", arXiv 2101.06983):

  pass A (no grads):  z_c = project(encode(augment(x_c))) per chunk under
                      lax.scan -> embeddings z [2N, D]; activations freed
                      between chunks
  loss pass:          (loss, dL/dz) on the tiny [2N, D] matrix — the fused
                      blockwise kernel above ops.FUSED_MIN_ROWS
  pass B (grads):     re-encode each chunk under lax.scan and pull the cached
                      cotangent dL/dz_c back through a per-chunk VJP,
                      accumulating parameter grads across chunks

Peak memory = ONE chunk's activations + [2N, D] embeddings + params/opt, at
~4/3 the FLOPs of direct backprop (one extra forward). Combined with the
fused criterion this makes 2N in the tens of thousands trainable on a single
chip (RESULTS.md round-4 gradcache section for measured sizes).

Under a Trainer.mesh the three scaling axes COMPOSE (SURVEY §5.7 complete):
each chip scans chunks of its own batch shard (activations O(chunk/chip)),
the criterion runs row-sharded over the mesh (loss compute/memory
O(2N^2/n_chips), fused strips above the measured threshold), the loss
cotangents flow back through the all_gather transpose into each chip's
chunk VJPs, and one grad pmean + stats pmean close the step (pmean, not
psum — see the transpose note in _cached_grads).

Exactness: the cached two-pass gradient is mathematically identical to direct
backprop through the same chunked computation — pinned by
tests/test_gradcache.py against `step.direct_value_and_grad` (ordinary
jax.grad through pass A + the loss), single-chip and on the 8-device mesh.

BatchNorm semantics: each chunk normalizes with ITS OWN batch statistics and
running stats chain chunk-to-chunk (the standard gradient-accumulation
convention — the torch equivalent of processing chunks as separate
mini-batches; under a mesh the chip-local chains are averaged). The
monolithic step (steps.build_pretrain_step) instead normalizes over the full
2N batch, so the two steps are equal-in-distribution rather than bit-equal;
everything downstream of the embeddings is the same function.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .state import TrainState
from .steps import (_apply_model, _as_float_image, _optimizer_update,
                    _resolve_batch, wrap_pretrain_style_step)
from ..data.augment import AugmentPolicy, apply_flip, augment_twice, flip_params
from ..data.device_store import DeviceStore
from ..hooks.base import TrainerHook, label_from_contrast_on


def _check_hooks(hooks):
    for h in hooks:
        # the two-pass split needs the INFONCE interface (embed separately
        # from the loss), not just "taps an encoder stage"
        if not (hasattr(h, "_projected_views") and hasattr(h, "_criterion")):
            raise NotImplementedError(
                f"grad_cache supports INFONCE-family contrastive hooks "
                f"(separate embed/criterion phases); got {type(h).__name__} "
                f"({h.name}) — run it under the monolithic pretrain step")
        if not getattr(h, "is_encoder", False):
            raise NotImplementedError(
                f"grad_cache supports encoder contrastive hooks; {h.name} taps "
                f"decoder stage {h.feature_name} (dense point sampling is "
                "batch-local and does not benefit from a global batch)")


def build_gradcache_pretrain_step(model, hooks: Sequence[TrainerHook], optimizer, *,
                                  policy: AugmentPolicy, total_freedom: bool,
                                  until: Optional[str], num_chunks: int,
                                  grad_mask=None, flip_threshold: float = 0.8,
                                  store: Optional[DeviceStore] = None,
                                  mesh=None):
    """Drop-in replacement for steps.build_pretrain_step with chunked
    two-pass gradients (`Trainer.grad_cache: num_chunks` in config).

    Same call surface: step(state, batch, key, hook_scalars) and
    step.epoch_step(state, epoch_idx, hook_scalars) -> (state, metrics with
    reg_loss + per-hook metrics). The (per-chip) batch is split into
    `num_chunks` equal chunks (its size must divide evenly); augmentation/
    flip keys are folded per chunk (and per chip under a mesh) so both
    passes replay identical geometry.
    """
    hooks = tuple(hooks)
    num_chunks = int(num_chunks)
    if num_chunks < 1:
        raise ValueError(f"num_chunks must be >= 1, got {num_chunks}")
    _check_hooks(hooks)
    axis_name = "data" if mesh is not None else None
    if mesh is not None:
        for h in hooks:
            if not hasattr(h, "_shard_criterion"):
                raise NotImplementedError(
                    f"mesh grad_cache needs the hook's per-shard criterion "
                    f"(_shard_criterion); {type(h).__name__} lacks one")

    def _chunked(tree):
        def split(a):
            b = a.shape[0]
            if b % num_chunks:
                raise ValueError(
                    f"grad_cache: {'per-chip ' if axis_name else ''}batch size "
                    f"{b} not divisible by num_chunks={num_chunks}")
            return a.reshape((num_chunks, b // num_chunks) + a.shape[1:])
        return jax.tree_util.tree_map(split, tree)

    def _fold_axis(key):
        if axis_name is None:
            return key
        # distinct augmentation streams per chip (each chip augments its own
        # batch shard)
        return jax.random.fold_in(key, jax.lax.axis_index(axis_name))

    def _encode_chunk(params, stats, batch_c, c, k_aug, k_flip, update_stats):
        """One chunk: augment two views -> flip view 2 -> partial forward ->
        per-hook projected (z1_c, z2_c). Deterministic in (keys, c): both
        passes replay the same geometry."""
        (v1, _), (v2, _) = augment_twice(
            jax.random.fold_in(k_aug, c), _as_float_image(batch_c["image"]),
            None, policy, total_freedom=total_freedom, sizes=batch_c.get("size"))
        n = v1.shape[0]
        fp = flip_params(jax.random.fold_in(k_flip, c), n, threshold=flip_threshold)
        v2 = apply_flip(v2, fp)
        x = jnp.concatenate([v1, v2], axis=0)
        acts, new_stats = _apply_model(model, params["model"], stats, x,
                                       train=True, until=until,
                                       update_stats=update_stats)
        ctx = {"acts": acts, "n_unl": n, "flip": fp}
        zs = {h.name: h._projected_views(params["hooks"].get(h.name), ctx)
              for h in hooks}
        return zs, new_stats

    def _embeddings(params, stats, batch, k_aug, k_flip):
        """Pass A: scan the chunks, carrying BN running stats; stack and
        flatten per-hook embeddings back to the full (local) [N, D]."""
        batch_c = _chunked(batch)

        def body(carry_stats, xs):
            c, bc = xs
            zs, new_stats = _encode_chunk(params, carry_stats, bc, c,
                                          k_aug, k_flip, True)
            return new_stats, zs

        final_stats, stacked = jax.lax.scan(
            body, stats, (jnp.arange(num_chunks), batch_c))
        zs = {name: (z1.reshape(-1, z1.shape[-1]), z2.reshape(-1, z2.shape[-1]))
              for name, (z1, z2) in stacked.items()}
        return zs, final_stats

    def _meta_ctx(batch):
        return {"partition": batch["partition"], "patient": batch["patient"],
                "cycle": batch["cycle"], "scan_idx": batch["scan_idx"],
                "valid": batch["valid"]}

    def _target(meta_ctx, h):
        if axis_name is not None and h.contrast_on in ("self", None):
            # SimCLR ids must be GLOBALLY unique: offset by the chip's row
            # block (label_from_contrast_on's arange restarts per shard)
            n_local = meta_ctx["partition"].shape[0]
            return (jax.lax.axis_index(axis_name) * n_local
                    + jnp.arange(n_local, dtype=jnp.int32))
        return label_from_contrast_on(meta_ctx, h.contrast_on)

    def _loss_on_z(zs, meta_ctx, hook_scalars):
        """Everything downstream of the embeddings — identical math to the
        monolithic step's hook loss (hooks/infonce.py loss_fn)."""
        total = jnp.zeros((), jnp.float32)
        metrics = {}
        for h in hooks:
            z1, z2 = zs[h.name]
            target = _target(meta_ctx, h)
            scalars = hook_scalars.get(h.name, {})
            if axis_name is None:
                loss, m = h._criterion(z1, z2, target, meta_ctx["valid"],
                                       scalars, meta_ctx)
            else:
                # per-shard rows inside shard_map: the hook's own per-shard
                # dispatch (hooks/infonce.py::_shard_criterion — the
                # monolithic path's _criterion wraps its own shard_map and
                # cannot be nested here)
                loss, m = h._shard_criterion(z1, z2, target,
                                             meta_ctx["valid"], scalars,
                                             axis_name)
            total = total + h.weight * loss
            metrics[h.name] = m
        return total, metrics

    def _forward_loss(params, stats, batch, key, hook_scalars):
        """Differentiable pass A + loss: the exact function whose gradient the
        cached two-pass reproduces (the test oracle; also usable directly —
        but it stores every chunk's activations, defeating the point).
        Under a mesh this runs per shard inside shard_map."""
        k_aug, k_flip, _ = jax.random.split(_fold_axis(key), 3)
        zs, new_stats = _embeddings(params, stats, batch, k_aug, k_flip)
        loss, metrics = _loss_on_z(zs, _meta_ctx(batch), hook_scalars)
        return loss, (new_stats, metrics)

    def _cached_grads(params, stats, batch, key, hook_scalars):
        """Passes A + loss + B: same value/grads as
        jax.value_and_grad(_forward_loss) at one-chunk activation memory.
        Under a mesh: per-chip chunk VJPs, then one grad pmean + stats pmean."""
        k_aug, k_flip, _ = jax.random.split(_fold_axis(key), 3)
        zs, new_stats = _embeddings(params, stats, batch, k_aug, k_flip)
        (loss, metrics), dzs = jax.value_and_grad(
            lambda z: _loss_on_z(z, _meta_ctx(batch), hook_scalars),
            has_aux=True)(zs)

        batch_c = _chunked(batch)
        dzs_c = _chunked(dzs)
        zero = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(g_acc, xs):
            c, bc, dz_c = xs

            def fwd(p):
                z, _ = _encode_chunk(p, stats, bc, c, k_aug, k_flip, False)
                return z

            _, vjp_fn = jax.vjp(fwd, params)
            g = vjp_fn(dz_c)[0]
            return jax.tree_util.tree_map(jnp.add, g_acc, g), None

        grads, _ = jax.lax.scan(body, zero, (jnp.arange(num_chunks), batch_c, dzs_c))
        if axis_name is not None:
            # pmean, not psum: per-shard AD seeds the REPLICATED loss output
            # on every chip and (replication tracking off, check_vma=False)
            # the criterion's psum transposes to another psum, so each chip's
            # dz — hence its param-grad contribution — carries an exact extra
            # factor of axis_size; the mean folds it back out. Pinned
            # absolutely by tests/test_gradcache.py::
            # test_mesh_gradcache_absolute_vs_single_device (deterministic
            # geometry: mesh grads == single-device grads) — if a future JAX
            # changes the unchecked-transpose semantics, that test fails
            # loudly and this becomes a psum.
            grads = jax.lax.pmean(grads, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        return loss, grads, new_stats, metrics

    def _step_body(state: TrainState, batch, key, hook_scalars):
        loss, grads, new_stats, hook_metrics = _cached_grads(
            state.params, state.batch_stats, batch, key, hook_scalars)
        new_params, new_opt = _optimizer_update(optimizer, grads, state, grad_mask)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"reg_loss": loss, "hooks": hook_metrics}

    if mesh is None:
        step = wrap_pretrain_style_step(_step_body, store)
        arrays = step.store_arrays
    else:
        step, arrays = _wrap_mesh_step(_step_body, store, mesh)

    def direct_value_and_grad(state, batch, key, hook_scalars):
        """Test oracle: ordinary autodiff through the identical chunked math
        (full activation storage). Returns ((loss, (new_stats, metrics)), grads).

        Under a mesh the value_and_grad runs INSIDE the shard_map body with an
        explicit grad pmean — differentiating THROUGH a check_vma=False
        shard_map mis-transposes the criterion's psums, so the oracle uses the
        same per-shard-AD + psum placement the cached path uses; what differs
        (and is under test) is one-pass autodiff vs the two-pass cache."""
        batch = _resolve_batch(arrays, batch)
        if mesh is None:
            return jax.value_and_grad(_forward_loss, has_aux=True)(
                state.params, state.batch_stats, batch, key, hook_scalars)
        from jax.sharding import PartitionSpec as P

        def body(params, stats, batch, key, scalars):
            (loss, (new_stats, metrics)), grads = jax.value_and_grad(
                _forward_loss, has_aux=True)(params, stats, batch, key, scalars)
            # grad pmean for the same reason as _cached_grads (the per-shard
            # AD carries an exact axis_size factor under check_vma=False);
            # stats pmean because each chip chains its own BN stats and the
            # P() out_spec promises a replicated value
            return ((loss, (jax.lax.pmean(new_stats, axis_name), metrics)),
                    jax.lax.pmean(grads, axis_name))

        sm = jax.shard_map(body, mesh=mesh,
                           in_specs=(P(), P(), P(axis_name), P(), P()),
                           out_specs=((P(), (P(), P())), P()), check_vma=False)
        return sm(state.params, state.batch_stats, batch, key, hook_scalars)

    def cached_value_and_grad(state, batch, key, hook_scalars):
        """The two-pass gradient itself, same return shape as
        direct_value_and_grad — the equivalence under test."""
        batch = _resolve_batch(arrays, batch)

        def f(params, stats, batch, key, scalars):
            loss, grads, new_stats, metrics = _cached_grads(
                params, stats, batch, key, scalars)
            return loss, grads, new_stats, metrics

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            f = jax.shard_map(f, mesh=mesh,
                              in_specs=(P(), P(), P(axis_name), P(), P()),
                              out_specs=(P(), P(), P(), P()), check_vma=False)
        loss, grads, new_stats, metrics = f(
            state.params, state.batch_stats, batch, key, hook_scalars)
        return (loss, (new_stats, metrics)), grads

    step.direct_value_and_grad = direct_value_and_grad
    step.cached_value_and_grad = cached_value_and_grad
    step.num_chunks = num_chunks
    return step


def _wrap_mesh_step(step_body, store: Optional[DeviceStore], mesh):
    """shard_map + donated-jit plumbing for the mesh gradcache step: the
    TrainState travels replicated, the batch / epoch-index matrix shards on
    the `data` axis, and the replicated store arrays pass through (the body
    gathers each chip's rows locally). Mirrors steps.wrap_pretrain_style_step's
    call surface."""
    from jax.sharding import PartitionSpec as P

    def body_batch(state, batch, key, hook_scalars, store_arrays):
        return step_body(state, _resolve_batch(store_arrays, batch),
                         key, hook_scalars)

    def body_epoch(state, epoch_idx, hook_scalars, store_arrays):
        from .steps import _epoch_row
        idx, key = _epoch_row(state, epoch_idx)
        return step_body(state, _resolve_batch(store_arrays, idx),
                         key, hook_scalars)

    sm_batch = jax.shard_map(body_batch, mesh=mesh,
                             in_specs=(P(), P("data"), P(), P(), P()),
                             out_specs=(P(), P()), check_vma=False)
    sm_epoch = jax.shard_map(body_epoch, mesh=mesh,
                             in_specs=(P(), P(None, "data"), P(), P()),
                             out_specs=(P(), P()), check_vma=False)
    jit_batch = partial(jax.jit, donate_argnums=(0,))(sm_batch)
    jit_epoch = partial(jax.jit, donate_argnums=(0,))(sm_epoch)
    arrays = store.arrays if store is not None else None

    def step(state, batch, key, hook_scalars):
        return jit_batch(state, batch, key, hook_scalars, arrays)

    def epoch_step(state, epoch_idx, hook_scalars):
        return jit_epoch(state, epoch_idx, hook_scalars, arrays)

    def raw_step(state, batch, key, hook_scalars, store_arrays=None):
        # unjitted shard_map body for lax.scan'ed multi-step drivers —
        # wrap_pretrain_style_step call-surface parity
        return sm_batch(state, batch, key, hook_scalars, store_arrays)

    step.raw = raw_step
    step.epoch_step = epoch_step
    step.store_arrays = arrays
    return step, arrays
