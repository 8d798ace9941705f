"""InfoNCE / self-paced InfoNCE hooks — the paper's pretraining losses.

Parity with reference semi_seg/hooks/infonce.py:
- `INFONCEHook` (:56-110): taps a UNet stage; encoder stages use a pooled
  `ProjectionHead`, decoder stages a `DenseProjectionHead` with 5 random
  spatial points SimCLR-paired (:201-241); labels from `contrast_on`
  meta-labels.
- `SelfPacedINFONCEHook` (:113-141): adds the PScheduler gamma ramp and the
  self-paced criterion; meters sp_weight (downgrade ratio) + age_param.

Flow inside the jitted step (reference :171-195):
  features of the two views <- ctx["acts"][stage][-2n:]
  view-1 features re-flipped with the step's flip params (geometry align)
  projector -> z (L2-normalized)
  loss = (SelfPaced)SupCon(z1, z2, target=meta_labels)
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import TrainerHook, label_from_contrast_on
from ..data.augment import apply_flip
from ..losses.supcon import self_paced_supcon_loss, supcon_loss
from ..models.heads import DenseProjectionHead, ProjectionHead
from ..models.unet import ENCODER_NAMES
from ..ops import FUSED_MIN_ROWS, fused_self_paced_supcon, fused_supcon
from ..schedulers.gamma import PScheduler

# Measured crossover: see ops/__init__.py::FUSED_MIN_ROWS (single source of
# truth for every fused-dispatch site; round-3 table in RESULTS.md).
_FUSED_MIN_ROWS = FUSED_MIN_ROWS


def _use_fused(flag, n_views: int) -> bool:
    """auto -> Pallas kernel on TPU from 2N >= 128 (measured faster at every
    size from there up), naive jnp elsewhere."""
    if flag == "auto":
        return jax.default_backend() == "tpu" and n_views >= _FUSED_MIN_ROWS
    return bool(flag)


class INFONCEHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 contrast_on: str = "partition", spatial_size: Optional[Tuple[int, int]] = None,
                 temperature: float = 0.07, num_sampled_points: int = 5,
                 use_fused="auto", global_contrast: str = "replicated"):
        super().__init__(name, weight)
        # global_contrast — how the contrastive matrix spans a Trainer.mesh:
        #   "replicated":  GSPMD all-gathers z and every chip computes the
        #                  full [2N, 2N] loss (exact; fine at small 2N).
        #   "row_sharded": each chip computes only its [2n_local, 2N] row
        #                  strip via parallel.contrastive (composed with the
        #                  fused Pallas kernel on TPU) — per-chip loss
        #                  compute/memory drop by the mesh size. The math is
        #                  the same function (tests/test_parallel_fused.py);
        #                  off-mesh it silently degrades to the plain path.
        assert global_contrast in ("replicated", "row_sharded"), global_contrast
        self.global_contrast = global_contrast
        self.use_fused = use_fused
        self.feature_name = feature_name
        self.contrast_on = contrast_on
        self.temperature = float(temperature)
        self.is_encoder = feature_name in ENCODER_NAMES
        if spatial_size is None:
            spatial_size = (1, 1) if self.is_encoder else (10, 10)
        self.spatial_size = tuple(spatial_size)
        self.num_sampled_points = int(num_sampled_points)
        if self.is_encoder:
            self._projector = ProjectionHead(output_dim=256, hidden_dim=256, head_type="mlp",
                                             normalize=True, spatial_size=self.spatial_size)
        else:
            self._projector = DenseProjectionHead(output_dim=256, hidden_dim=256, head_type="mlp",
                                                  normalize=True, spatial_size=self.spatial_size)

    def build(self, key: jax.Array, model, sample_acts: Dict) -> Dict:
        feats = sample_acts[self.feature_name]
        return self._projector.init(key, feats)

    # ---- traced ---------------------------------------------------------------
    def _projected_views(self, params, ctx):
        n = ctx["n_unl"]
        feats = ctx["acts"][self.feature_name][-2 * n:]
        v1, v2 = feats[:n], feats[n:]
        # align view-1 features into the flipped frame (reference :177-179)
        v1_tf = apply_flip(v1, ctx["flip"])
        z = self._projector.apply(params, jnp.concatenate([v1_tf, v2], axis=0))
        return z[:n], z[n:]

    def _row_sharded(self, z1, z2, target, valid, mesh, *, gamma, mode,
                     correct_grad: bool = False):
        """Dispatch the criterion to the row-sharded global-batch form
        (parallel.contrastive) under the Trainer's mesh: shard_map
        repartitions the (logically global) z onto the `data` axis, each
        shard computes its row strip, and replicated scalars come back."""
        from jax.sharding import PartitionSpec as P
        from ..parallel.contrastive import sharded_self_paced_supcon

        use_fused = None if self.use_fused == "auto" else bool(self.use_fused)

        def shard_fn(a, b, t, v, g):
            return sharded_self_paced_supcon(
                a, b, t, v, gamma=g, axis_name="data",
                temperature=self.temperature, weight_update=mode,
                correct_grad=correct_grad, use_fused=use_fused)

        fn = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P("data"),) * 4 + (P(),),
                           out_specs=(P(), P()), check_vma=False)
        return fn(z1, z2, target, valid.astype(jnp.float32),
                  jnp.asarray(gamma, jnp.float32))

    def _shard_criterion(self, z1, z2, target, valid, scalars, axis_name):
        """Per-shard form of `_criterion` for callers ALREADY INSIDE a
        shard_map region (the mesh gradcache step, training/gradcache.py):
        same dispatch and metrics, per-shard inputs, `axis_name` bound.
        Owned here so criterion changes cannot silently diverge between the
        monolithic and gradcache mesh paths."""
        from ..parallel.contrastive import (global_self_paced_supcon,
                                            sharded_self_paced_supcon)
        fn = (sharded_self_paced_supcon if self.global_contrast == "row_sharded"
              else global_self_paced_supcon)
        # gamma=1e9 hard-mode weights are exactly 1: plain SupCon
        loss, _ = fn(z1, z2, target, valid.astype(jnp.float32), gamma=1e9,
                     axis_name=axis_name, temperature=self.temperature,
                     weight_update="hard", correct_grad=False,
                     use_fused=(None if self.use_fused == "auto"
                                else bool(self.use_fused)))
        return loss, {"loss": loss}

    def _criterion(self, z1, z2, target, valid, scalars, ctx):
        mesh = ctx.get("mesh")
        if self.global_contrast == "row_sharded" and mesh is not None:
            # gamma=1e9 hard-mode weights are exactly 1: plain SupCon
            loss, _ = self._row_sharded(z1, z2, target, valid, mesh,
                                        gamma=1e9, mode="hard")
            return loss, {"loss": loss}
        if _use_fused(self.use_fused, 2 * z1.shape[0]):
            loss = fused_supcon(z1, z2, target=target, valid=valid,
                                temperature=self.temperature)
        else:
            loss, _ = supcon_loss(z1, z2, target=target, valid=valid,
                                  temperature=self.temperature)
        return loss, {"loss": loss}

    def loss_fn(self, params, ctx, scalars):
        z1, z2 = self._projected_views(params, ctx)
        if self.is_encoder:
            target = label_from_contrast_on(ctx, self.contrast_on)
            loss, metrics = self._criterion(z1, z2, target, ctx["valid"], scalars, ctx)
        else:
            loss, metrics = self._dense_loss(z1, z2, ctx, scalars)
        return loss * self.weight, metrics

    def _dense_points(self, z1, z2, ctx):
        """Decoder stages: pick `num_sampled_points` random locations per image
        from the SAME key for both views (reference :212-218), SimCLR-pair them."""
        n, h, w, d = z1.shape
        p = self.num_sampled_points
        ky, kx = jax.random.split(jax.random.fold_in(ctx["key"], 17))
        ys = jax.random.randint(ky, (n, p), 0, h)
        xs = jax.random.randint(kx, (n, p), 0, w)

        def gather(zmap, y, x):
            return zmap[y, x]  # [p, d]

        s1 = jax.vmap(gather)(z1, ys, xs).reshape(n * p, d)
        s2 = jax.vmap(gather)(z2, ys, xs).reshape(n * p, d)
        valid = jnp.repeat(ctx["valid"], p)
        target = jnp.where(valid > 0, jnp.arange(n * p, dtype=jnp.int32), -1)
        return s1, s2, target, valid

    def _dense_loss(self, z1, z2, ctx, scalars):
        s1, s2, target, valid = self._dense_points(z1, z2, ctx)
        return self._criterion(s1, s2, target, valid, scalars, ctx)

    # ---- batch-0 diagnostics (reference :185-193: sim/mask figure dumps) ----
    def _views_and_labels(self, params, ctx):
        z1, z2 = self._projected_views(params, ctx)
        if self.is_encoder:
            return z1, z2, label_from_contrast_on(ctx, self.contrast_on), ctx["valid"]
        return self._dense_points(z1, z2, ctx)

    def matrices_fn(self, params, ctx, scalars) -> Dict[str, jnp.ndarray]:
        """Traced: the [2N,2N] diagnostics the reference plots to TensorBoard
        on batch 0 of each epoch (semi_seg/hooks/infonce.py:185-193). Runs in
        a separate once-per-epoch probe program (steps.build_matrix_probe) so
        the hot step never materializes them."""
        z1, z2, target, valid = self._views_and_labels(params, ctx)
        _, aux = supcon_loss(z1, z2, target=target, valid=valid,
                             temperature=self.temperature, return_matrices=True)
        return {"sim_logits": aux.sim_logits,
                "sim_exp": jnp.exp(aux.sim_logits),
                "pos_mask": aux.pos_mask}


class SelfPacedINFONCEHook(INFONCEHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 contrast_on: str = "partition", spatial_size=None, temperature: float = 0.07,
                 mode: str = "soft", p: float = 0.5, begin_value: float = 1e6,
                 end_value: float = 1e6, correct_grad: bool = False, max_epoch: int = 80,
                 use_fused="auto", global_contrast: str = "replicated"):
        super().__init__(name=name, feature_name=feature_name, weight=weight,
                         contrast_on=contrast_on, spatial_size=spatial_size,
                         temperature=temperature, use_fused=use_fused,
                         global_contrast=global_contrast)
        assert mode in ("soft", "hard"), mode
        self.mode = mode
        self.correct_grad = bool(correct_grad)
        self.scheduler = PScheduler(max_epoch=max_epoch, begin_value=begin_value,
                                    end_value=end_value, p=p)

    def epoch_scalars(self, epoch: int) -> Dict[str, float]:
        # reference :133-136: gamma read then scheduler stepped each epoch
        return {"gamma": float(self.scheduler.get_value(epoch))}

    def on_epoch_end(self) -> None:
        self.scheduler.step()

    def _shard_criterion(self, z1, z2, target, valid, scalars, axis_name):
        from ..parallel.contrastive import (global_self_paced_supcon,
                                            sharded_self_paced_supcon)
        gamma = scalars["gamma"]  # KeyError on a missing entry — _criterion parity
        fn = (sharded_self_paced_supcon if self.global_contrast == "row_sharded"
              else global_self_paced_supcon)
        loss, ratio = fn(z1, z2, target, valid.astype(jnp.float32), gamma=gamma,
                         axis_name=axis_name, temperature=self.temperature,
                         weight_update=self.mode, correct_grad=self.correct_grad,
                         use_fused=(None if self.use_fused == "auto"
                                    else bool(self.use_fused)))
        return loss, {"loss": loss, "sp_weight": ratio, "age_param": gamma}

    def _criterion(self, z1, z2, target, valid, scalars, ctx):
        gamma = scalars["gamma"]
        mesh = ctx.get("mesh")
        if self.global_contrast == "row_sharded" and mesh is not None:
            loss, ratio = self._row_sharded(z1, z2, target, valid, mesh,
                                            gamma=gamma, mode=self.mode,
                                            correct_grad=self.correct_grad)
            return loss, {"loss": loss, "sp_weight": ratio, "age_param": gamma}
        if _use_fused(self.use_fused, 2 * z1.shape[0]):
            loss, ratio = fused_self_paced_supcon(
                z1, z2, target=target, valid=valid, gamma=gamma,
                temperature=self.temperature, weight_update=self.mode,
                correct_grad=self.correct_grad)
        else:
            loss, aux = self_paced_supcon_loss(
                z1, z2, target=target, valid=valid, gamma=gamma,
                temperature=self.temperature, weight_update=self.mode,
                correct_grad=self.correct_grad)
            ratio = aux.downgrade_ratio
        return loss, {"loss": loss, "sp_weight": ratio, "age_param": gamma}

    def matrices_fn(self, params, ctx, scalars) -> Dict[str, jnp.ndarray]:
        """Adds the self-paced weight mask (reference :263-266 plots sp_mask)."""
        z1, z2, target, valid = self._views_and_labels(params, ctx)
        _, aux = self_paced_supcon_loss(
            z1, z2, target=target, valid=valid, gamma=scalars["gamma"],
            temperature=self.temperature, weight_update=self.mode,
            correct_grad=self.correct_grad, return_matrices=True)
        return {"sim_logits": aux.sim_logits,
                "sim_exp": jnp.exp(aux.sim_logits),
                "pos_mask": aux.pos_mask,
                "sp_mask": aux.sp_mask}

    def state_dict(self):
        return {"scheduler": self.scheduler.state_dict()}

    def load_state_dict(self, state):
        self.scheduler.load_state_dict(state["scheduler"])
