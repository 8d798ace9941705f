"""Uncertainty-aware mean teacher (UC-MT).

Parity with reference UCMeanTeacherEpocher (semi_seg/epochers/comparable.py:
UCMeanTeacherEpocher): per-pixel MSE between student and teacher predictions
gated by the teacher's predictive uncertainty — the entropy of the mean of 8
noise-perturbed teacher forward passes, normalized by log(C), thresholded by
a ramped value. Pixels above the threshold are dropped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TrainerHook
from ..data.augment import apply_flip
from ..schedulers.gamma import RampScheduler


class UCMeanTeacherTrainerHook(TrainerHook):
    needs_teacher = True

    def __init__(self, name: str = "ucmt", weight: float = 1.0, alpha: float = 0.999,
                 num_noise_samples: int = 8, noise_std: float = 0.05,
                 threshold_begin: float = 0.75, threshold_end: float = 0.75,
                 max_epoch: int = 100):
        super().__init__(name, weight)
        self.alpha = float(alpha)
        self.num_noise_samples = int(num_noise_samples)
        self.noise_std = float(noise_std)
        self.threshold = RampScheduler(begin_epoch=0, max_epoch=max_epoch,
                                       min_value=threshold_begin, max_value=threshold_end)

    def epoch_scalars(self, epoch: int):
        return {"threshold": float(self.threshold.get_value(epoch))}

    def on_epoch_end(self):
        self.threshold.step()

    def loss_fn(self, params, ctx, scalars):
        student = jax.nn.softmax(ctx["unlabeled_tf_logits"], axis=-1)
        teacher = jax.lax.stop_gradient(jax.nn.softmax(ctx["teacher_logits_tf"], axis=-1))
        per_pixel = jnp.mean((student - teacher) ** 2, axis=-1)  # [B, h, w]

        # teacher uncertainty from noise-perturbed passes (static unrolled loop)
        img = ctx["unlabeled_image"]
        apply_teacher = ctx["apply_teacher"]
        keys = jax.random.split(jax.random.fold_in(ctx["key"], 41), self.num_noise_samples)
        preds = []
        for k in keys:
            noisy = img + self.noise_std * jax.random.normal(k, img.shape)
            logits = apply_teacher(noisy)
            preds.append(jax.nn.softmax(apply_flip(logits, ctx["flip"]), axis=-1))
        avg = jax.lax.stop_gradient(jnp.mean(jnp.stack(preds), axis=0))
        c = avg.shape[-1]
        entropy = -jnp.sum(avg * jnp.log(avg + 1e-16), axis=-1) / jnp.log(float(c))
        gate = (entropy <= scalars["threshold"]).astype(jnp.float32)

        v = ctx["valid"][:, None, None]
        loss = jnp.sum(per_pixel * gate * v) / jnp.maximum(
            jnp.sum(v) * per_pixel.shape[1] * per_pixel.shape[2], 1.0)
        uc_ratio = jnp.sum(gate * v) / jnp.maximum(
            jnp.sum(v) * gate.shape[1] * gate.shape[2], 1.0)
        return loss * self.weight, {"loss": loss, "uc_ratio": uc_ratio,
                                    "uc_weight": scalars["threshold"]}

    def state_dict(self):
        return {"threshold": self.threshold.state_dict()}

    def load_state_dict(self, state):
        self.threshold.load_state_dict(state["threshold"])
