"""Consistency (Pi-model / UDA) hook.

Parity with reference semi_seg/hooks/consistency.py:8-35:
MSE(softmax(unlabeled_tf_logits), stop_grad(softmax(unlabeled_logits_tf))).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TrainerHook


class ConsistencyTrainerHook(TrainerHook):
    def __init__(self, name: str = "consistency", weight: float = 1.0):
        super().__init__(name, weight)

    def loss_fn(self, params, ctx, scalars):
        student = jax.nn.softmax(ctx["unlabeled_tf_logits"], axis=-1)
        target = jax.lax.stop_gradient(jax.nn.softmax(ctx["unlabeled_logits_tf"], axis=-1))
        mask = ctx["valid"][:, None, None, None]
        denom = jnp.maximum(jnp.sum(mask) * student.shape[1] * student.shape[2] * student.shape[3], 1.0)
        loss = jnp.sum(((student - target) ** 2) * mask) / denom
        return loss * self.weight, {"loss": loss}
