"""Entropy-minimization hook.

Parity with reference semi_seg/hooks/entmin.py:8-34: mean Shannon entropy of
softmax(unlabeled_logits_tf).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TrainerHook


class EntropyMinTrainerHook(TrainerHook):
    def __init__(self, name: str = "entmin", weight: float = 1.0):
        super().__init__(name, weight)

    def loss_fn(self, params, ctx, scalars):
        probs = jax.nn.softmax(ctx["unlabeled_logits_tf"], axis=-1)
        ent = -jnp.sum(probs * jnp.log(probs + 1e-16), axis=-1)  # [B, h, w]
        mask = ctx["valid"][:, None, None]
        loss = jnp.sum(ent * mask) / jnp.maximum(jnp.sum(mask) * ent.shape[1] * ent.shape[2], 1.0)
        return loss * self.weight, {"loss": loss}
