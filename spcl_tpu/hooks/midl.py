"""MIDL-paper regularizer: patchified dense IIC directly on the prediction maps.

Parity with reference MIDLPaperEpocher via MIDLTrainer (semi_seg/trainers/
trainer.py:39-61): IIDSegmentationSmallPathLoss between softmax(student
prediction on transformed input) and softmax(transformed student prediction),
combined with the plain consistency hook by the factory.
"""
from __future__ import annotations

import jax

from .base import TrainerHook
from ..losses.iic import iid_segmentation_small_patch_loss


class MIDLPaperTrainerHook(TrainerHook):
    def __init__(self, name: str = "midl", weight: float = 1.0,
                 padding: int = 7, patch_size: int = 32):
        super().__init__(name, weight)
        self.padding = int(padding)
        self.patch_size = int(patch_size)

    def loss_fn(self, params, ctx, scalars):
        p1 = jax.nn.softmax(ctx["unlabeled_tf_logits"], axis=-1)
        p2 = jax.nn.softmax(ctx["unlabeled_logits_tf"], axis=-1)
        loss = iid_segmentation_small_patch_loss(p1, p2, padding=self.padding,
                                                 patch_size=self.patch_size)
        return loss * self.weight, {"mi": loss}
