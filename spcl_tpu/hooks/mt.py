"""Mean-teacher hook.

Parity with reference semi_seg/hooks/mt.py:13-55: a detached EMA copy of the
student predicts the un-transformed unlabeled batch; the prediction is
carried into the flipped frame with the step's flip params; MSE against the
student's prediction on the transformed batch; EMA update every step with
the deepclustering2 ramped alpha min(1 - 1/(step+1), 0.999).

Deliberate deviation (documented): the reference MSEs the teacher's raw
LOGITS against student softmax probabilities (mt.py:49-52 never softmaxes
the teacher output — an apparent bug); here both sides are softmaxed, the
standard mean-teacher objective.

The teacher parameters live in TrainState.teacher_params; the step computes
ctx["teacher_logits_tf"] and performs the EMA update (models/ema.py) after
the optimizer step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TrainerHook


class MeanTeacherTrainerHook(TrainerHook):
    needs_teacher = True

    def __init__(self, name: str = "mt", weight: float = 1.0, alpha: float = 0.999):
        super().__init__(name, weight)
        self.alpha = float(alpha)

    def loss_fn(self, params, ctx, scalars):
        student = jax.nn.softmax(ctx["unlabeled_tf_logits"], axis=-1)
        teacher = jax.lax.stop_gradient(jax.nn.softmax(ctx["teacher_logits_tf"], axis=-1))
        mask = ctx["valid"][:, None, None, None]
        denom = jnp.maximum(jnp.sum(mask) * student.shape[1] * student.shape[2] * student.shape[3], 1.0)
        loss = jnp.sum(((student - teacher) ** 2) * mask) / denom
        return loss * self.weight, {"loss": loss}
