"""MixUp hook.

Parity with reference semi_seg/hooks/mixup.py:19-94: Beta(1,1) mixup of the
two labeled views + their one-hot targets, KL on the mixed prediction. The
model re-application uses ctx["apply_student"] (the step closes the current
student params over it); `enable_bn=False` corresponds to running that
forward without persisting batch statistics, which the step builder already
guarantees for auxiliary forwards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import TrainerHook
from ..losses.kl import kl_div


class MixUpHook(TrainerHook):
    def __init__(self, name: str = "mix_reg", weight: float = 1.0, alpha: float = 1.0,
                 enable_bn: bool = True):
        super().__init__(name, weight)
        self.alpha = float(alpha)
        self.enable_bn = bool(enable_bn)

    def loss_fn(self, params, ctx, scalars):
        x = jnp.concatenate([ctx["labeled_image"], ctx["labeled_image_tf"]], axis=0)
        y = jnp.concatenate([ctx["labeled_onehot"], ctx["labeled_onehot_tf"]], axis=0)
        k_lam, k_perm = jax.random.split(jax.random.fold_in(ctx["key"], 29))
        lam = jax.random.beta(k_lam, self.alpha, self.alpha)
        perm = jax.random.permutation(k_perm, x.shape[0])
        mixed_x = lam * x + (1 - lam) * x[perm]
        mixed_y = lam * y + (1 - lam) * y[perm]
        logits = ctx["apply_student"](mixed_x)
        loss = kl_div(jax.nn.softmax(logits, axis=-1), mixed_y)
        return loss * self.weight, {"loss": loss}
