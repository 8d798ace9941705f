"""MINE mutual-information estimator hook.

Parity with reference semi_seg/mi_estimator/mineestimator.py:9-50 + the
legacy MineTrainer (semi_seg/trainers/trainer.py:98-110): a statistics
network T over channel-concatenated feature maps of the two views estimates
MI via the Deep-InfoMax JSD bound:
    loss = E_marginal[softplus(T(f1, shuffle(f2)))] + E_joint[softplus(-T(f1, f2))]
        (= Em - Ej with Ej = -softplus(T) per the reference's sign convention)
minimizing which maximizes the MI bound between the views' features.

Deviation (documented): the statistics net uses GroupNorm instead of the
reference's BatchNorm so hook modules stay stateless pytrees.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import TrainerHook
from ..data.augment import apply_flip


class _MineStatNet(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([f1, f2], axis=-1)
        x = nn.Conv(self.hidden, (3, 3), padding=1, name="conv0")(x)
        x = nn.GroupNorm(num_groups=min(32, self.hidden), name="gn0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.hidden // 2, (3, 3), padding=1, name="conv1")(x)
        x = nn.GroupNorm(num_groups=min(32, self.hidden // 2), name="gn1")(x)
        x = nn.relu(x)
        x = jnp.max(x, axis=(1, 2))  # adaptive max pool to 1x1
        return nn.Dense(1, name="fc")(x)[:, 0]


class MineTrainHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0):
        super().__init__(name, weight)
        self.feature_name = feature_name
        self._net = None  # built lazily with the stage's channel count

    def build(self, key: jax.Array, model, sample_acts: Dict) -> Dict:
        ch = sample_acts[self.feature_name].shape[-1]
        self._net = _MineStatNet(hidden=ch)
        f = sample_acts[self.feature_name]
        return self._net.init(key, f, f)

    def loss_fn(self, params, ctx, scalars):
        n = ctx["n_unl"]
        feats = ctx["acts"][self.feature_name][-2 * n:]
        f1 = apply_flip(feats[:n], ctx["flip"])  # align geometry like infonce
        f2 = feats[n:]
        f2_prime = jnp.roll(f2, shift=-1, axis=0)  # shuffled marginal pairing
        ej = -jnp.mean(jax.nn.softplus(self._net.apply(params, f1, f2)))
        em = jnp.mean(jax.nn.softplus(self._net.apply(params, f1, f2_prime)))
        loss = em - ej
        return loss * self.weight, {"mi": -loss}
