"""Discrete mutual-information (IIC) hook.

Parity with reference semi_seg/hooks/discretemi.py:14-114: a multi-subhead
cluster head at a UNet stage; encoder stages use the pooled `ClusterHead` +
IIDLoss, decoder stages the `DenseClusterHead` + IIDSegmentationLoss with a
displacement padding; loss averaged over subheads; view-1 features are
re-flipped into the transformed frame before projection.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .base import TrainerHook
from ..data.augment import apply_flip
from ..losses.iic import iid_loss, iid_segmentation_loss
from ..models.heads import ClusterHead, DenseClusterHead
from ..models.unet import ENCODER_NAMES


class DiscreteMITrainHook(TrainerHook):
    def __init__(self, *, name: str, feature_name: str, weight: float = 1.0,
                 num_clusters: int = 20, num_subheads: int = 5, padding: int = None):
        super().__init__(name, weight)
        self.feature_name = feature_name
        self.is_encoder = feature_name in ENCODER_NAMES
        self.padding = int(padding or 0)
        if self.is_encoder:
            self._projector = ClusterHead(num_clusters=num_clusters, num_subheads=num_subheads,
                                          head_type="linear", temperature=1.0)
        else:
            self._projector = DenseClusterHead(num_clusters=num_clusters, num_subheads=num_subheads,
                                               head_type="linear", temperature=1.0)

    def build(self, key: jax.Array, model, sample_acts: Dict) -> Dict:
        return self._projector.init(key, sample_acts[self.feature_name])

    def loss_fn(self, params, ctx, scalars):
        n = ctx["n_unl"]
        feats = ctx["acts"][self.feature_name][-2 * n:]
        v1, v2 = feats[:n], feats[n:]
        v1_tf = apply_flip(v1, ctx["flip"])
        probs = self._projector.apply(params, jnp.concatenate([v1_tf, v2], axis=0))
        # probs: [S, 2n, K] (encoder) or [S, 2n, h, w, K] (decoder)
        p1, p2 = probs[:, :n], probs[:, n:]
        if self.is_encoder:
            losses = jax.vmap(lambda a, b: iid_loss(a, b)[0])(p1, p2)
        else:
            losses = jax.vmap(lambda a, b: iid_segmentation_loss(a, b, padding=self.padding))(p1, p2)
        loss = jnp.mean(losses)
        return loss * self.weight, {"mi": loss}
