"""Supervised segmentation criterion + entropy.

Replaces `deepclustering2.loss.KL_div` / `Entropy` (the only two
deepclustering2 losses the reference uses — SURVEY.md §2.4 last row;
wired at reference main.py:57 and semi_seg/hooks/entmin.py).

KL_div(pred_probs, onehot_target) = KL(target || pred)
    = sum_c target_c * (log(target_c + eps) - log(pred_c + eps)),
reduced by mean over batch and spatial dims. With a one-hot target this is
exactly pixelwise cross-entropy, which is how the reference uses it.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-16


def kl_div(pred_probs: jnp.ndarray, target_probs: jnp.ndarray,
           class_axis: int = -1) -> jnp.ndarray:
    """KL(target || pred). Both inputs are probability maps over `class_axis`."""
    kl = target_probs * (jnp.log(target_probs + _EPS) - jnp.log(pred_probs + _EPS))
    return jnp.mean(jnp.sum(kl, axis=class_axis))


def cross_entropy_onehot(logits: jnp.ndarray, onehot_target: jnp.ndarray,
                         class_axis: int = -1) -> jnp.ndarray:
    """Numerically-stable equivalent of kl_div(softmax(logits), onehot):
    fused log-softmax avoids the softmax->log round trip on TPU."""
    logp = logits - jnp.log(jnp.sum(jnp.exp(
        logits - jnp.max(logits, axis=class_axis, keepdims=True)),
        axis=class_axis, keepdims=True)) - jnp.max(logits, axis=class_axis, keepdims=True)
    return -jnp.mean(jnp.sum(onehot_target * logp, axis=class_axis))


def entropy_loss(probs: jnp.ndarray, class_axis: int = -1) -> jnp.ndarray:
    """Mean Shannon entropy of prob maps (entropy-minimization baseline)."""
    ent = -jnp.sum(probs * jnp.log(probs + _EPS), axis=class_axis)
    return jnp.mean(ent)
