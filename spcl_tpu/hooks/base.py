"""Hook framework: regularizer plugins composed into the jitted train step.

The reference's two-level hook lifecycle (TrainerHook owns learnable
projector params added to the optimizer; calling it mints a per-epoch
EpocherHook that participates in each step — contrastyou/hooks/base.py:23-118)
maps to JAX as:

- a `TrainerHook` is a *static* object: it owns an optional flax projector
  module, declares what the step must provide, and exposes a pure
  `loss_fn(params, ctx, scalars) -> (weighted_loss, metrics)` that the step
  builder traces once;
- projector params live under `state.hook_params[hook.name]` and are
  optimized together with the model (reference trainer/base.py:66-68);
- per-epoch state (the self-paced gamma, EMA warmup) is host-side and enters
  the step as *traced scalars* via `epoch_scalars()` — changing them never
  retraces.

The step provides a `ctx` dict with (superset; entries may be None):
  acts               {stage: activation} of the step's model forward
                     (last 2*n_unl rows are [unlabeled, unlabeled_tf])
  n_unl              static int — unlabeled batch size
  flip               replayable flip params of this step (data/augment.py)
  unlabeled_tf_logits, unlabeled_logits_tf    [B_u, h, w, C]
  unlabeled_image, unlabeled_image_tf
  partition / patient / cycle / scan_idx / valid   [B_u] int32 meta labels
  key                per-step PRNG key (fold per hook before use)
  apply_student      fn(images) -> logits with current student params
  teacher_logits_tf  teacher prediction in the flipped frame (if needs_teacher)
  labeled_image, labeled_image_tf, labeled_onehot, labeled_onehot_tf
  num_classes        static int
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def label_from_contrast_on(ctx: Dict, contrast_on: str) -> jnp.ndarray:
    """Meta-label vector for the contrastive loss (reference
    semi_seg/hooks/utils.py:45-65 label generators)."""
    if contrast_on == "partition":
        return ctx["partition"]
    if contrast_on == "patient":
        return ctx["patient"]
    if contrast_on == "cycle":
        return ctx["cycle"]
    if contrast_on in ("self", None):
        # SimCLR: each sample only matches its own second view
        return jnp.arange(ctx["partition"].shape[0], dtype=jnp.int32)
    raise NotImplementedError(contrast_on)


class TrainerHook:
    """Base. Subclasses override build/loss_fn and the declarations."""

    needs_teacher: bool = False
    feature_name: Optional[str] = None  # deepest UNet stage this hook taps

    def __init__(self, name: str, weight: float = 1.0):
        self.name = name
        self.weight = float(weight)

    # -- setup (host, once) ---------------------------------------------------
    def build(self, key: jax.Array, model, sample_acts: Dict) -> Optional[Dict]:
        """Init and return projector variables (or None)."""
        return None

    # -- per-epoch (host) -----------------------------------------------------
    def epoch_scalars(self, epoch: int) -> Dict[str, float]:
        return {}

    def on_epoch_end(self) -> None:
        pass

    # -- per-step (traced) ----------------------------------------------------
    def loss_fn(self, params: Optional[Dict], ctx: Dict,
                scalars: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
        raise NotImplementedError

    # -- persistence ---------------------------------------------------------
    def state_dict(self) -> Dict:
        return {}

    def load_state_dict(self, state: Dict) -> None:
        pass


class CombineTrainerHook(TrainerHook):
    """Flat container (reference contrastyou/hooks/base.py CombineTrainerHook)."""

    def __init__(self, *hooks: TrainerHook):
        super().__init__(name="combine")
        self.hooks = list(hooks)


def get_individual_hooks(*hooks: TrainerHook) -> List[TrainerHook]:
    out: List[TrainerHook] = []
    for h in hooks:
        if isinstance(h, CombineTrainerHook):
            out.extend(get_individual_hooks(*h.hooks))
        else:
            out.append(h)
    return out
