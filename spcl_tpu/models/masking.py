"""Stage-range parameter masking — the functional `set_grad` equivalent.

The reference freezes/unfreezes contiguous UNet stage ranges with a context
manager flipping requires_grad (reference semi_seg/arch/unet.py:242-259,
used by main_pretrain_encoder.py:65-67 to freeze everything past Conv5).
In JAX, parameters are immutable pytrees; the equivalent is a boolean mask
over the param tree applied to *gradients* (frozen params get zero grads and
therefore no optimizer update).
"""
from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .unet import ARCH_ELEMENTS, arch_order


def stages_from_range(start: Optional[str] = None, end: Optional[str] = None,
                      include_start: bool = True, include_end: bool = True) -> List[str]:
    """Stage names in [start, end] with inclusivity flags (reference
    unet.py:34-64 `_complete_arch_start2end`)."""
    if start is None and not include_start:
        raise ValueError("include_start must be True when start is None")
    if end is None and not include_end:
        raise ValueError("include_end must be True when end is None")
    start = start or "Conv1"
    end = end or "Deconv_1x1"
    si, ei = arch_order(start), arch_order(end)
    if si > ei:
        raise ValueError((start, end))
    lo = si if include_start else si + 1
    hi = ei + 1 if include_end else ei
    return list(ARCH_ELEMENTS[lo:hi])


def stage_trainable_mask(params, trainable_stages: Iterable[str]):
    """Boolean pytree: True where the param's top-level module is trainable.

    UNet submodules are named exactly by stage (`Conv1`..`Deconv_1x1`);
    non-stage params (projector heads, etc.) default to trainable.
    """
    trainable = set(trainable_stages)

    def mask_entry(path: Sequence, leaf):
        for p in path:
            key = getattr(p, "key", None)
            if key in ARCH_ELEMENTS:
                return key in trainable
        return True

    return jax.tree_util.tree_map_with_path(mask_entry, params)


def zero_grads_by_mask(grads, mask):
    """Zero out gradients where mask is False."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
