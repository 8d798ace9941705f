"""EMA teacher update as a pytree op.

Replaces `deepclustering2.models.ema_updater` used by the mean-teacher hook
(reference semi_seg/hooks/mt.py:13-55). The torch version mutates a deep-copied
teacher module in-place; here the teacher is just a second param pytree and
the update is a pure function fused into the jitted train step.

The reference updater uses torch's convention
    teacher = alpha * teacher + (1 - alpha) * student
with alpha ramped as min(1 - 1/(step+1), alpha_max) (deepclustering2 default
alpha=0.999, justify_alpha=True).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(teacher_params, student_params, alpha: jnp.ndarray):
    """teacher <- alpha * teacher + (1-alpha) * student, elementwise over the pytree."""
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s.astype(t.dtype),
        teacher_params, student_params)


def ramped_alpha(global_step: jnp.ndarray, alpha_max: float = 0.999) -> jnp.ndarray:
    """min(1 - 1/(step+1), alpha_max) — warm start so the teacher tracks early."""
    return jnp.minimum(1.0 - 1.0 / (global_step.astype(jnp.float32) + 1.0), alpha_max)
