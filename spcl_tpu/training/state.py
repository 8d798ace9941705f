"""Train state: one pytree holding everything the jitted step mutates.

The reference's recursive trainer state (model/optimizer/scheduler/hooks —
contrastyou/trainer/_io.py:62-106) becomes a single flax struct: functional
updates inside jit, trivially checkpointable, shardable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                       # global optimizer step
    params: Any                             # {"model": ..., "hooks": {name: vars}}
    batch_stats: Any                        # BN running stats
    opt_state: Any
    teacher_params: Optional[Any] = None    # EMA teacher (mean-teacher hook)
    discr_params: Optional[Any] = None      # adversarial baseline
    discr_opt_state: Optional[Any] = None
    base_key: Optional[Any] = None          # PRNG base; steps fold in state.step

    def trainable_params(self):
        return self.params


def create_train_state(*, model_params, batch_stats, hook_params: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       teacher: bool = False,
                       discr_params=None, discr_tx=None,
                       base_key=None) -> TrainState:
    params = {"model": model_params, "hooks": hook_params}
    opt_state = tx.init(params)
    # the teacher must NOT alias the student buffers: train steps donate the
    # whole state, and aliased buffers would be donated twice
    teacher_params = (jax.tree_util.tree_map(jnp.copy, model_params)
                      if teacher else None)
    discr_opt_state = discr_tx.init(discr_params) if (discr_params is not None and discr_tx is not None) else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      teacher_params=teacher_params,
                      discr_params=discr_params, discr_opt_state=discr_opt_state,
                      base_key=base_key)
