"""Learning-rate schedule: gradual warmup x multiplier, then cosine annealing.

Parity with the reference trainer (contrastyou/trainer/base.py:71-83):
CosineAnnealingLR(T_max = max_epoch - warmup_max, eta_min=1e-7) wrapped in
GradualWarmupScheduler(multiplier, total_epoch=warmup_max), stepped once per
EPOCH. Expressed as an optax-compatible step-count schedule that converts
step -> epoch via `steps_per_epoch`.

GradualWarmup semantics (deepclustering2 / ildoonet):
  epoch <  warmup: lr = base * ((multiplier - 1) * epoch / warmup + 1)
  epoch >= warmup: cosine from base*multiplier down to eta_min over T_max.
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_epoch_schedule(*, base_lr: float, multiplier: float, warmup_max: int,
                                 max_epoch: int, steps_per_epoch: int,
                                 eta_min: float = 1e-7):
    base_lr = float(base_lr)
    peak = base_lr * float(multiplier)
    t_max = max(int(max_epoch) - int(warmup_max), 1)

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        warm = base_lr * ((multiplier - 1.0) * epoch / max(warmup_max, 1) + 1.0)
        cos_epoch = jnp.clip(epoch - warmup_max, 0.0, float(t_max))
        cos = eta_min + (peak - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * cos_epoch / t_max))
        return jnp.where(epoch < warmup_max, warm, cos)

    def host(step: int) -> float:
        """Same formula in pure python — for meters/logging without touching
        the device (a device read is expensive on some runtimes)."""
        import math
        epoch = int(step) // steps_per_epoch
        if epoch < warmup_max:
            return base_lr * ((multiplier - 1.0) * epoch / max(warmup_max, 1) + 1.0)
        cos_epoch = min(max(epoch - warmup_max, 0), t_max)
        return eta_min + (peak - eta_min) * 0.5 * (1.0 + math.cos(math.pi * cos_epoch / t_max))

    schedule.host = host
    return schedule
