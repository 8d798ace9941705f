"""Optimizer factory.

Parity with the reference optimizer surface (deepclustering2.optim zoo —
RAdam default, reference config/base.yaml:11-14) in torch semantics:
weight decay is added to the gradient BEFORE the adaptive update
(torch L2-style, not AdamW-style), then the per-epoch warmup-x-multiplier ->
cosine schedule scales the step (schedulers/lr.py).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import optax


def build_optimizer(*, name: str = "RAdam", lr: Union[float, Callable] = 1e-7,
                    weight_decay: float = 0.0,
                    grad_clip: Optional[float] = None,
                    momentum: float = 0.9,
                    nesterov: bool = False) -> optax.GradientTransformation:
    name = name.lower()
    scale_by = {
        "radam": optax.scale_by_radam,
        "adam": optax.scale_by_adam,
        "adamw": optax.scale_by_adam,
        # torch.optim.SGD semantics with dampening=0 (the deepclustering2 zoo's
        # SGD, reference contrastyou/trainer/base.py:66 optimizer surface):
        # buf = momentum*buf + g; update = g + momentum*buf if nesterov else
        # buf — exactly optax.trace. Golden-tested against torch in
        # tests/test_optim.py. momentum=0 degrades to plain GD like torch.
        "sgd": lambda: (optax.trace(decay=momentum, nesterov=nesterov)
                        if momentum else optax.identity()),
    }
    if name not in scale_by:
        raise KeyError(f"unknown optimizer {name!r}")
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and name != "adamw":
        chain.append(optax.add_decayed_weights(weight_decay))  # torch L2 semantics
    chain.append(scale_by[name]())
    if weight_decay and name == "adamw":
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)
