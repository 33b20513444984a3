"""Optimizers matching the reference's torch configurations, via optax.

Reference ops/training.py:9-12:
- "adam"     -> torch.optim.Adam(amsgrad=True, weight_decay=wd)
- "momentum" -> torch.optim.SGD(momentum=0.9, nesterov=True, weight_decay=wd)

torch couples weight decay as L2 added to the gradient *before* the moment
updates; ``optax.add_decayed_weights`` placed ahead of the scaling transform
reproduces exactly that (not decoupled AdamW).
"""

from __future__ import annotations

from typing import Callable

import optax


def adam_amsgrad(
    schedule: Callable, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8))
    steps.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*steps)


def sgd_nesterov(
    schedule: Callable, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.trace(decay=0.9, nesterov=True))
    steps.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*steps)


OPTIMIZERS = {
    "adam": adam_amsgrad,
    "momentum": sgd_nesterov,
}


def make_optimizer(
    name: str, schedule: Callable, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    try:
        factory = OPTIMIZERS[name]
    except KeyError:
        raise ValueError(f"unknown optimizer {name!r}; options: {sorted(OPTIMIZERS)}")
    return factory(schedule, weight_decay)
