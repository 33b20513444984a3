"""LR schedules from descriptor strings, as pure optax schedule functions.

Reference: ops/training.py:15-43 (``make_scheduler``/``make_step``) and
:208-234 (``OneCycleScheduler``). The reference mutates optimizer param groups
imperatively per epoch (steplr) or per step (1cycle); here every descriptor
becomes a pure ``step -> lr`` function that lives inside the compiled update,
so LR changes never retrace or touch the host.

Descriptors:
- ``steplr_<step_size>_<gamma>``  — lr = base * gamma**(epoch // step_size),
  epoch-granular (reference StepLR usage, training.py:19-25)
- ``1cycle_<min_lr>_<max_lr>``    — linear warmup min->max over the first 30%
  of total steps, then linear anneal max -> min/1e3 (training.py:221-231)
"""

from __future__ import annotations

import jax.numpy as jnp


def onecycle_schedule(min_lr: float, max_lr: float, max_steps: int):
    """Reference OneCycleScheduler (training.py:208-234), as step -> lr.

    The reference calls scheduler.step() once per batch starting from
    internal epoch=-1, so the lr used on the k-th batch (k from 0) is the
    schedule evaluated at k. ``mid`` = round(0.3 * max_steps).
    """
    mid = int(round(max_steps * 0.3))
    mid = max(mid, 1)
    tail = max(max_steps - mid, 1)
    final_lr = min_lr / 1e3

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (max_lr - min_lr) * (step / mid)
        r = (step - mid) / tail
        anneal = max_lr + (final_lr - max_lr) * r
        return jnp.where(step < mid, warm, anneal)

    return schedule


def steplr_schedule(base_lr: float, step_size: int, gamma: float, steps_per_epoch: int):
    """Reference StepLR: decay by gamma every ``step_size`` epochs."""
    steps_per_epoch = max(steps_per_epoch, 1)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        k = (epoch // step_size).astype(jnp.float32)
        return base_lr * jnp.power(gamma, k)

    return schedule


def make_schedule(
    descriptor: str,
    base_lr: float,
    max_steps: int,
    steps_per_epoch: int,
):
    """Descriptor string -> optax-compatible ``step -> lr`` schedule.

    Mirrors reference make_scheduler (ops/training.py:15-34): "steplr_*" uses
    ``base_lr`` (the --lr flag); "1cycle_*" carries its own min/max and
    ignores ``base_lr`` exactly as the reference optimizer's initial lr is
    immediately overwritten by OneCycleScheduler.step().
    """
    name, *args = descriptor.split("_")
    if name == "steplr":
        step_size, gamma = int(args[0]), float(args[1])
        return steplr_schedule(base_lr, step_size, gamma, steps_per_epoch)
    if name == "1cycle":
        min_lr, max_lr = float(args[0]), float(args[1])
        return onecycle_schedule(min_lr, max_lr, max_steps)
    raise ValueError(f"unknown scheduler descriptor: {descriptor!r}")
