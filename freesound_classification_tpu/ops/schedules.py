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


def cyclic_schedule(
    base_lr: float,
    max_lr: float,
    step_size: int,
    mode: str = "triangular",
    gamma: float = 1.0,
):
    """Cyclical LR (Smith 2015), reference ops/training.py:46-197 (CyclicLR,
    vendored from bckenstler/CLR; dead code there — wired up here as the
    ``cyclic_<base>_<max>_<stepsize>[_<mode>[_<gamma>]]`` descriptor).

    triangular / triangular2 / exp_range amplitude scaling, per-step.
    """
    step_size_f = float(max(step_size, 1))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + step / (2.0 * step_size_f))
        x = jnp.abs(step / step_size_f - 2.0 * cycle + 1.0)
        base_height = (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)
        if mode == "triangular":
            scale = 1.0
        elif mode == "triangular2":
            scale = 1.0 / (2.0 ** (cycle - 1.0))
        elif mode == "exp_range":
            scale = gamma**step
        else:
            raise ValueError(f"unknown cyclic mode {mode!r}")
        return base_lr + base_height * scale

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
    if name == "cyclic":
        base_lr, max_lr, step_size = (
            float(args[0]), float(args[1]), int(args[2]))
        mode = args[3] if len(args) > 3 else "triangular"
        gamma = float(args[4]) if len(args) > 4 else 1.0
        return cyclic_schedule(base_lr, max_lr, step_size, mode, gamma)
    raise ValueError(f"unknown scheduler descriptor: {descriptor!r}")
