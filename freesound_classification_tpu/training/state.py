"""Train state: params + batch_stats + optimizer + step + PRNG.

The reference checkpoints weights only (torch state_dict; optimizer/scheduler
state is never saved — SURVEY.md §5). Here the full state is one pytree so
orbax checkpoints capture everything needed for exact resume.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    rng: jax.Array = None


def create_train_state(
    model,
    example_inputs,
    example_frame_lengths,
    tx: optax.GradientTransformation,
    seed: int = 42,
) -> TrainState:
    """Initialize model variables and wrap them with the optimizer."""
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng}, example_inputs, example_frame_lengths, train=False
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
        rng=state_rng,
    )
