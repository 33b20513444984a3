"""Orbax checkpointing of the full train state.

The reference saves torch ``state_dict`` weights only — optimizer, step and
RNG state are lost across restarts (SURVEY.md §5). Here the whole TrainState
pytree (params, batch_stats, optimizer state, step, PRNG key) round-trips, so
resume is exact. Directory-per-checkpoint layout mirrors the reference's
``checkpoints/fold_{k}/{best_model,model_on_epoch_N,final_model}`` naming
(networks/classifiers.py:846-866).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_state(path: str, state) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = _checkpointer()
    # fully materialize on host to keep checkpoints mesh-independent
    host_state = jax.device_get(state)
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()


def restore_raw(path: str):
    """Restore a checkpoint as plain nested dicts/arrays (no reference
    structure) — used for warm starts where only params/batch_stats are
    wanted (reference finetune_hierarchical_cnn.py:275-283)."""
    return _checkpointer().restore(os.path.abspath(path))


def restore_state(path: str, reference_state):
    """Restore into the structure (and shardings) of ``reference_state``."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, reference_state)
    return ckptr.restore(path, abstract)
