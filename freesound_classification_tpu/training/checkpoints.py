"""Orbax checkpointing of the full train state.

The reference saves torch ``state_dict`` weights only — optimizer, step and
RNG state are lost across restarts (SURVEY.md §5). Here the whole TrainState
pytree (params, batch_stats, optimizer state, step, PRNG key) round-trips, so
resume is exact. Directory-per-checkpoint layout mirrors the reference's
``checkpoints/fold_{k}/{best_model,model_on_epoch_N,final_model}`` naming
(networks/classifiers.py:846-866).

Saves are ASYNC by default: the device->host transfer is synchronous (the
state is then immutable for the writer), but serialization + fsync happen on
a background thread so the train loop overlaps the next epoch with the
write. ``wait_for_saves()`` (called before any restore, and at interpreter
exit) joins outstanding writes. ``prune_epoch_checkpoints`` implements the
retention policy for periodic ``model_on_epoch_N`` saves.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil

import jax
import orbax.checkpoint as ocp

_ASYNC: ocp.AsyncCheckpointer | None = None


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(wait_for_saves)
    return _ASYNC


def wait_for_saves() -> None:
    """Join all outstanding async checkpoint writes."""
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def save_state(path: str, state, async_save: bool = True) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # fully materialize on host to keep checkpoints mesh-independent (and
    # to decouple the background writer from live device buffers)
    host_state = jax.device_get(state)
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(host_state), force=True)
    else:
        ckptr = _checkpointer()
        ckptr.save(path, host_state, force=True)
        ckptr.wait_until_finished()


def prune_epoch_checkpoints(fold_dir: str, keep: int) -> None:
    """Keep only the newest ``keep`` periodic ``model_on_epoch_N`` dirs.

    best/last/final checkpoints are never touched. keep <= 0 disables
    pruning (the reference keeps everything, classifiers.py:846-855).
    """
    if keep <= 0:
        return
    wait_for_saves()  # never delete around an in-flight write
    pat = re.compile(r"^model_on_epoch_(\d+)$")
    found = []
    try:
        entries = os.listdir(fold_dir)
    except FileNotFoundError:
        return
    for name in entries:
        m = pat.match(name)
        if m:
            found.append((int(m.group(1)), name))
    for _, name in sorted(found)[:-keep]:
        shutil.rmtree(os.path.join(fold_dir, name), ignore_errors=True)


def restore_raw(path: str):
    """Restore a checkpoint as plain nested dicts/arrays (no reference
    structure) — used for warm starts where only params/batch_stats are
    wanted (reference finetune_hierarchical_cnn.py:275-283)."""
    wait_for_saves()
    return _checkpointer().restore(os.path.abspath(path))


def restore_state(path: str, reference_state):
    """Restore into the structure (and shardings) of ``reference_state``."""
    wait_for_saves()
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, reference_state)
    return ckptr.restore(path, abstract)
