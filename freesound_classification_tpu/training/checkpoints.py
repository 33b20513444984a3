"""Orbax checkpointing of the full train state.

The reference saves torch ``state_dict`` weights only — optimizer, step and
RNG state are lost across restarts (SURVEY.md §5). Here the whole TrainState
pytree (params, batch_stats, optimizer state, step, PRNG key) round-trips, so
resume is exact. Directory-per-checkpoint layout mirrors the reference's
``checkpoints/fold_{k}/{best_model,model_on_epoch_N,final_model}`` naming
(networks/classifiers.py:846-866).

Saves are ASYNC through one strict-FIFO background writer thread: the
device->host transfer is synchronous (the state is then immutable for the
writer), but serialization + fsync happen off-thread so the train loop
overlaps the next epoch with the write. Because the queue is strictly
ordered, anything submitted via ``write_after_saves`` (the engine's
progress.json metadata, retention pruning) runs only after every checkpoint
enqueued before it is durable — progress metadata can never be newer than
its paired checkpoint (round-1 crash-consistency finding), and pruning never
blocks the train loop or races an in-flight write. ``wait_for_saves()``
(called before any restore, and at interpreter exit) drains the queue and
re-raises the first writer error.
"""

from __future__ import annotations

import atexit
import os
import queue
import re
import shutil
import threading
from typing import Callable

import jax
import orbax.checkpoint as ocp

_QUEUE: "queue.Queue | None" = None
_WORKER: "threading.Thread | None" = None
_ERRORS: list = []
_SYNC_CKPTR: "ocp.Checkpointer | None" = None


def _checkpointer() -> ocp.Checkpointer:
    global _SYNC_CKPTR
    if _SYNC_CKPTR is None:
        _SYNC_CKPTR = ocp.StandardCheckpointer()
    return _SYNC_CKPTR


def _worker_loop(q: "queue.Queue") -> None:
    # the worker owns its own checkpointer; orbax objects are not shared
    # across threads
    ckptr = ocp.StandardCheckpointer()
    while True:
        fn = q.get()
        try:
            if fn is not None:
                fn(ckptr)
        except BaseException as e:  # surfaced by wait_for_saves()
            _ERRORS.append(e)
        finally:
            q.task_done()


def _submit(fn: Callable) -> None:
    global _QUEUE, _WORKER
    if _QUEUE is None:
        _QUEUE = queue.Queue()
        _WORKER = threading.Thread(
            target=_worker_loop, args=(_QUEUE,), daemon=True,
            name="ckpt-writer")
        _WORKER.start()
        atexit.register(wait_for_saves)
    _QUEUE.put(fn)


def wait_for_saves() -> None:
    """Drain the background writer queue; re-raise the first writer error."""
    if _QUEUE is not None:
        _QUEUE.join()
    if _ERRORS:
        raise _ERRORS.pop(0)


def write_after_saves(fn: Callable[[], None]) -> None:
    """Run ``fn`` on the writer thread after every save enqueued so far is
    durable (strict FIFO). Used for crash-consistent metadata (the engine's
    progress.json) and retention pruning."""
    _submit(lambda _ckptr: fn())


def save_state(path: str, state, async_save: bool = True) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # fully materialize on host to keep checkpoints mesh-independent (and
    # to decouple the background writer from live device buffers)
    host_state = jax.device_get(state)

    def write(ckptr: ocp.Checkpointer) -> None:
        ckptr.save(path, host_state, force=True)
        ckptr.wait_until_finished()

    if async_save:
        _submit(write)
    else:
        write(_checkpointer())


def prune_epoch_checkpoints(fold_dir: str, keep: int) -> None:
    """Keep only the newest ``keep`` periodic ``model_on_epoch_N`` dirs.

    best/last/final checkpoints are never touched. keep <= 0 disables
    pruning (the reference keeps everything, classifiers.py:846-855).
    Runs synchronously; the engine routes it through ``write_after_saves``
    so it happens on the writer thread after the newest save committed.
    """
    if keep <= 0:
        return
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
