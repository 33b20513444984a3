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

Crash-safe OVERWRITE (SIGKILL-tested, tests/test_resume.py): orbax's
``save(force=True)`` deletes the existing target before writing, so a kill
mid-write would leave rolling checkpoints (``last_model``/``best_model``)
with NO durable copy. ``save_state`` instead writes to a unique sibling
swap dir (orbax's own tmp-then-rename makes that appear atomically), then
swaps: rename target aside to ``<path>.old``, rename swap into place,
delete ``.old``. Every kill window leaves a complete checkpoint at either
``<path>`` or ``<path>.old``; ``restore_state``/``restore_raw`` fall back
to ``.old`` when the target is missing. Progress metadata goes through
``atomic_write_json`` (tmp + os.replace) so a torn JSON write is
impossible.
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


_SWAP_COUNT = 0


def _swap_into_place(write_to_tmp: Callable[[str], None], path: str) -> None:
    """Crash-safe overwrite of a checkpoint directory.

    ``write_to_tmp(tmp_path)`` must materialize a COMPLETE directory at
    ``tmp_path`` (orbax does its own tmp-then-rename, so the dir appears
    atomically). Then: target -> ``.old``, tmp -> target, drop ``.old``.
    A SIGKILL in any window leaves a restorable copy at ``path`` or
    ``path + ".old"`` (the restore fallback)."""
    global _SWAP_COUNT
    _SWAP_COUNT += 1
    tmp = f"{path}.swap-{os.getpid()}-{_SWAP_COUNT}"
    old = path + ".old"
    # clear swap orphans from a previous crashed process (never ``.old`` —
    # if the target is missing, .old is the only durable copy and must
    # survive until the new target is in place)
    for stale in (tmp, *_stale_swaps(path)):
        shutil.rmtree(stale, ignore_errors=True)
    write_to_tmp(tmp)
    if os.path.exists(path):
        # drop a stale .old only when the current target will replace it
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _stale_swaps(path: str) -> list:
    base = os.path.basename(path) + ".swap-"
    parent = os.path.dirname(path)
    try:
        return [os.path.join(parent, n) for n in os.listdir(parent)
                if n.startswith(base)]
    except FileNotFoundError:
        return []


def _resolve_restore_path(path: str) -> str:
    """The durable copy: ``path``, else the ``.old`` a crash mid-swap left."""
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        return path + ".old"
    return path


def atomic_write_json(path: str, obj) -> None:
    """JSON write that can never be observed torn (tmp + os.replace)."""
    import json

    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_state(path: str, state, async_save: bool = True) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # fully materialize on host to keep checkpoints mesh-independent (and
    # to decouple the background writer from live device buffers)
    host_state = jax.device_get(state)

    def write(ckptr: ocp.Checkpointer) -> None:
        def to_tmp(tmp: str) -> None:
            ckptr.save(tmp, host_state)
            ckptr.wait_until_finished()

        _swap_into_place(to_tmp, path)

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


def save_resume_bundle(path: str, state, meta: dict) -> None:
    """Atomically-published resume point: full train state AND its progress
    metadata in ONE swap-renamed directory (``<path>/state`` +
    ``<path>/progress.json``).

    Closes the last crash window of the split layout: with state and
    progress written separately, a kill between the two leaves a
    checkpoint newer than its metadata, so --resume re-runs one epoch on
    advanced state. Here both become visible in a single os.rename —
    every kill point leaves a fully-paired resume point (the previous
    one, or the new one). Async via the FIFO writer."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host_state = jax.device_get(state)

    def write(ckptr: ocp.Checkpointer) -> None:
        def to_tmp(tmp: str) -> None:
            ckptr.save(os.path.join(tmp, "state"), host_state)
            ckptr.wait_until_finished()
            atomic_write_json(os.path.join(tmp, "progress.json"), meta)

        _swap_into_place(to_tmp, path)

    _submit(write)


def load_resume_meta(path: str):
    """The progress metadata of a resume bundle (None if no bundle)."""
    import json

    wait_for_saves()
    p = _resolve_restore_path(os.path.abspath(path))
    try:
        with open(os.path.join(p, "progress.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _state_path(path: str) -> str:
    """Resolve a checkpoint path: resume bundles keep the state pytree
    under ``<path>/state``; legacy checkpoints ARE the orbax dir."""
    p = _resolve_restore_path(os.path.abspath(path))
    s = os.path.join(p, "state")
    return s if os.path.isdir(s) else p


def restore_raw(path: str):
    """Restore a checkpoint as plain nested dicts/arrays (no reference
    structure) — used for warm starts where only params/batch_stats are
    wanted (reference finetune_hierarchical_cnn.py:275-283)."""
    wait_for_saves()
    return _checkpointer().restore(_state_path(path))


def restore_state(path: str, reference_state):
    """Restore into the structure (and shardings) of ``reference_state``.

    Falls back to ``<path>.old`` when a crash mid-swap left the target
    renamed aside (see ``_swap_into_place``), and resolves resume bundles
    to their nested state dir."""
    wait_for_saves()
    path = _state_path(path)
    ckptr = _checkpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, reference_state)
    return ckptr.restore(path, abstract)
