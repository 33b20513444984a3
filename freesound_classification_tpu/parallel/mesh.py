"""Mesh + sharding layer: scale-out without NCCL-style plumbing.

The reference is strictly single-device (SURVEY.md §2b: no DataParallel /
torch.distributed anywhere). The TPU-native framework makes data parallelism a
first-class axis instead: a 1-D ``jax.sharding.Mesh`` over all local devices
(v5e-1 degenerates to a trivial mesh; pods scale out over ICI), with the batch
dimension sharded along ``"data"`` and parameters replicated. XLA inserts the
gradient/metric collectives (psum over ICI) — there is no user-managed
communication backend to configure.

Gradient reductions come out pmean-correct for free: the loss is a global-mean
over the sharded batch, so its gradient already averages across shards.
Cross-replica BatchNorm statistics likewise fall out of jit-over-sharded-batch
(the mean/var reductions are global reductions XLA lowers to collectives).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Place a host batch dict on the mesh, batch axis sharded.

    Batch sizes must divide the mesh size — the bucketed loader guarantees
    this (data.bucketing pads batches to a multiple of the mesh size).

    Single-host: a plain sharded device_put. Multi-host SPMD (a mesh
    spanning processes): ``batch`` is this host's disjoint shard (the
    loader's per-process row slice) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — per-host data loading
    stays disjoint (SURVEY §2b) while jit sees one global batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(np.asarray(v), sharding) for k, v in batch.items()}


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def pad_batch_to_multiple(
    batch: dict[str, np.ndarray], multiple: int
) -> tuple[dict[str, np.ndarray], int]:
    """Pad the leading axis to a multiple of the mesh size by repeating the
    last row; returns (padded batch, original size). Padded rows are dropped
    from host-side metrics by the caller."""
    n = len(next(iter(batch.values())))
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        reps = np.repeat(v[-1:], pad, axis=0)
        out[k] = np.concatenate([v, reps], axis=0)
    return out, n
