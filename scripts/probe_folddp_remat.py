"""Repro / gate for GSPMD "Involuntary full rematerialization" warnings in
the fold x dp vmapped train step (training/multifold.py).

MULTICHIP_r03's tail showed the vmapped fold step's resnet conv reshapes
resharding [4,1,1,2]<=[2,4]T(1,0) -> [8,1,1,1]<=[8] with XLA falling back
to replicate-then-partition (spmd_partitioner.cc:652) — real all-gathers on
an 8-chip mesh. This script builds the same program on an 8-device virtual
CPU mesh and compiles it; any remat warning lands on stderr.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=/root/repo python scripts/probe_folddp_remat.py 2>&1 | \
    grep -c "Involuntary full rematerialization"
Exit code 1 if any warning was provoked (checked internally via HLO text).
"""
from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import types  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from freesound_classification_tpu.models.classifiers import (  # noqa: E402
    TwoDimensionalCNN,
)
from freesound_classification_tpu.models.frontend import Frontend  # noqa: E402
from freesound_classification_tpu.ops import augment as augment_lib  # noqa: E402
from freesound_classification_tpu.parallel import mesh as mesh_lib  # noqa: E402
from freesound_classification_tpu.training.engine import Engine  # noqa: E402
from freesound_classification_tpu.training.multifold import (  # noqa: E402
    MultiFoldEngine, make_fold_dp_mesh,
)


def main() -> int:
    # argv[1]: fold count — 2 exercises the fold-sharded 2x4 mesh, 5 the
    # production-fold-count fold-LOCAL layout (5 folds on 8 devices)
    n_folds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    model = TwoDimensionalCNN(
        num_conv_blocks=2, start_deep_supervision_on=0, conv_base_depth=8,
        growth_rate=1.5, aggregation_type="max", n_classes=16,
        dtype=jnp.float32)
    frontend = Frontend("mel_512_256_32", "2d", sr=16000)
    augment = augment_lib.make_augmenter(augment_lib.AugmentConfig(
        p_mixup=0.5, p_aug=0.5, p_shuffle=0.5))
    cfg = types.SimpleNamespace(
        optimizer="adam", learning_rate=1e-3, scheduler="steplr_10_0.5",
        weight_decay=0.0, accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=100, _save_every=1000)
    template = Engine(model, frontend, cfg, loss="lsep", augment=augment,
                      mesh=mesh_lib.make_mesh(1))
    template.make_optimizer(max_steps=4, steps_per_epoch=4)
    mesh2 = make_fold_dp_mesh(n_folds)
    mf = MultiFoldEngine(template, n_folds, mesh=mesh2)
    mf.make_optimizer(max_steps=2, steps_per_epoch=1)

    rng = np.random.RandomState(0)
    batch = {
        "signal": rng.randn(4, 16384).astype(np.float32) * 0.1,
        "lengths": np.full(4, 16384, np.int32),
        "labels": (rng.rand(4, 16) < 0.1).astype(np.float32),
        "is_noisy": np.zeros(4, np.float32),
    }
    mf.init_states(batch)
    stats = mf.train_epoch([[batch] for _ in range(n_folds)])
    shape = dict(zip(mesh2.axis_names, mesh2.devices.shape))
    print(f"mesh: {shape} fold_sharded={mf.fold_sharded}")
    print("losses:", stats["loss"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
