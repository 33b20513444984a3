"""Data-parallel correctness: training on an 8-device mesh must match
single-device training bit-for-bit (same global batch, same updates) —
the pmean-correctness property XLA is supposed to give us for free
(parallel/mesh.py docstring)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.parallel import mesh as mesh_lib
from freesound_classification_tpu.training.engine import Engine


def _cfg():
    return types.SimpleNamespace(
        optimizer="adam", learning_rate=1e-3,
        scheduler="1cycle_0.0001_0.001", weight_decay=1e-5,
        accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=100, _save_every=1000)


def _engine(n_devices):
    model = TwoDimensionalCNN(
        num_conv_blocks=2, start_deep_supervision_on=0, conv_base_depth=8,
        growth_rate=2.0, aggregation_type="max", n_classes=5)
    frontend = Frontend("mel_256_128_16", "2d", sr=8000)
    eng = Engine(model, frontend, _cfg(), loss="lsep",
                 mesh=mesh_lib.make_mesh(n_devices))
    eng.make_optimizer(max_steps=10, steps_per_epoch=10)
    return eng


def _batch(b=16, l=4096, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "signal": rng.randn(b, l).astype("f4") * 0.1,
        "lengths": np.full(b, l, "i4"),
        "labels": (rng.rand(b, 5) < 0.3).astype("f4"),
        "is_noisy": np.zeros(b, "f4"),
    }


class TestMeshEquivalence:
    def test_8dev_matches_1dev_losses_and_grads(self):
        """Loss trajectory must match across mesh widths, and the raw
        gradients must agree to FP-reassociation tolerance. (Parameters
        after several adam steps are NOT compared: adam normalizes
        near-zero gradients to +-lr, so reduction-order sign flips on
        dead weights get amplified to lr-sized param deltas without
        affecting the loss.)"""
        assert len(jax.devices()) == 8
        batch = _batch()

        losses_by_mesh = {}
        grads_by_mesh = {}
        for n in (1, 8):
            eng = _engine(n)
            eng.init_state(batch)
            db, _ = eng._prep_batch(batch)

            def loss_of(params, db=db, eng=eng):
                inputs, fl = eng.frontend(db["signal"], db["lengths"])
                loss, _ = eng._forward_loss(
                    params, eng.state.batch_stats, inputs, fl,
                    db["labels"], eng.state.rng, train=False)
                return loss

            grads_by_mesh[n] = jax.device_get(
                jax.grad(loss_of)(eng.state.params))

            losses = []
            for _ in range(3):
                eng.state, out = eng._train_step(
                    eng.state, db, 0.0,
                    jnp.int32(db['signal'].shape[0]), db["signal"])
                losses.append(float(out["loss"]))
            losses_by_mesh[n] = losses

        np.testing.assert_allclose(
            losses_by_mesh[1], losses_by_mesh[8], rtol=1e-5)
        for a, b in zip(jax.tree.leaves(grads_by_mesh[1]),
                        jax.tree.leaves(grads_by_mesh[8])):
            scale = max(float(np.abs(a).max()), 1e-3)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)

    def test_batch_stats_are_global(self):
        """BN statistics must be computed over the GLOBAL batch, not
        per-shard (jit over sharded batch gives this automatically)."""
        batch = _batch(b=16, seed=1)
        stats = {}
        for n in (1, 8):
            eng = _engine(n)
            eng.init_state(batch)
            db, _ = eng._prep_batch(batch)
            eng.state, _ = eng._train_step(
                eng.state, db, 0.0,
                jnp.int32(db['signal'].shape[0]), db["signal"])
            stats[n] = jax.device_get(eng.state.batch_stats)
        for a, b in zip(jax.tree.leaves(stats[1]), jax.tree.leaves(stats[8])):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_pad_batch_to_multiple(self):
        batch = {"x": np.arange(10)[:, None].astype("f4")}
        padded, n = mesh_lib.pad_batch_to_multiple(batch, 8)
        assert n == 10
        assert len(padded["x"]) == 16
        np.testing.assert_array_equal(
            padded["x"][10:], np.repeat(batch["x"][-1:], 6, axis=0))
