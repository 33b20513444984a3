"""Training engine integration: overfit tiny synthetic data end-to-end,
checkpoint round-trip, multi-device mesh execution (8 virtual CPU devices)."""

import types

import numpy as np
import pytest

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.parallel import mesh as mesh_lib
from freesound_classification_tpu.training.engine import Engine

SR = 44100
N_CLASSES = 4
CLIP_LEN = 8192


def _synthetic_batches(n_batches=3, batch=8, seed=0):
    """Tone-vs-noise toy problem: class = dominant band."""
    rng = np.random.RandomState(seed)
    batches = []
    freqs = [300.0, 900.0, 2500.0, 6000.0]
    for _ in range(n_batches):
        signal = np.zeros((batch, CLIP_LEN), np.float32)
        labels = np.zeros((batch, N_CLASSES), np.float32)
        lengths = np.full(batch, CLIP_LEN, np.int32)
        for b in range(batch):
            c = rng.randint(N_CLASSES)
            t = np.arange(CLIP_LEN) / SR
            signal[b] = (
                np.sin(2 * np.pi * freqs[c] * t) * 0.5
                + rng.randn(CLIP_LEN) * 0.01
            )
            labels[b, c] = 1.0
        batches.append({
            "signal": signal, "lengths": lengths, "labels": labels,
            "is_noisy": np.zeros(batch, np.float32),
        })
    return batches


class ListLoader(list):
    pass


def _train_cfg(**kw):
    cfg = dict(
        optimizer="adam", learning_rate=3e-3, scheduler="1cycle_0.0003_0.003",
        weight_decay=0.0, accumulation_steps=1, epochs=1,
        switch_off_augmentations_on=100, _save_every=1000,
    )
    cfg.update(kw)
    return types.SimpleNamespace(**cfg)


def _make_engine(tmp_path=None, **cfg_kw):
    model = TwoDimensionalCNN(
        num_conv_blocks=2, start_deep_supervision_on=0, conv_base_depth=8,
        growth_rate=2.0, aggregation_type="max", n_classes=N_CLASSES,
    )
    frontend = Frontend("mel_256_128_32", "2d", sr=SR)
    return Engine(
        model, frontend, _train_cfg(**cfg_kw), loss="lsep",
        checkpoint_dir=str(tmp_path) if tmp_path else None,
    )


class TestEngine:
    def test_overfits_synthetic(self):
        train = ListLoader(_synthetic_batches(4, 8, seed=0))
        engine = _make_engine()
        scores = engine.fit_validate(train, train, epochs=15, fold=0)
        # eval-mode BN needs some steps for running stats to converge
        assert max(scores) > 0.9, f"failed to overfit, scores={scores}"

    def test_runs_on_8_device_mesh(self):
        import jax

        assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
        engine = _make_engine()
        assert engine.mesh.devices.size == 8
        train = ListLoader(_synthetic_batches(2, 8, seed=1))
        scores = engine.fit_validate(train, train, epochs=1, fold=0)
        assert np.isfinite(scores[0])

    def test_batch_not_divisible_by_mesh(self):
        engine = _make_engine()
        train = ListLoader(_synthetic_batches(2, 6, seed=2))  # 6 % 8 != 0
        scores = engine.fit_validate(train, train, epochs=1, fold=0)
        assert np.isfinite(scores[0])

    def test_checkpoint_roundtrip(self, tmp_path):
        train = ListLoader(_synthetic_batches(2, 8, seed=3))
        engine = _make_engine(tmp_path)
        engine.fit_validate(train, train, epochs=1, fold=0)
        preds_before = engine.predict(train)
        engine.save_checkpoint(0, "best_model")

        engine2 = _make_engine(tmp_path)
        engine2.make_optimizer(max_steps=2, steps_per_epoch=2)
        engine2.init_state(train[0])
        engine2.load_best_model(0)
        preds_after = engine2.predict(train)
        np.testing.assert_allclose(preds_before, preds_after, atol=1e-6)

    def test_accumulation_steps(self):
        train = ListLoader(_synthetic_batches(4, 8, seed=4))
        engine = _make_engine(accumulation_steps=2)
        scores = engine.fit_validate(train, train, epochs=2, fold=0)
        assert np.isfinite(scores[-1])

    def test_predict_shape_and_range(self):
        train = ListLoader(_synthetic_batches(2, 8, seed=5))
        engine = _make_engine()
        engine.fit_validate(train, train, epochs=1, fold=0)
        preds = engine.predict(train, n_tta=2)
        assert preds.shape == (16, N_CLASSES)
        assert (preds >= 0).all() and (preds <= 1).all()

    def test_predict_rejects_degenerate_tta(self):
        """Engine.predict raises when n_tta > 1 with a provably
        deterministic loader (train=False, or no stochastic crop) —
        library callers get the same guard as the CLIs
        (cli.common.reject_degenerate_tta)."""
        engine = _make_engine()

        class FakeLoader(list):
            def __init__(self, train, max_audio_length):
                super().__init__()
                self.train = train
                self.dataset = types.SimpleNamespace(
                    max_audio_length=max_audio_length)

        with pytest.raises(ValueError, match="deterministic loader"):
            engine.predict(FakeLoader(train=False, max_audio_length=2.0),
                           n_tta=2)
        with pytest.raises(ValueError, match="deterministic loader"):
            engine.predict(FakeLoader(train=True, max_audio_length=None),
                           n_tta=2)
        # stochastic-crop loader passes the guard: the empty fake loader
        # then fails later, at np.concatenate — proving the guard let it by
        with pytest.raises(ValueError, match="at least one array"):
            engine.predict(FakeLoader(train=True, max_audio_length=2.0),
                           n_tta=2)
        # ...but a SHUFFLED stochastic loader is rejected: each pass would
        # reshuffle and predict averages in loader order
        shuffled = FakeLoader(train=True, max_audio_length=2.0)
        shuffled.sampler = types.SimpleNamespace(shuffle=True)
        with pytest.raises(ValueError, match="SHUFFLED"):
            engine.predict(shuffled, n_tta=2)
        # unknown loader types (no .train attribute) are not rejected
        with pytest.raises(ValueError, match="at least one array"):
            engine.predict(ListLoader(), n_tta=2)

    def test_static_scale_zero_skips_augmenter_exactly(self):
        """aug_scale is jit-static: the scale-0 program omits the augmenter
        entirely, and must produce bit-identical state/loss to an engine
        built with augment=None (the skip is exact, not approximate)."""
        from freesound_classification_tpu.ops.augment import (
            AugmentConfig, make_augmenter,
        )

        batch = _synthetic_batches(1, 8, seed=6)[0]
        import jax
        import jax.numpy as jnp

        results = {}
        for name, aug in (
            ("none", None),
            ("scaled_off", make_augmenter(AugmentConfig(
                p_mixup=0.5, p_aug=0.5, p_shuffle=0.5, sr=SR))),
        ):
            model = TwoDimensionalCNN(
                num_conv_blocks=2, start_deep_supervision_on=0,
                conv_base_depth=8, growth_rate=2.0, aggregation_type="max",
                n_classes=N_CLASSES)
            frontend = Frontend("mel_256_128_32", "2d", sr=SR)
            eng = Engine(model, frontend, _train_cfg(), loss="lsep",
                         augment=aug)
            eng.make_optimizer(max_steps=2, steps_per_epoch=2)
            eng.init_state(batch)
            db, n = eng._prep_batch(batch)
            partner = (db["signal"], db["lengths"], db.get("labels"))
            eng.state, out = eng._train_step(
                eng.state, db, 0.0, jnp.int32(n), partner)
            results[name] = (float(out["loss"]),
                             jax.device_get(eng.state.params))
        assert results["none"][0] == results["scaled_off"][0]
        for a, b in zip(jax.tree.leaves(results["none"][1]),
                        jax.tree.leaves(results["scaled_off"][1])):
            np.testing.assert_array_equal(a, b)
