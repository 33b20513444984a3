"""Model family tests: shapes, bucket-padding invariance, aggregation modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.blocks import (
    PReLU,
    masked_max_pool_time,
    MaskedBiGRU,
)
from freesound_classification_tpu.models.classifiers import (
    HierarchicalCNN,
    TwoDimensionalCNN,
    add_frequency_encoding,
)
from freesound_classification_tpu.models.frontend import Frontend


def _init_and_apply(model, inputs, lengths, train=False, seed=0):
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, inputs, lengths, train=False
    )
    out = model.apply(variables, inputs, lengths, train=train)
    return variables, out


class TestBlocks:
    def test_prelu_per_channel(self):
        m = PReLU(4)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
        assert v["params"]["alpha"].shape == (4,)
        y = m.apply(v, jnp.asarray([[-1.0, 1.0, -2.0, 0.0]]))
        np.testing.assert_allclose(y[0], [-0.25, 1.0, -0.5, 0.0])

    def test_masked_max_pool_ignores_padding(self):
        h = jnp.asarray(np.random.RandomState(0).randn(2, 10, 3).astype("f4"))
        h = h.at[0, 5:].set(99.0)  # garbage in padding of sample 0
        lengths = jnp.asarray([5, 10])
        out = masked_max_pool_time(h, lengths)
        assert float(out[0].max()) < 99.0

    def test_bigru_final_state_masked(self):
        m = MaskedBiGRU(hidden=8)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 12, 4).astype("f4"))
        lengths = jnp.asarray([7, 12])
        v = m.init(jax.random.PRNGKey(0), x, lengths)
        out = m.apply(v, x, lengths)
        assert out.shape == (2, 16)
        # changing padding must not change the state
        x2 = x.at[0, 7:].set(123.0)
        out2 = m.apply(v, x2, lengths)
        np.testing.assert_allclose(out[0], out2[0], atol=1e-6)


class TestFrequencyEncoding:
    def test_channel_appended(self):
        x = jnp.zeros((2, 8, 5, 1))
        y = add_frequency_encoding(x)
        assert y.shape == (2, 8, 5, 2)
        np.testing.assert_allclose(y[0, 0, :, 1], -1.0)
        np.testing.assert_allclose(y[0, -1, :, 1], 1.0)


class TestTwoDimensionalCNN:
    @pytest.mark.parametrize("agg", ["max", "rnn"])
    def test_shapes(self, agg):
        model = TwoDimensionalCNN(
            num_conv_blocks=3, start_deep_supervision_on=1,
            conv_base_depth=8, growth_rate=1.5, aggregation_type=agg,
            n_classes=10,
        )
        spec = jnp.asarray(np.random.RandomState(0).randn(2, 32, 40, 1)
                           .astype("f4"))
        lengths = jnp.asarray([40, 24])
        _, out = _init_and_apply(model, spec, lengths)
        assert out["class_logits"].shape == (2, 10)

    def test_bucket_padding_invariance_eval(self):
        """A clip padded into a longer bucket must produce identical logits
        in eval mode (SURVEY.md §7 'hard parts'). Padded feature frames carry
        the same constant (log eps ~ silence) in either bucket."""
        model = TwoDimensionalCNN(
            num_conv_blocks=2, start_deep_supervision_on=0,
            conv_base_depth=8, growth_rate=2, aggregation_type="max",
            n_classes=5,
        )
        rng = np.random.RandomState(3)
        base = rng.randn(1, 16, 24, 1).astype("f4")
        pad_val = float(np.log(1e-4))
        short = np.full((1, 16, 32, 1), pad_val, "f4")
        short[:, :, :24] = base
        long = np.full((1, 16, 64, 1), pad_val, "f4")
        long[:, :, :24] = base
        lengths = jnp.asarray([24])
        v, out_short = _init_and_apply(model, jnp.asarray(short), lengths)
        out_long = model.apply(v, jnp.asarray(long), lengths, train=False)
        np.testing.assert_allclose(
            out_short["class_logits"], out_long["class_logits"],
            atol=1e-5, rtol=1e-5,
        )


class TestHierarchicalCNN:
    @pytest.mark.parametrize("agg", ["max", "rnn"])
    def test_shapes(self, agg):
        model = HierarchicalCNN(
            num_conv_blocks=3, start_deep_supervision_on=1,
            conv_base_depth=8, growth_rate=1.5, aggregation_type=agg,
            n_classes=7,
        )
        feats = jnp.asarray(np.random.RandomState(0).randn(2, 48, 33)
                            .astype("f4"))
        lengths = jnp.asarray([48, 30])
        _, out = _init_and_apply(model, feats, lengths)
        assert out["class_logits"].shape == (2, 7)

    def test_depth_progression_matches_reference_formula(self):
        from freesound_classification_tpu.models.blocks import block_depths

        # int(growth_rate**k * conv_base_depth), classifiers.py:130-132
        assert block_depths(5, 64, 2.0) == [64, 128, 256, 512, 1024]
        assert block_depths(4, 50, 1.5) == [50, 75, 112, 168]


class TestBackbone:
    def test_resnet18_shapes(self):
        from freesound_classification_tpu.models.backbone import CNNBackbone

        model = CNNBackbone(arch="resnet18", n_classes=6)
        spec = jnp.asarray(np.random.RandomState(0).randn(1, 64, 96, 1)
                           .astype("f4"))
        lengths = jnp.asarray([96])
        _, out = _init_and_apply(model, spec, lengths)
        assert out["class_logits"].shape == (1, 6)


class TestFrontend:
    def test_mel_2d(self):
        f = Frontend("mel_256_128_32", "2d")
        wave = jnp.zeros((2, 4096))
        inputs, fl = f(wave, jnp.asarray([4096, 2048]))
        assert inputs.shape == (2, 32, 4096 // 128 + 1, 1)
        assert list(np.asarray(fl)) == [33, 17]

    def test_stft_1d(self):
        f = Frontend("stft_256_128", "1d")
        wave = jnp.zeros((2, 4096))
        inputs, fl = f(wave, jnp.asarray([4096, 100]))
        assert inputs.shape == (2, 33, 129)
        assert list(np.asarray(fl)) == [33, 1]

    def test_raw_1d(self):
        f = Frontend("raw", "1d")
        wave = jnp.zeros((2, 1000))
        inputs, fl = f(wave, jnp.asarray([1000, 500]))
        assert inputs.shape == (2, 1000, 1)
        assert list(np.asarray(fl)) == [1000, 500]
