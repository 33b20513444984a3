"""Phase-vocoder time-stretch / pitch-shift tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import pv

SR = 8192


def _tone(freq, n, sr=SR):
    t = np.arange(n) / sr
    return np.sin(2 * np.pi * freq * t).astype("f4")


def _dominant_freq(x, sr=SR):
    x = np.asarray(x)
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    return np.fft.rfftfreq(x.size, 1 / sr)[np.argmax(spec)]


class TestStretch:
    def test_identity_rate_roundtrip(self):
        x = _tone(440, SR)
        wave = jnp.asarray(x[None, :])
        lengths = jnp.asarray([SR])
        out, new_len = pv.phase_vocoder_stretch(
            wave, lengths, jnp.asarray([1.0]), n_fft=1024, hop=256)
        assert int(new_len[0]) == SR
        # rate 1.0 should approximately reconstruct the signal
        a = x[2000:6000]
        b = np.asarray(out[0])[2000:6000]
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.98, corr

    def test_stretch_changes_duration_not_pitch(self):
        x = _tone(440, SR)
        wave = jnp.asarray(x[None, :])
        lengths = jnp.asarray([SR])
        out, new_len = pv.phase_vocoder_stretch(
            wave, lengths, jnp.asarray([0.85]), n_fft=1024, hop=256)
        # rate < 1 -> longer
        assert int(new_len[0]) > SR or int(new_len[0]) == wave.shape[1]
        region = np.asarray(out[0])[2000:6000]
        assert abs(_dominant_freq(region) - 440) < 15

    def test_vmapped_per_sample_rates(self):
        x = np.stack([_tone(300, SR), _tone(900, SR)])
        out, new_len = pv.phase_vocoder_stretch(
            jnp.asarray(x), jnp.asarray([SR, SR]),
            jnp.asarray([1.1, 0.9]), n_fft=1024, hop=256)
        assert out.shape == x.shape
        assert int(new_len[0]) < SR < int(new_len[1]) or \
            int(new_len[1]) == SR  # clipped at buffer


class TestPitchShift:
    @pytest.mark.parametrize("cents,fratio", [(300, 2 ** 0.25),
                                              (-300, 2 ** -0.25)])
    def test_shifts_pitch_keeps_duration(self, cents, fratio):
        x = _tone(440, SR)
        wave = jnp.asarray(x[None, :])
        lengths = jnp.asarray([SR])
        out, new_len = pv.pitch_shift(
            wave, lengths, jnp.asarray([float(cents)]), n_fft=1024, hop=256)
        # duration preserved within a few percent
        assert abs(int(new_len[0]) - SR) < 0.05 * SR
        region = np.asarray(out[0])[2000:6000]
        got = _dominant_freq(region)
        assert abs(got - 440 * fratio) < 25, (got, 440 * fratio)

    def test_zero_cents_near_identity(self):
        x = _tone(440, SR)
        out, new_len = pv.pitch_shift(
            jnp.asarray(x[None, :]), jnp.asarray([SR]),
            jnp.asarray([0.0]), n_fft=1024, hop=256)
        assert int(new_len[0]) == SR
        region = np.asarray(out[0])[2000:6000]
        assert abs(_dominant_freq(region) - 440) < 10


class TestEffectsChainWithPV:
    def test_chain_runs_and_is_finite(self):
        from freesound_classification_tpu.ops.augment import effects_chain

        rng = np.random.RandomState(0)
        wave = jnp.asarray(rng.randn(2, SR).astype("f4") * 0.1)
        lengths = jnp.asarray([SR, SR // 2])
        out, new_len = effects_chain(
            wave, lengths, jax.random.PRNGKey(0), 1.0, sr=SR,
            use_phase_vocoder=True)
        assert out.shape == wave.shape
        assert np.isfinite(np.asarray(out)).all()
        assert (np.asarray(new_len) >= 1).all()
