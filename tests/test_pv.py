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


class TestPallasResynth:
    """Fused Pallas PV resynthesis (interpret mode) vs the XLA middle."""

    def test_matches_xla_middle_on_valid_region(self):
        import freesound_classification_tpu.ops.pallas_kernels as pk
        from freesound_classification_tpu.ops.dsp import (
            num_stft_frames,
            stft_spectrum_dft,
        )
        from freesound_classification_tpu.ops.pv import (
            _princarg,
            _synthesis_basis,
        )

        rng = np.random.RandomState(0)
        b, l = 2, 65536
        n_fft, hop = 1024, 256
        wave = jnp.asarray(rng.randn(b, l).astype("f4") * 0.1)
        rate = jnp.asarray([0.9, 1.15], jnp.float32)

        re, im = stft_spectrum_dft(wave, n_fft, hop)
        t_in = num_stft_frames(l, n_fft, hop)
        t_out = (l + n_fft // 2) // hop + 2
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        expected = (2.0 * jnp.pi * jnp.arange(n_fft // 2 + 1) / n_fft
                    * hop).astype(jnp.float32)
        dphi_in = _princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]
        icos, isin = _synthesis_basis(n_fft)

        rows_k = np.asarray(pk._pv_resynth(
            mag, dphi_in, phase[:, 0], rate, jnp.asarray(icos),
            jnp.asarray(isin), n_fft, t_out, hop, interpret=True,
        )).astype(np.float64)  # (b, t_out + r - 1, hop) OLA'd rows
        n_chunks = n_fft // hop

        # golden middle with kernel-identical f32 position arithmetic
        for i in range(b):
            r = np.float32(float(rate[i]))
            pos = np.arange(t_out, dtype=np.float32) * r
            i0 = np.clip(np.floor(pos).astype(int), 0, t_in - 2)
            frac = np.clip(pos - i0, 0.0, 1.0)[:, None]
            m = np.asarray(mag[i])
            d = np.asarray(dphi_in[i])
            mags = (1 - frac) * m[i0] + frac * m[i0 + 1]
            cum = np.cumsum(d[i0], axis=0)
            phis = np.asarray(phase[i, 0])[None, :] + np.vstack(
                [np.zeros((1, m.shape[1])), cum[:-1]])
            gold = (mags * np.cos(phis)) @ icos + (mags * np.sin(phis)) @ isin
            # overlap-add the golden frames the way the kernel does: frame
            # k's hop-wide chunk o lands on OLA row k + o
            gold_rows = np.zeros((t_out + n_chunks - 1, hop))
            for o in range(n_chunks):
                gold_rows[o:o + t_out] += gold[:, o * hop:(o + 1) * hop]
            # rows all of whose contributing frames have strictly interior
            # analysis positions (the tail clip past t_in-2 is a documented
            # divergence in frames beyond the valid stretched length); rows
            # >= t_out also sum kernel ghost frames the golden lacks
            last_ok = int(np.searchsorted(pos, t_in - 2)) - 1
            interior_rows = min(last_ok + 1, t_out)  # rows 0..interior-1
            err = np.abs(rows_k[i][:interior_rows]
                         - gold_rows[:interior_rows])
            rel = err.max() / max(np.abs(gold_rows[:interior_rows]).max(),
                                  1e-9)
            # bf16 spectra into the synthesis dots (both here and
            # in the XLA path) put ~3e-2 worst-case deviation vs
            # this f64 golden
            assert rel < 0.05, rel


class TestAlignedKernelPath:
    """The aligned-prologue kernel route (ops/pv.py use_kernel branch):
    spectra emitted on the DMA grid directly (pad_bins_to/pad_frames_to),
    ghost rows/bins never read. Runs the Pallas kernel in interpret mode on
    the CPU backend; the hardware twin is tpu_smoke.py section 5."""

    def test_full_stretch_matches_xla_path(self):
        from freesound_classification_tpu.ops import pv

        rng = np.random.RandomState(1)
        b, l = 2, 65536
        n_fft, hop = 1024, 256
        t = np.arange(l) / 44100.0
        wave = jnp.asarray(np.stack([
            np.sin(2 * np.pi * 440.0 * t),
            np.sin(2 * np.pi * 220.0 * t) + 0.1 * rng.randn(l),
        ]).astype(np.float32))
        lengths = jnp.asarray([l, l - 5000], jnp.int32)
        rate = jnp.asarray([0.9, 1.15], jnp.float32)

        out_k, len_k = pv._pv_stretch_impl(
            wave, lengths, rate, n_fft, hop, use_kernel=True)
        out_x, len_x = pv._pv_stretch_impl(
            wave, lengths, rate, n_fft, hop, use_kernel=False)
        out_k, out_x = np.asarray(out_k), np.asarray(out_x)
        assert (np.asarray(len_k) == np.asarray(len_x)).all()
        assert np.isfinite(out_k).all()
        for i in range(b):
            n = int(np.asarray(len_k)[i])
            a, c = out_k[i, : n - 2 * n_fft], out_x[i, : n - 2 * n_fft]
            corr = float(np.corrcoef(a, c)[0, 1])
            assert corr > 0.98, f"row {i}: corr {corr}"

    def test_prologue_forms_agree_through_kernel(self):
        """einsum vs conv prologue feed the same kernel — outputs must
        agree to fp-reassociation tolerance."""
        from freesound_classification_tpu.ops import pv

        rng = np.random.RandomState(2)
        b, l = 2, 65536
        wave = jnp.asarray(rng.randn(b, l).astype("f4") * 0.1)
        lengths = jnp.full((b,), l, jnp.int32)
        rate = jnp.asarray([0.95, 1.1], jnp.float32)
        out_e, _ = pv._pv_stretch_impl(
            wave, lengths, rate, 1024, 256, use_kernel=True,
            prologue_form="einsum")
        out_c, _ = pv._pv_stretch_impl(
            wave, lengths, rate, 1024, 256, use_kernel=True,
            prologue_form="conv")
        a, c = np.asarray(out_e), np.asarray(out_c)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, c / scale, atol=5e-3)
