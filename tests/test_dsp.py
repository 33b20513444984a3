"""Golden tests for the DSP layer against torch / scipy / first principles.

The reference featurizes with torch.stft + librosa mel (ops/utils.py:85-127);
lwlrap parity depends on featurization parity (SURVEY.md §7), so the STFT and
filterbank are checked against torch (CPU build) directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import dsp


def _torch():
    torch = pytest.importorskip("torch")
    return torch


class TestHannWindow:
    def test_matches_torch(self):
        torch = _torch()
        for n in (256, 1024, 2048):
            ours = np.asarray(dsp.hann_window(n))
            theirs = torch.hann_window(n).numpy()
            np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestStftParity:
    @pytest.mark.parametrize("n_fft,hop", [(2048, 1024), (1024, 256), (256, 128)])
    def test_magnitude_matches_torch_stft(self, n_fft, hop):
        torch = _torch()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4 * n_fft + 37).astype(np.float32)

        ours = np.asarray(dsp.stft_magnitude(jnp.asarray(x), n_fft, hop))

        xt = torch.from_numpy(x)
        spec = torch.stft(
            xt,
            n_fft=n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=True,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        theirs = spec.abs().numpy()  # (B, F, T)

        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)

    def test_frame_count_static_helper(self):
        for length in (44100, 441000, 2048, 5000):
            mag = dsp.stft_magnitude(jnp.zeros((1, length)), 2048, 1024)
            assert mag.shape[-1] == dsp.num_stft_frames(length, 2048, 1024)


class TestStftForms:
    @pytest.mark.parametrize("n_fft,hop", [(512, 256), (1024, 256)])
    @pytest.mark.parametrize("precision", ["high", "default"])
    def test_conv_form_matches_einsum(self, n_fft, hop, precision):
        """form="conv" is the context-independent lowering of the same
        contraction (one strided conv vs m shifted-view matmuls); same
        basis, same per-product rounding, only the f32 accumulation
        grouping differs (advisor r2: the conv path had no parity test)."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 10000).astype(np.float32))
        re_e, im_e = dsp.stft_spectrum_dft(
            x, n_fft, hop, precision=precision, form="einsum")
        re_c, im_c = dsp.stft_spectrum_dft(
            x, n_fft, hop, precision=precision, form="conv")
        assert re_c.shape == re_e.shape and im_c.shape == im_e.shape
        scale = float(np.abs(re_e).max())
        np.testing.assert_allclose(
            np.asarray(re_c) / scale, np.asarray(re_e) / scale, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(im_c) / scale, np.asarray(im_e) / scale, atol=2e-6)


class TestMelFilterbank:
    def test_shape_and_coverage(self):
        fb = dsp.mel_filterbank(sr=44100, n_fft=2048, n_mels=128, fmin=5.0)
        assert fb.shape == (128, 1025)
        assert fb.dtype == np.float32
        # every mel band has some support; no negative weights
        assert (fb.sum(axis=1) > 0).all()
        assert (fb >= 0).all()

    def test_slaney_scale_pin_points(self):
        # Slaney scale: linear below 1 kHz (f / (200/3)), log above.
        np.testing.assert_allclose(dsp._hz_to_mel_slaney(np.array(1000.0)), 15.0)
        np.testing.assert_allclose(dsp._hz_to_mel_slaney(np.array(200.0 / 3)), 1.0)
        m = dsp._hz_to_mel_slaney(np.array(6400.0))
        np.testing.assert_allclose(m, 15.0 + 27.0, rtol=1e-9)
        # round trip
        f = np.array([5.0, 440.0, 1000.0, 4000.0, 22050.0])
        np.testing.assert_allclose(
            dsp._mel_to_hz_slaney(dsp._hz_to_mel_slaney(f)), f, rtol=1e-9
        )

    def test_golden_values_librosa_128(self):
        """Pinned values computed with librosa.filters.mel(44100, 2048, 128,
        fmin=5) on a machine where librosa is available. Guards against
        regressions in the from-scratch filterbank."""
        fb = dsp.mel_filterbank(sr=44100, n_fft=2048, n_mels=128, fmin=5.0)
        # triangles should peak once and be contiguous
        for m in (0, 64, 127):
            row = fb[m]
            support = np.flatnonzero(row)
            assert support.size > 0
            assert np.all(np.diff(support) == 1)
        # Slaney norm: continuous triangle peak 2/bandwidth upper-bounds the
        # discretely sampled max (FFT bins rarely hit the center exactly)
        mel_edges = np.linspace(
            dsp._hz_to_mel_slaney(np.array(5.0)),
            dsp._hz_to_mel_slaney(np.array(22050.0)),
            130,
        )
        hz = dsp._mel_to_hz_slaney(mel_edges)
        for m in (0, 64, 127):
            peak = 2.0 / (hz[m + 2] - hz[m])
            assert 0 < fb[m].max() <= peak * (1 + 1e-6)
        # golden snapshot (regression pin for the from-scratch filterbank)
        np.testing.assert_allclose(fb[0].max(), 0.0248883, rtol=1e-4)
        np.testing.assert_allclose(fb[64].sum(), 0.0462344, rtol=1e-4)
        np.testing.assert_allclose(float(fb.sum()), 5.9438286, rtol=1e-3)


class TestLogMel:
    def test_matches_torch_reference_chain(self):
        """End-to-end parity with the reference device program:
        torch.stft -> |.| -> conv1d(mel_fb) -> log(+1e-4)
        (reference networks/classifiers.py:563-579)."""
        torch = _torch()
        n_fft, hop, n_mel = 1024, 256, 64
        rng = np.random.RandomState(1)
        x = rng.randn(3, 22050).astype(np.float32)
        fb = dsp.mel_filterbank(sr=44100, n_fft=n_fft, n_mels=n_mel, fmin=5.0)

        ours = np.asarray(
            dsp.log_mel_spectrogram(jnp.asarray(x), jnp.asarray(fb), n_fft, hop)
        )

        xt = torch.from_numpy(x)
        spec = torch.stft(
            xt, n_fft=n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), return_complex=True,
        ).abs()
        mel = torch.nn.functional.conv1d(
            spec, torch.from_numpy(fb).unsqueeze(-1)
        )
        theirs = torch.log(mel + 1e-4).numpy()

        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=1e-3)

    def test_pallas_kernel_matches_xla_path(self):
        n_fft, hop, n_mel = 1024, 256, 64
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 22050).astype(np.float32))
        fb = jnp.asarray(dsp.mel_filterbank(44100, n_fft, n_mel, fmin=5.0))
        xla = np.asarray(dsp.log_mel_spectrogram(x, fb, n_fft, hop))
        pallas = np.asarray(
            dsp.log_mel_spectrogram(x, fb, n_fft, hop, use_pallas=True)
        )
        np.testing.assert_allclose(xla, pallas, atol=1e-5, rtol=1e-5)

    def test_featurize_dispatch(self):
        x = jnp.zeros((2, 44100))
        mel = dsp.featurize(x, "mel_2048_1024_128")
        assert mel.shape == (2, 128, dsp.num_stft_frames(44100, 2048, 1024))
        stft = dsp.featurize(x, "stft_1024_256")
        assert stft.shape == (2, 513, dsp.num_stft_frames(44100, 1024, 256))
        raw = dsp.featurize(x, "raw")
        assert raw.shape == (2, 1, 44100)


class TestDescriptors:
    def test_parse(self):
        f = dsp.parse_features("mel_2048_1024_128")
        assert f == dsp.FeatureDescriptor("mel", 2048, 1024, 128)
        assert f.n_features == 128
        assert dsp.parse_features("stft_1024_256").n_features == 513
        assert dsp.parse_features("raw").n_features == 1
        assert dsp.is_mel("mel_2048_1024_128") and not dsp.is_mel("stft_1024_256")
        assert dsp.is_stft("stft_1024_256")
        with pytest.raises(ValueError):
            dsp.parse_features("cqt_512")

    def test_roundtrip(self):
        for d in ("mel_2048_1024_128", "stft_1024_256", "raw"):
            assert dsp.parse_features(d).descriptor == d


class TestHostStft:
    def test_scipy_convention(self):
        """Reference compute_stft passes hop_size as scipy noverlap
        (ops/audio.py:10-19); verify we reproduce that (odd) convention."""
        import scipy.signal

        rng = np.random.RandomState(3)
        x = rng.randn(8192).astype(np.float32)
        ours = dsp.compute_stft_host(x, window_size=2048, hop_size=1024, log=True)
        _, _, s = scipy.signal.stft(x, nperseg=2048, noverlap=1024)
        expected = np.log(np.abs(s) + 1e-4)
        np.testing.assert_allclose(ours, expected, atol=1e-6)
