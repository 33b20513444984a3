"""Native C++ audio core vs the Python oracle."""

import numpy as np
import pytest

from freesound_classification_tpu import native
from freesound_classification_tpu.data import audio_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built and no toolchain"
)


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.RandomState(0)
    path = str(d / "a.wav")
    x = (rng.randn(12345) * 0.3).astype(np.float32)
    audio_io.write_wav(path, x, 44100)
    return path, x


class TestNativeDecode:
    def test_info_matches_header(self, wav):
        path, x = wav
        frames, sr = native.wav_info(path)
        assert frames == x.size and sr == 44100

    def test_decode_matches_python_oracle(self, wav):
        path, _ = wav
        a, sr_a = native.read_wav(path)
        import scipy.io.wavfile as wavfile

        sr_b, raw = wavfile.read(path)
        b = raw.astype(np.float32) / 32768.0
        assert sr_a == sr_b
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_padded_row_decode(self, wav):
        path, x = wav
        row = np.empty(20000, dtype=np.float32)
        n, sr = native.read_wav_into(path, row)
        assert n == x.size and sr == 44100
        assert np.all(row[n:] == 0.0)
        a, _ = native.read_wav(path)
        np.testing.assert_array_equal(row[:n], a)

    def test_truncating_row_decode(self, wav):
        path, x = wav
        row = np.empty(1000, dtype=np.float32)
        n, _ = native.read_wav_into(path, row)
        assert n == 1000

    def test_resample_linear(self):
        t = np.linspace(0, 1, 1000, dtype=np.float32)
        out = native.resample_linear(t, 500)
        assert out.size == 500
        np.testing.assert_allclose(out, np.linspace(0, 1, 500), atol=2e-3)

    def test_stereo_downmix(self, tmp_path):
        import wave as wave_mod

        sr = 8000
        left = (np.sin(np.linspace(0, 20, 4000)) * 0.5)
        right = np.zeros(4000)
        inter = np.empty(8000, dtype=np.int16)
        inter[0::2] = (left * 32767).astype(np.int16)
        inter[1::2] = (right * 32767).astype(np.int16)
        path = str(tmp_path / "st.wav")
        with wave_mod.open(path, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(inter.tobytes())
        a, sr_out = native.read_wav(path)
        assert sr_out == sr and a.size == 4000
        np.testing.assert_allclose(a, left / 2, atol=1e-3)

    def test_audio_io_routes_through_native(self, wav):
        path, _ = wav
        a, sr = audio_io.read_wav(path)
        b, _ = native.read_wav(path)
        np.testing.assert_array_equal(a, b)
