"""Audio file I/O without librosa/soundfile.

The reference reads via ``librosa.load(sr=None)`` — native sample rate, mono
float32 (reference ops/audio.py:27-29). FSDKaggle2019 audio is 16-bit PCM WAV
at 44.1 kHz, so a from-scratch WAV path (stdlib/scipy + polyphase resampling)
covers the dataset with no native-library dependency. A C++ fast path
(``native/``) accelerates bulk decode when built; this module is the always-
available fallback and the correctness oracle for it.
"""

from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np


def _native():
    """The C++ decode core (native/fsd_audio.cpp), or None."""
    try:
        from freesound_classification_tpu import native

        return native if native.available() else None
    except Exception:
        return None


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono waveform in [-1, 1], sample_rate).

    Matches librosa.load(sr=None, mono=True) conventions: integer PCM scaled
    by 2**(bits-1), multi-channel averaged to mono. Uses the native C++
    decoder when built; this Python path is the fallback and oracle.
    """
    native = _native()
    if native is not None:
        try:
            return native.read_wav(path)
        except ValueError:
            pass  # non-RIFF edge case: fall through to scipy
    import scipy.io.wavfile as wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype in (np.float32, np.float64):
        audio = data.astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV dtype {data.dtype} in {path}")
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    return np.ascontiguousarray(audio, dtype=np.float32), int(sr)


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Reference ops/audio.py:27-29 equivalent (WAV-backed)."""
    return read_wav(path)


def wav_length(path: str) -> Tuple[int, int]:
    """(n_frames, sample_rate) from the WAV header only — no decode.

    Used to build the length index for bucketed batching without touching
    sample data (the reference's BucketingSampler needs dataset.lengths,
    ops/padding.py:49).
    """
    native = _native()
    if native is not None:
        try:
            return native.wav_info(path)
        except ValueError:
            pass
    with wave.open(path, "rb") as w:
        return w.getnframes(), w.getframerate()


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Write float32 [-1, 1] mono audio as 16-bit PCM (test/synthetic data)."""
    audio = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    pcm = (audio * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy), e.g. for non-44.1k inputs."""
    if sr == target_sr:
        return audio
    import math

    import scipy.signal

    g = math.gcd(sr, target_sr)
    return scipy.signal.resample_poly(
        audio, target_sr // g, sr // g
    ).astype(np.float32)
