"""ctypes bindings for the native audio core (fsd_audio.cpp).

Loads ``libfsdaudio.so`` (building it with ``make`` on first use if a
toolchain is available); ``available()`` gates every call so the pure-Python
path in ``data.audio_io`` remains the universal fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfsdaudio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _HERE], capture_output=True, timeout=120,
                check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.fsd_wav_info.restype = ctypes.c_int
    lib.fsd_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fsd_read_wav.restype = ctypes.c_int64
    lib.fsd_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fsd_read_wav_padded.restype = ctypes.c_int64
    lib.fsd_read_wav_padded.argtypes = lib.fsd_read_wav.argtypes
    lib.fsd_resample_linear.restype = None
    lib.fsd_resample_linear.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Tuple[int, int]:
    """(frames, sample_rate) from the header only."""
    lib = _load()
    assert lib is not None
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.fsd_wav_info(path.encode(), ctypes.byref(frames),
                          ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"fsd_wav_info failed ({rc}) for {path}")
    return int(frames.value), int(sr.value)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode to mono float32 (native C++ path)."""
    lib = _load()
    assert lib is not None
    frames, _ = wav_info(path)
    out = np.empty(max(frames, 1), dtype=np.float32)
    sr = ctypes.c_int32()
    n = lib.fsd_read_wav(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
        ctypes.byref(sr),
    )
    if n < 0:
        raise ValueError(f"fsd_read_wav failed ({n}) for {path}")
    return out[: max(int(n), 1)], int(sr.value)


def read_wav_into(path: str, row: np.ndarray) -> Tuple[int, int]:
    """Decode straight into a padded batch row; zero-fills the tail.
    Returns (valid_samples, sample_rate)."""
    lib = _load()
    assert lib is not None
    assert row.dtype == np.float32 and row.flags.c_contiguous
    sr = ctypes.c_int32()
    n = lib.fsd_read_wav_padded(
        path.encode(),
        row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        row.size,
        ctypes.byref(sr),
    )
    if n < 0:
        raise ValueError(f"fsd_read_wav_padded failed ({n}) for {path}")
    return int(n), int(sr.value)


def resample_linear(audio: np.ndarray, target_len: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = np.empty(target_len, dtype=np.float32)
    lib.fsd_resample_linear(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len,
    )
    return out
