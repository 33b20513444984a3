"""Clip dataset: manifest -> decoded, label-mapped, length-indexed clips.

Counterpart of reference datasets/sound_dataset.py (SoundDataset) plus the
host-side parts of the transform pipeline (LoadAudio, SampleLongAudio,
MapLabels — ops/transforms.py:111-125, 292-309, 25-41). Everything that
changes *values* but not *shape* (mixup, effects, cutout, shuffle) moved
on-device (ops/augment.py); the host keeps only what decides shapes: decode
and the long-clip random crop.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from freesound_classification_tpu.data import audio_io
from freesound_classification_tpu.data.folds import binarize_label_strings


def load_classmap(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def class_names_from_classmap(classmap: dict) -> list:
    """Sorted-by-index class names (reference ops/utils.py:34-36)."""
    rev = {v: k for k, v in classmap.items()}
    return [rev[i] for i in sorted(classmap.values())]


class ClipDataset:
    """Map-style dataset over audio files with optional labels.

    Parameters mirror reference SoundDataset(audio_files, labels, is_noisy)
    (datasets/sound_dataset.py:14-24), with labels pre-binarized via the
    classmap and an optional train-time random crop of long clips
    (max_audio_length seconds, reference transforms.py:292-309).
    """

    def __init__(
        self,
        audio_files: Sequence[str],
        raw_labels: Optional[Sequence[str]] = None,
        classmap: Optional[dict] = None,
        is_noisy: Optional[Sequence] = None,
        max_audio_length: Optional[float] = None,
        sr: int = 44100,
        seed: int = 42,
    ):
        self.audio_files = list(audio_files)
        self.sr = sr
        self.max_audio_length = max_audio_length
        self.seed = seed
        if raw_labels is not None:
            assert classmap is not None
            label_strings = [
                ",".join(l) if isinstance(l, (list, tuple)) else str(l)
                for l in raw_labels
            ]
            self.labels = binarize_label_strings(label_strings, classmap)
        else:
            self.labels = None
        self.n_classes = len(classmap) if classmap else 0
        self.is_noisy = (
            np.asarray(is_noisy, dtype=np.float32)
            if is_noisy is not None
            else np.zeros(len(self.audio_files), dtype=np.float32)
        )
        self._lengths: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.audio_files)

    @property
    def lengths(self) -> np.ndarray:
        """Per-clip sample counts (post-crop cap), header-only scan."""
        if self._lengths is None:
            lens = np.empty(len(self), dtype=np.int64)
            for i, path in enumerate(self.audio_files):
                n, file_sr = audio_io.wav_length(path)
                if file_sr != self.sr:
                    n = int(round(n * self.sr / file_sr))
                lens[i] = n
            if self.max_audio_length is not None:
                lens = np.minimum(
                    lens, int(self.max_audio_length * self.sr)
                )
            self._lengths = np.maximum(lens, 1)
        return self._lengths

    def decode(self, index: int, train: bool = False,
               epoch: int = 0) -> np.ndarray:
        """Decode clip ``index``; random-crop long clips when training.

        The crop offset comes from a per-call RandomState keyed on
        (seed, epoch, index): deterministic under a fixed seed and safe
        under the loader's thread-pool workers (a shared RandomState is
        not thread-safe and raced in round 1)."""
        audio, file_sr = audio_io.read_wav(self.audio_files[index])
        if file_sr != self.sr:
            audio = audio_io.resample(audio, file_sr, self.sr)
        if self.max_audio_length is not None:
            max_len = int(self.max_audio_length * self.sr)
            if audio.size > max_len:
                if train:
                    rng = np.random.RandomState(
                        (self.seed * 1_000_003 + epoch * 9_973 + index)
                        % (2**32)
                    )
                    start = rng.randint(0, audio.size - max_len)
                else:
                    start = 0
                audio = audio[start : start + max_len]
        if audio.size == 0:
            audio = np.zeros(1, dtype=np.float32)
        return audio

    def sample_meta(self, index: int):
        label = (
            self.labels[index]
            if self.labels is not None
            else np.zeros(self.n_classes, dtype=np.float32)
        )
        return label, self.is_noisy[index]


def manifest_from_dataframe(
    df, data_dir: str, fname_col: str = "fname", labels_col: str = "labels"
):
    """(files, raw_labels) from a FSDKaggle2019-style dataframe
    (reference train_2d_cnn.py:301-309)."""
    files = [os.path.join(data_dir, f) for f in df[fname_col].values]
    labels = (
        [str(v) for v in df[labels_col].values] if labels_col in df else None
    )
    return files, labels
