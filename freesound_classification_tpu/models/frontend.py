"""Waveform -> model-input featurization adapter.

The reference featurizes *inside* each model's forward (torch.stft + mel
conv1d, networks/classifiers.py:563-579), re-implemented per model class.
Here featurization is one shared, jit-fused stage between the (augmented)
waveform batch and the pure model: the same compiled program contains
aug -> STFT -> mel -> log -> model, so the split is free at runtime and the
Pallas kernel / descriptor can change without touching models.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from freesound_classification_tpu.ops import dsp


class Frontend:
    """Maps (wave (B, L), sample_lengths (B,)) to model inputs.

    model_family:
      "2d"  -> spectrogram image (B, F, T, 1)   [TwoDimensionalCNN, backbone]
      "1d"  -> per-frame features (B, T, F)     [HierarchicalCNN, APC, CPC]
    """

    def __init__(
        self,
        descriptor: str,
        model_family: str,
        sr: int = 44100,
        use_pallas: bool = False,
        dft_precision: str = "high",
    ):
        self.descriptor = descriptor
        self.feat = dsp.parse_features(descriptor)
        self.model_family = model_family
        self.sr = sr
        self.use_pallas = use_pallas
        # "default" = single-bf16-pass block-DFT (~3x the "high" matmul
        # throughput, ~4e-3 relative spectrum error) — sound whenever the
        # model consumes bf16 inputs; "high" is the torch-parity oracle
        self.dft_precision = dft_precision
        if self.feat.kind == "mel":
            self.filterbank = jnp.asarray(
                dsp.mel_filterbank(
                    sr=sr, n_fft=self.feat.n_fft, n_mels=self.feat.n_mel, fmin=5.0
                )
            )
        else:
            self.filterbank = None

    @property
    def n_features(self) -> int:
        return self.feat.n_features

    def frame_count(self, length: int) -> int:
        return dsp.feature_frames(length, self.descriptor)

    def frame_lengths(self, sample_lengths: jnp.ndarray) -> jnp.ndarray:
        """Valid feature frames per sample given valid waveform samples."""
        if self.feat.kind == "raw":
            return sample_lengths
        return sample_lengths // self.feat.hop_size + 1

    def __call__(self, wave: jnp.ndarray, sample_lengths: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        spec = dsp.featurize(
            wave,
            self.descriptor,
            filterbank=self.filterbank,
            use_pallas=self.use_pallas,
            precision=self.dft_precision,
        )  # (B, F, T) — or (B, 1, L) for raw
        n_frames = spec.shape[-1]
        frame_lengths = jnp.minimum(
            self.frame_lengths(sample_lengths), n_frames
        ).astype(jnp.int32)
        if self.model_family == "2d":
            inputs = spec[..., None]  # (B, F, T, 1)
        elif self.model_family == "1d":
            inputs = jnp.swapaxes(spec, -1, -2)  # (B, T, F)
        else:
            raise ValueError(f"unknown model family {self.model_family!r}")
        return inputs, frame_lengths


MODEL_FAMILY = {
    "2d_cnn": "2d",
    "backbone_cnn": "2d",
    "hierarchical_cnn": "1d",
    "apc": "1d",
    "cpc": "1d",
}
