"""Classifier model families as pure Flax modules.

TPU-native counterparts of reference networks/classifiers.py:
- ``TwoDimensionalCNN``  — 2d mel-spectrogram CNN with the frequency-encoding
                           channel (reference :483-607)
- ``HierarchicalCNN``    — 1d conv tower over raw-STFT/mel/raw features with
                           deep supervision (reference :107-217)
- ``CNNBackbone``        — resnet18/34 trunk on the 3-channel spectrogram
                           (reference :896-1249; see backbone.py)

Design differences from the reference (deliberate, TPU-first):
- Models are *pure functions over spectrograms*: featurization (STFT->mel->log)
  lives in ``ops.dsp.featurize`` and is fused into the same jitted step, so
  the Pallas kernel can be swapped without touching models.
- Layout is channels-last ((B, T, F) / (B, H, W, C)) — XLA TPU's native conv
  layout — instead of torch's channels-first.
- Every aggregation is length-masked so logits are invariant to the length
  bucket a clip was padded into (the reference relies on maxpool over
  log(1e-4) padding being usually-inert; here it is exact — SURVEY.md §7).
- There is no train loop in the model (the reference duplicates one per
  class); training lives once in ``training.engine``.
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from freesound_classification_tpu.models.blocks import (
    ConvBlock1d,
    ConvBlock2d,
    MLPHead,
    MaskedBiGRU,
    block_depths,
    mask_time,
    mask_time_2d,
    masked_max_pool_2d,
    masked_max_pool_time,
)

RNN_SIZE = 128  # reference networks/classifiers.py:125, :509


def add_frequency_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """Append a linspace(-1, 1, H) channel broadcast over time.

    reference networks/classifiers.py:553-561 (``_add_frequency_encoding``) —
    worth >= +0.005 lwlrap per the reference README. x: (B, H, W, C).
    """
    b, h, w, _ = x.shape
    vertical = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
    vertical = jnp.broadcast_to(vertical[None, :, None, None], (b, h, w, 1))
    return jnp.concatenate([x, vertical], axis=-1)


class TwoDimensionalCNN(nn.Module):
    """2d CNN over (log-mel) spectrogram images (reference :483-607).

    Input: spectrogram (B, H=n_features, W=n_frames, 1) plus per-sample valid
    frame counts. The frequency-encoding channel is appended internally
    (input channels = 2, reference :504).
    """

    num_conv_blocks: int = 5
    start_deep_supervision_on: int = 2
    conv_base_depth: int = 64
    growth_rate: float = 2.0
    output_dropout: float = 0.0
    aggregation_type: str = "max"  # "max" | "rnn"
    n_classes: int = 80
    dtype: jnp.dtype = jnp.float32
    # eval-mode forwards use the one-pass fused Pallas resnet block
    # (ops/pallas_resnet.py); training/init paths are unaffected and the
    # checkpoint layout is identical either way
    fused_infer: bool = False
    # eval-mode block0 head (conv+pool+BN+PReLU) as one fused Pallas pass
    # (ops/pallas_head.py) — the full-res conv0 map never touches HBM.
    # RETIRED from production (model-level 0.68x, docs/STUDIES.md).
    fused_head: bool = False
    # eval-mode phase-decomposed conv+pool (blocks.phase_conv_pool_2d):
    # True/False for all blocks, or a per-block tuple of bools
    phase_pool: Union[bool, Sequence[bool]] = False

    def _phase_pool_for(self, k: int) -> bool:
        if isinstance(self.phase_pool, (tuple, list)):
            return bool(self.phase_pool[k]) if k < len(self.phase_pool) \
                else False
        return bool(self.phase_pool)

    @nn.compact
    def __call__(self, spec, frame_lengths, train: bool = False):
        x = add_frequency_encoding(spec.astype(self.dtype))
        depths = block_depths(
            self.num_conv_blocks, self.conv_base_depth, self.growth_rate
        )

        features = []
        h = x
        lengths = frame_lengths
        for k, depth in enumerate(depths):
            h = ConvBlock2d(depth, self.dtype,
                            fused_infer=self.fused_infer,
                            fused_head=self.fused_head,
                            phase_pool=self._phase_pool_for(k),
                            name=f"block{k}")(h, train)
            lengths = jnp.maximum(lengths // 2, 1)
            h = mask_time_2d(h, lengths)
            if k >= self.start_deep_supervision_on:
                if self.aggregation_type == "max":
                    features.append(masked_max_pool_2d(h, lengths))
                elif self.aggregation_type == "rnn":
                    # mean over frequency, then biGRU final states
                    # (reference :593-597)
                    rnn_in = jnp.mean(h, axis=1)  # (B, W, C)
                    features.append(
                        MaskedBiGRU(RNN_SIZE, self.dtype, name=f"rnn{k}")(
                            rnn_in, lengths
                        )
                    )
                else:
                    raise ValueError(
                        f"unknown aggregation_type {self.aggregation_type!r}"
                    )

        feats = jnp.concatenate(features, axis=-1)
        logits = MLPHead(
            feats.shape[-1],
            self.n_classes,
            self.output_dropout,
            self.dtype,
            name="head",
        )(feats, train)
        return {"class_logits": logits.astype(jnp.float32)}


class HierarchicalCNN(nn.Module):
    """1d conv tower over per-frame features (reference :107-217).

    Input: features (B, T, F) — raw STFT bins, mel bands, or raw samples
    (F=1) — plus per-sample valid frame counts.
    """

    num_conv_blocks: int = 5
    start_deep_supervision_on: int = 2
    conv_base_depth: int = 64
    growth_rate: float = 2.0
    output_dropout: float = 0.0
    aggregation_type: str = "max"
    n_classes: int = 80
    dtype: jnp.dtype = jnp.float32
    # eval-mode forwards use the one-pass fused lane-roll Pallas resnet
    # block (ops/pallas_resnet1d.py); training/init paths are unaffected
    # and the checkpoint layout is identical either way
    fused_infer: bool = False
    # eval-mode phase-decomposed conv+pool (blocks.phase_conv_pool_1d):
    # True/False for all blocks, or a per-block tuple of bools
    phase_pool: Union[bool, Sequence[bool]] = False

    def _phase_pool_for(self, k: int) -> bool:
        if isinstance(self.phase_pool, (tuple, list)):
            return bool(self.phase_pool[k]) if k < len(self.phase_pool) \
                else False
        return bool(self.phase_pool)

    @nn.compact
    def __call__(self, feats_ntc, frame_lengths, train: bool = False):
        depths = block_depths(
            self.num_conv_blocks, self.conv_base_depth, self.growth_rate
        )

        features = []
        h = feats_ntc.astype(self.dtype)
        lengths = frame_lengths
        for k, depth in enumerate(depths):
            h = ConvBlock1d(depth, self.dtype,
                            fused_infer=self.fused_infer,
                            phase_pool=self._phase_pool_for(k),
                            name=f"block{k}")(h, train)
            lengths = jnp.maximum(lengths // 2, 1)
            h = mask_time(h, lengths)
            if k >= self.start_deep_supervision_on:
                if self.aggregation_type == "max":
                    features.append(masked_max_pool_time(h, lengths))
                elif self.aggregation_type == "rnn":
                    features.append(
                        MaskedBiGRU(RNN_SIZE, self.dtype, name=f"rnn{k}")(
                            h, lengths
                        )
                    )
                else:
                    raise ValueError(
                        f"unknown aggregation_type {self.aggregation_type!r}"
                    )

        feats = jnp.concatenate(features, axis=-1)
        logits = MLPHead(
            feats.shape[-1],
            self.n_classes,
            self.output_dropout,
            self.dtype,
            name="head",
        )(feats, train)
        return {"class_logits": logits.astype(jnp.float32)}


def build_classifier(model_kind: str, config, n_classes: int, dtype=jnp.float32,
                     fused_infer: bool = False, fused_head: bool = False,
                     phase_pool=False):
    """Construct a classifier module from a network config namespace.

    ``config`` needs: num_conv_blocks, start_deep_supervision_on,
    conv_base_depth, growth_rate, output_dropout, aggregation_type
    (the reference CLI flag surface, train_2d_cnn.py:118-146).
    ``fused_infer`` routes eval-mode 2d resnet blocks through the fused
    Pallas kernel (RETIRED from production — model-level regression,
    docs/STUDIES.md; kept opt-in).
    ``fused_head`` routes eval-mode small-C_in ConvBlock2d heads (block0)
    through the fused conv+pool Pallas kernel (ops/pallas_head.py);
    RETIRED from production (model-level 0.68x, docs/STUDIES.md).
    ``phase_pool`` (bool or per-block tuple) routes eval-mode conv+pool
    heads through the phase-decomposed pure-XLA lowering
    (blocks.phase_conv_pool_2d/_1d) — bit-exact, no-op for init/training,
    checkpoint-identical; inference CLIs flip it per the model-level
    hardware A/B (scripts/probe_phase_pool.py).
    """
    common = dict(
        num_conv_blocks=int(config.num_conv_blocks),
        start_deep_supervision_on=int(config.start_deep_supervision_on),
        conv_base_depth=int(config.conv_base_depth),
        growth_rate=float(config.growth_rate),
        output_dropout=float(config.output_dropout),
        aggregation_type=str(config.aggregation_type),
        n_classes=n_classes,
        dtype=dtype,
    )
    if model_kind == "2d_cnn":
        return TwoDimensionalCNN(fused_infer=fused_infer,
                                 fused_head=fused_head,
                                 phase_pool=phase_pool, **common)
    if model_kind == "hierarchical_cnn":
        return HierarchicalCNN(fused_infer=fused_infer,
                               phase_pool=phase_pool, **common)
    if model_kind == "backbone_cnn":
        from freesound_classification_tpu.models.backbone import CNNBackbone

        return CNNBackbone(
            arch=str(getattr(config, "backbone", "resnet18")),
            output_dropout=float(config.output_dropout),
            n_classes=n_classes,
            dtype=dtype,
            fused_infer=fused_infer,
        )
    raise ValueError(f"unknown model kind {model_kind!r}")
