"""Adversarial train-vs-test domain discriminator
(reference adversarial_test.py:116-151 local ``Model``).

Per-frame features -> 1d conv tower (1x1 -> Resnet -> pool -> 3 -> Resnet ->
pool -> 3 -> Resnet) -> per-frame sigmoid domain head; clip score = max over
frames. Used as a dataset-shift diagnostic: AUC near 0.5 means train and test
are indistinguishable.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from freesound_classification_tpu.models.blocks import (
    ResnetBlock1d,
    _bn,
    masked_max_pool_time,
)


class DomainDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, frame_lengths, train: bool = False):
        h = feats.astype(self.dtype)  # (B, T, F)
        lengths = frame_lengths
        h = _bn(train, self.dtype, name="bn0")(h)
        h = nn.Conv(32, (1,), dtype=self.dtype, name="conv0")(h)
        h = ResnetBlock1d(32, self.dtype, name="res0")(h, train)
        h = nn.max_pool(h, (2,), strides=(2,))
        lengths = jnp.maximum(lengths // 2, 1)
        h = _bn(train, self.dtype, name="bn1")(h)
        h = nn.Conv(32, (3,), padding="VALID", dtype=self.dtype,
                    name="conv1")(h)
        h = ResnetBlock1d(32, self.dtype, name="res1")(h, train)
        h = nn.max_pool(h, (2,), strides=(2,))
        lengths = jnp.maximum((lengths - 2) // 2, 1)
        h = _bn(train, self.dtype, name="bn2")(h)
        h = nn.Conv(64, (3,), padding="VALID", dtype=self.dtype,
                    name="conv2")(h)
        h = ResnetBlock1d(64, self.dtype, name="res2")(h, train)
        lengths = jnp.maximum(lengths - 2, 1)

        h = _bn(train, self.dtype, name="bn_head")(h)
        frame_logits = nn.Conv(1, (1,), dtype=self.dtype, name="head")(h)
        frame_probs = nn.sigmoid(frame_logits)[..., 0]  # (B, T')
        lengths = jnp.minimum(lengths, frame_probs.shape[1])
        pooled = masked_max_pool_time(frame_probs[..., None], lengths)[:, 0]
        return {
            "domain_prob": pooled.astype(jnp.float32),
            "frame_probs": frame_probs.astype(jnp.float32),
        }
