"""APC — Autoregressive Predictive Coding (reference networks/apc.py:19-83).

LayerNorm (no affine) -> unidirectional LSTM stack -> output LayerNorm ->
per-step linear heads regressing the input ``step`` frames ahead with L1 loss.

Input is the per-frame feature sequence (B, T, F) from the shared on-device
frontend. (In the reference, AudioFeatures' CPU featurization is commented
out — transforms.py:212-216 — so the shipped script would feed raw waveform
into a LayerNorm sized for feature frames; this implementation follows the
model's evident intent: STFT/mel frames in, as in the APC paper.)

Losses are masked to valid frames (the reference averages padding in,
apc.py:71-73; with length-bucketed batches masking is required for results
not to depend on the bucket).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from freesound_classification_tpu.models.blocks import time_mask


class APCModel(nn.Module):
    rnn_size: int = 256
    rnn_layers: int = 3
    prediction_steps: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, frame_lengths, train: bool = False):
        # feats: (B, T, F)
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name="input_norm"
        )(feats.astype(self.dtype))

        h = x
        for layer in range(self.rnn_layers):
            h = nn.RNN(
                nn.OptimizedLSTMCell(self.rnn_size, dtype=self.dtype),
                name=f"lstm{layer}",
            )(h, seq_lengths=frame_lengths)
        output = nn.LayerNorm(dtype=self.dtype, name="output_norm")(h)

        n_frames = feats.shape[1]
        input_dim = feats.shape[-1]

        loss_terms = []
        predictions = []
        mask_full = time_mask(frame_lengths, n_frames)
        for step in range(1, self.prediction_steps + 1):
            pred = nn.Dense(
                input_dim, dtype=self.dtype, name=f"prediction_{step}"
            )(output[:, :-step, :])
            predictions.append(pred)
            # predict normalized input `step` frames ahead (apc.py:65-66);
            # targets detached as in the reference (signal.detach())
            tgt = jax.lax.stop_gradient(x[:, step:, :])
            err = jnp.sum(jnp.abs(tgt - pred), axis=-1)  # (B, T-step)
            # a position t is valid iff t+step is a valid frame
            m = mask_full[:, step:]
            loss = jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
            loss_terms.append(loss.astype(jnp.float32))

        return {
            "loss_terms": loss_terms,
            "output": output.astype(jnp.float32),
            "predictions": predictions,
        }
