"""CPC — Contrastive Predictive Coding (reference networks/cpc.py:20-115).

Causal strided-conv encoder z -> GRU context c -> per-step 1x1 couplings
a_k(c); logits z . a_k(c) scored with BCE against a shifted-identity target
(each context step must recognize its own encoder step k frames ahead among
all steps of the clip).

Input is the per-frame feature sequence (B, T, F) from the shared frontend
(see apc.py docstring on the reference's featurization bit-rot). The (T', T')
score matrix is a plain matmul — MXU-shaped. Positions beyond a clip's valid
frames are masked out of the BCE mean.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from freesound_classification_tpu.models.blocks import PReLU, _bn, time_mask


class CausalConv1d(nn.Module):
    """Left-padded strided conv: output at t sees inputs <= t only
    (reference cpc.py:20-31 pads by kernel_size and trims the tail)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size - 1
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(
            self.features,
            (self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)


class CPCModel(nn.Module):
    n_encoder_layers: int = 5
    conv_base_depth: int = 32
    growth_rate: float = 2.0
    context_size: int = 256
    prediction_steps: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, frame_lengths, train: bool = False):
        # encoder (reference cpc.py:44-65): BN on input, then causal
        # stride-2 convs with PReLU, closing BN
        h = feats.astype(self.dtype)
        lengths = frame_lengths
        h = _bn(train, self.dtype, name="input_bn")(h)
        for k in range(self.n_encoder_layers):
            depth = int(self.growth_rate**k * self.conv_base_depth)
            h = CausalConv1d(
                depth, kernel_size=3, stride=2, dtype=self.dtype,
                name=f"enc{k}",
            )(h)
            h = PReLU(depth, name=f"prelu{k}")(h)
            lengths = jnp.maximum((lengths + 1) // 2, 1)
        z = _bn(train, self.dtype, name="output_bn")(h)  # (B, S, D)
        lengths = jnp.minimum(lengths, z.shape[1])

        # context network (cpc.py:67-71, 90)
        c = nn.RNN(
            nn.GRUCell(self.context_size, dtype=self.dtype), name="context"
        )(z, seq_lengths=lengths)  # (B, S, C)

        s = z.shape[1]
        valid = time_mask(lengths, s)  # (B, S)
        pair_mask = valid[:, :, None] * valid[:, None, :]

        loss_terms = []
        for step in range(1, self.prediction_steps + 1):
            a = nn.Dense(
                z.shape[-1], dtype=self.dtype, name=f"coupling_{step}"
            )(c)  # (B, S, D)
            logits = jnp.einsum(
                "bsd,btd->bst", z, a, preferred_element_type=jnp.float32
            )  # (B, S, S): score of encoder step s against context step t
            # shifted identity target (cpc.py:102-104): context t should
            # select encoder step t + step
            eye = jnp.eye(s - step) if s > step else jnp.zeros((0, 0))
            labels = jnp.pad(eye, ((step, 0), (0, step)))
            labels = jnp.broadcast_to(labels[None], logits.shape)
            per_elem = (
                labels * jax.nn.softplus(-logits)
                + (1.0 - labels) * jax.nn.softplus(logits)
            )
            loss = jnp.sum(per_elem * pair_mask) / jnp.maximum(
                jnp.sum(pair_mask), 1.0
            )
            loss_terms.append(loss.astype(jnp.float32))

        return {
            "loss_terms": loss_terms,
            "z": z.astype(jnp.float32),
            "output": c.astype(jnp.float32),
        }
