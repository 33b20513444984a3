"""Fold-MERGED ensemble inference for ``TwoDimensionalCNN`` (eval only).

**Status: NEGATIVE RESULT at bench scale — kept as an opt-in study path,
NOT production.** Model-level hardware A/B (scripts/probe_merged_ensemble.py,
v5e-1, B=64 x 10 s, composed with the frontend): vmapped 48.6 ms, merged
(grouped convs) 58.6 ms, merged (block-diag 1x1 dots) 89.6 ms — despite the
merged layout winning every ISOLATED pass 2.1-2.7x (pools 2.25 vs 5.16 ms,
PReLU 1.99 vs 4.17, 1x1 flat dot 3.34 vs 9.15; scripts/probe_infer_levers.py,
probe_blockdiag_conv.py). In context, XLA's layout/fusion choices around the
grouped convs cost more than the full-lane elementwise passes save — the
same lesson as the round-4 ``fused_infer`` twin: never judge a formulation
below whole-model level.

Original motivation: the stacked-fold ``jax.vmap`` ensemble
(training/ensemble.py) lowers each fold as a separate conv and keeps the
fold axis as an explicit tensor dimension, so every elementwise / pooling
pass runs on tensors whose minor (channel) dimension is the SINGLE-fold
width — C=64/96 in the early blocks, i.e. 50-75% of each (8, 128) vector
register is padding, and a profiler trace of the bench program
(scripts/probe_infer_profile.py) shows those passes are where the time
goes (maxpools ~107 GB/s effective, PReLU ~190 GB/s).

This module re-expresses the SAME computation with the K folds packed into
the channel dimension, fold-major (channel ``g*C + c`` is fold g's channel
c), so that:

- every conv becomes ONE ``feature_group_count=K`` grouped convolution
  (XLA group semantics: output block g convolves input block g with filter
  output slice g — exactly the per-fold conv),
- every BN/PReLU/mask/pool pass runs once on a (B, H, W, K*C) tensor with
  full 128-lane occupancy (measured 2.1-2.3x faster per pass at the
  block0/1 shapes; scripts/probe_infer_levers.py).

Eval-mode BatchNorm is applied as the affine ``x * scale' + bias'`` with
``scale' = gamma / sqrt(var + eps)`` — the same algebra flax uses with
``use_running_average=True``; nothing is folded into conv weights (the
round-4 ``fused_infer`` twin showed weight-folding makes XLA pick worse
layouts at model level — this path deliberately keeps the op sequence
identical to flax and changes ONLY the fold packing).

Reference workload: 5-fold ensemble prediction over the stage-1 test set
(reference predict_2d_cnn.py:81-118); model reference
networks/classifiers.py:483-607.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from freesound_classification_tpu.models.blocks import NEG_INF, block_depths
from freesound_classification_tpu.models.classifiers import (
    add_frequency_encoding,
)

BN_EPS = 1e-5


def _merge(p):
    """(K, C) per-fold channel params -> (K*C,) fold-major merged vector."""
    return p.reshape(-1)


def _bn_eval(x, bn_params, bn_stats, dtype):
    """Eval-mode BatchNorm over merged channels: x * scale' + bias'."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return x * _merge(scale).astype(dtype) + _merge(bias).astype(dtype)


def _prelu(x, alpha, dtype):
    a = _merge(alpha).astype(dtype)
    return jnp.where(x >= 0, x, a * x)


def _grouped_conv(x, kernel, bias, n_folds, dtype, dense_below=0):
    """(B, H, W, K*Ci) x (K, kh, kw, Ci, Co) -> (B, H, W, K*Co).

    Default: one feature_group_count=K grouped conv. 1x1 convs with
    per-fold contraction width ``Ci < dense_below`` instead run as a flat
    (B*H*W, K*Ci) @ (K*Ci, K*Co) matmul against a BLOCK-DIAGONAL matrix:
    K^2/K = Kx the FLOPs (nearly free at small C), but the MXU contracts
    over the full merged K*Ci lanes instead of a starved Ci=64 slice —
    measured 2.7x faster than the grouped 1x1 conv at the block0 shape
    (3.34 vs 9.15 ms). Dense block-diag 3x3 convs were measured SLOWER
    than grouped (18.5 vs 14.1 ms) and are not used. Zero off-diagonal
    blocks contribute exactly 0, so numerics are unchanged
    (scripts/probe_blockdiag_conv.py)."""
    k, kh, kw, ci, co = kernel.shape
    assert k == n_folds
    if kh == 1 and kw == 1 and ci < dense_below:
        mat = jnp.zeros((k * ci, k * co), kernel.dtype)
        for g in range(k):
            mat = mat.at[g * ci:(g + 1) * ci, g * co:(g + 1) * co].set(
                kernel[g, 0, 0])
        b_, h_, w_, _ = x.shape
        out = (x.reshape(-1, k * ci) @ mat.astype(dtype)).reshape(
            b_, h_, w_, k * co)
        return out + _merge(bias).astype(dtype)
    w = jnp.moveaxis(kernel, 0, 3).reshape(kh, kw, ci, k * co).astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n_folds,
        preferred_element_type=dtype,
    )
    return out + _merge(bias).astype(dtype)


def _maxpool_2x2(x):
    """2x2/2 maxpool (reduce-window, matching nn.max_pool incl. the
    per-axis clamp once a static dim hits 1 — ConvBlock2d's short-bucket
    guard). Hardware note: strided-slice max was measured SLOWER than
    reduce-window at these shapes (scripts/probe_infer_levers.py); the win
    comes from the merged-channel layout (2.25 vs 5.16 ms at block1),
    not the pool formulation."""
    import flax.linen as nn

    wh = 2 if x.shape[1] >= 2 else 1
    ww = 2 if x.shape[2] >= 2 else 1
    return nn.max_pool(x, (wh, ww), strides=(wh, ww))


def _mask_time(h, lengths):
    t = jnp.arange(h.shape[2])
    mask = (t[None, :] < lengths[:, None]).astype(h.dtype)
    return h * mask[:, None, :, None]


def _masked_max_pool(h, lengths, n_folds):
    """(B, H, W, K*C) -> (K, B, C) masked global max over (H, W)."""
    t = jnp.arange(h.shape[2])
    mask = (t[None, :] < lengths[:, None])[:, None, :, None]
    pooled = jnp.max(jnp.where(mask, h, NEG_INF), axis=(1, 2))  # (B, K*C)
    b = pooled.shape[0]
    return jnp.moveaxis(pooled.reshape(b, n_folds, -1), 1, 0)


def merged_infer_logits(model, stacked_variables, inputs, frame_lengths,
                        dense_below=0):
    """Eval-mode (K, B, n_classes) logits of a fold-stacked 2d CNN.

    Equivalent to ``jax.vmap(lambda v: model.apply(v, inputs, frame_lengths,
    train=False)["class_logits"])(stacked_variables)`` for
    ``aggregation_type="max"`` models; exactness is tested in
    tests/test_merged_ensemble.py and gated on hardware in tpu_smoke.py.
    """
    if model.aggregation_type != "max":
        raise NotImplementedError(
            "merged ensemble supports aggregation_type='max' only; "
            "use the vmapped path for rnn aggregation")
    params = stacked_variables["params"]
    stats = stacked_variables["batch_stats"]
    k_folds = jax.tree.leaves(params)[0].shape[0]
    dtype = model.dtype

    x = add_frequency_encoding(inputs.astype(dtype))  # (B, H, W, 2)
    # merged input: K copies of the 2 input channels, fold-major
    h = jnp.tile(x, (1, 1, 1, k_folds))
    lengths = frame_lengths
    depths = block_depths(
        model.num_conv_blocks, model.conv_base_depth, model.growth_rate)

    features = []
    for kb in range(model.num_conv_blocks):
        p = params[f"block{kb}"]
        s = stats[f"block{kb}"]
        h = _bn_eval(h, p["bn_in"], s["bn_in"], dtype)
        h = _grouped_conv(h, p["conv"]["kernel"], p["conv"]["bias"],
                          k_folds, dtype, dense_below)
        h = _maxpool_2x2(h)
        h = _bn_eval(h, p["bn_out"], s["bn_out"], dtype)
        h = _prelu(h, p["prelu"]["alpha"], dtype)
        # resnet block
        rp, rs = p["resnet"], s["resnet"]
        identity = h
        h = _grouped_conv(h, rp["conv1"]["kernel"], rp["conv1"]["bias"],
                          k_folds, dtype, dense_below)
        h = _bn_eval(h, rp["bn1"], rs["bn1"], dtype)
        h = _prelu(h, rp["prelu1"]["alpha"], dtype)
        h = _grouped_conv(h, rp["conv2"]["kernel"], rp["conv2"]["bias"],
                          k_folds, dtype, dense_below)
        h = _bn_eval(h, rp["bn2"], rs["bn2"], dtype)
        h = _prelu(h, rp["prelu2"]["alpha"], dtype)
        h = _grouped_conv(h, rp["conv3"]["kernel"], rp["conv3"]["bias"],
                          k_folds, dtype, dense_below)
        h = _bn_eval(h, rp["bn3"], rs["bn3"], dtype)
        h = h + identity
        h = _prelu(h, rp["prelu3"]["alpha"], dtype)

        lengths = jnp.maximum(lengths // 2, 1)
        h = _mask_time(h, lengths)
        if kb >= model.start_deep_supervision_on:
            features.append(_masked_max_pool(h, lengths, k_folds))
        _ = depths  # depths are implicit in the param shapes

    feats = jnp.concatenate(features, axis=-1)  # (K, B, sum C)

    # head: per-fold dense stack — tiny, vmap over the fold axis
    hp, hs = params["head"], stats["head"]

    def head_one(feats_f, p_bn1, s_bn1, w1, b1, p_bn2, s_bn2, alpha, w2, b2):
        g = feats_f * (p_bn1["scale"] / jnp.sqrt(s_bn1["var"] + BN_EPS)
                       ).astype(dtype)
        g = g + (p_bn1["bias"] - s_bn1["mean"] * p_bn1["scale"]
                 / jnp.sqrt(s_bn1["var"] + BN_EPS)).astype(dtype)
        g = g @ w1.astype(dtype) + b1.astype(dtype)
        sc2 = p_bn2["scale"] / jnp.sqrt(s_bn2["var"] + BN_EPS)
        g = g * sc2.astype(dtype) + (
            p_bn2["bias"] - s_bn2["mean"] * sc2).astype(dtype)
        g = jnp.where(g >= 0, g, alpha.astype(dtype) * g)
        return g @ w2.astype(dtype) + b2.astype(dtype)

    logits = jax.vmap(head_one)(
        feats, hp["bn1"], hs["bn1"], hp["fc1"]["kernel"], hp["fc1"]["bias"],
        hp["bn2"], hs["bn2"], hp["prelu"]["alpha"],
        hp["fc2"]["kernel"], hp["fc2"]["bias"])
    return logits.astype(jnp.float32)  # (K, B, n_classes)
