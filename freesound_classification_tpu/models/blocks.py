"""Shared Flax building blocks (NHWC / NTC layouts, TPU-native).

Counterparts of the reference's torch blocks:
- ``PReLU``          — per-channel PReLU (torch nn.PReLU(depth))
- ``ResnetBlock1d``  — reference networks/classifiers.py:37-69
- ``ResnetBlock2d``  — reference networks/classifiers.py:72-104
- ``ConvBlock1d/2d`` — the outer per-stage block: BN -> Conv(3) -> MaxPool(2)
                       -> BN -> PReLU -> ResnetBlock
                       (reference networks/classifiers.py:147-161, 524-538)
- ``masked_max_pool_time`` / ``MaskedBiGRU`` — the deep-supervision
  aggregators, made padding-exact for length-bucketed static shapes
  (the TPU answer to the reference's dynamic pad-to-batch-max;
  SURVEY.md §2b / §5 long-context notes)

Layouts are channels-last throughout (NHWC for 2d, (B, T, C) for 1d) — the
native layout for XLA TPU convolutions — where the reference uses NCHW/NCT.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30

# Backward implementation for the towers' non-overlapping MaxPool(2):
# "xla" = reduce_window's derived select-and-scatter VJP (PRODUCTION);
# "masked" = ops/pooling.py custom VJP (elementwise first-max routing,
# bit-exact vs select-and-scatter incl. ties, tests/test_pooling.py) —
# measured SLOWER on v5e in both formulations (strided-subgrid 61.8 ms,
# repeat+unit-shift 17.2 ms vs select-and-scatter's 8.0 isolated; whole
# step 62 vs 45 ms, scripts/probe_maxpool_bwd.py), kept as the documented
# study (docs/STUDIES.md).
POOL_BWD_IMPL = "xla"

# Forward lowering is nn.max_pool / lax.reduce_window everywhere: a full
# lowering study (scripts/probe_pool_rank.py, v5e-1, merged block0 shape
# (320,128,431,64) bf16) found reduce-window IS the floor — pair-split
# reshape+max 1.14x slower, 4-slice max 1.22x, two-stage strided maximum
# 2.3x, custom_vmap fold-merging a wash at model level, and the
# "free (W,C)->(W//2,2C) lane-pairing view" 2.4x slower because trailing
# reshapes are physical relayouts under TPU tiled layouts, not views.
# The ~145 GB/s effective bandwidth of this pool is intrinsic to the
# half-lane C=64-minor bf16 tiles, not to the lowering.


def _max_pool(h: jnp.ndarray, window: tuple) -> jnp.ndarray:
    if POOL_BWD_IMPL == "masked":
        from freesound_classification_tpu.ops.pooling import (
            max_pool_nonoverlap,
        )

        return max_pool_nonoverlap(h, window)
    return nn.max_pool(h, window, strides=window)


def _phase_pad(n: int, phase: int) -> tuple:
    """SAME-conv padding for one stride-2 pool-phase conv along an axis.

    For a k=3 SAME conv followed by max_pool(2, stride 2, VALID), pooled
    output j along this axis takes conv outputs {2j, 2j+1}; the phase-p
    stride-2 conv must emit exactly out = n//2 elements at positions
    2j + p.  Conv output index i covers input [i*2 - lo, ...], and the
    stride-1 SAME conv centres tap 1 on the output position, so
    lo = 1 - p; hi is the smallest of {0, 1} reaching out elements
    (exact for every n >= 2, see tests/test_phase_pool.py).

    CONTRACT: kernel size 3, pool window/stride 2, phase in {0, 1} only —
    the lo = 1 - phase centring is k=3-specific and hi assumes stride 2.
    """
    assert phase in (0, 1), f"_phase_pad: phase must be 0 or 1, got {phase}"
    out = n // 2
    lo = 1 - phase
    hi = 0 if (n + lo - 3) // 2 + 1 >= out else 1
    return (lo, hi)


def phase_conv_pool_2d(h: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, window: tuple,
                       dtype) -> jnp.ndarray:
    """conv3x3(SAME) -> max_pool(window, stride=window) with the full-
    resolution conv map never materialized: one stride-2 conv per pool
    phase (shared kernel, phase-specific padding) + ONE elementwise max.

    Why: scripts/probe_pool_rank.py measured the reduce-window pool at
    ~145 GB/s effective on the merged block0 map — intrinsic to windowed
    reads of half-lane C=64-minor bf16 tiles, not to the lowering — and
    bound the avoided-materialization prize at ~10.7 ms of the 5-fold
    predict program. The Pallas fused-head kernel harvesting the same
    prize LOST at model level to its custom-call integration boundary
    (docs/STUDIES.md); this is the pure-XLA lowering that fuses through:
    each phase conv computes exactly the contractions the stride-1 conv
    computes at the surviving positions (bit-exact, tests/
    test_phase_pool.py), the 4 quarter-size outputs stream through one
    elementwise maximum (with bn_out/PReLU fused behind it), and no
    full-resolution tensor is ever written or windowed-read.

    Eval-mode only (the select-and-scatter VJP of reduce_window is the
    proven training backward, scripts/probe_maxpool_bwd.py). Pool-clamped
    axes (window 1) run a single stride-1 SAME phase.
    """
    wh, ww = window
    assert wh in (1, 2) and ww in (1, 2), (
        f"phase_conv_pool_2d: pool window must be 1 or 2 per axis, got "
        f"{window} (_phase_pad is stride-2-specific)")
    assert kernel.shape[:2] == (3, 3), (
        f"phase_conv_pool_2d: k=3 kernels only, got {kernel.shape}")
    h = h.astype(dtype)
    kernel = kernel.astype(dtype)
    bias = bias.astype(dtype)
    outs = []
    for ph in range(wh):
        for pw in range(ww):
            pad = (
                _phase_pad(h.shape[1], ph) if wh == 2 else (1, 1),
                _phase_pad(h.shape[2], pw) if ww == 2 else (1, 1),
            )
            outs.append(
                jax.lax.conv_general_dilated(
                    h, kernel, window_strides=(wh, ww), padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
    y = outs[0]
    for o in outs[1:]:
        y = jnp.maximum(y, o)
    # bias commutes with max (monotone rounding): add once, post-max
    return y + bias


def phase_conv_pool_1d(h: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, window: int,
                       dtype) -> jnp.ndarray:
    """1d analogue of ``phase_conv_pool_2d``: conv3(SAME) -> max_pool(2)
    as two stride-2 phase convs + one elementwise max (bit-exact,
    tests/test_phase_pool.py). h: (B, T, C); window 1 = clamped axis."""
    assert window in (1, 2), (
        f"phase_conv_pool_1d: pool window must be 1 or 2, got {window}")
    assert kernel.shape[0] == 3, (
        f"phase_conv_pool_1d: k=3 kernels only, got {kernel.shape}")
    h = h.astype(dtype)
    kernel = kernel.astype(dtype)
    bias = bias.astype(dtype)
    outs = []
    for p in range(window):
        pad = (_phase_pad(h.shape[1], p) if window == 2 else (1, 1),)
        outs.append(
            jax.lax.conv_general_dilated(
                h, kernel, window_strides=(window,), padding=pad,
                dimension_numbers=("NTC", "TIO", "NTC"),
            )
        )
    y = outs[0]
    for o in outs[1:]:
        y = jnp.maximum(y, o)
    return y + bias


class PReLU(nn.Module):
    """Per-channel PReLU over the trailing (channel) axis, init 0.25."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, 0.25, self.param_dtype),
            (self.channels,),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def _bn(train: bool, dtype=None, name=None):
    """BatchNorm matching torch defaults (eps=1e-5, momentum 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class ConvLockedDropout(nn.Module):
    """Per-channel dropout with the mask shared across time
    (reference networks/classifiers.py:21-34; unused there, provided for
    API completeness). Input (B, T, C)."""

    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or not self.dropout_rate:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(
            rng, 1.0 - self.dropout_rate, (x.shape[0], 1, x.shape[-1])
        )
        return x * keep.astype(x.dtype)


class ResnetBlock1d(nn.Module):
    """1x1 -> 3(pad 1) -> 1x1 conv residual block, BN+PReLU each (1d).

    reference networks/classifiers.py:37-69. Input (B, T, C). With
    ``fused_infer=True``, eval-mode forwards run the one-pass fused lane-roll
    Pallas block (BN folded into conv weights, ops/pallas_resnet1d.py);
    params and checkpoints are identical in both modes."""

    depth: int
    dtype: jnp.dtype = jnp.float32
    fused_infer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.fused_infer and not train and not self.is_initializing()
                and x.shape[-1] == self.depth):
            from freesound_classification_tpu.ops.pallas_resnet1d import (
                resnet_block_1d_infer,
            )

            return resnet_block_1d_infer(x, self.variables)
        identity = x
        h = nn.Conv(self.depth, (1,), dtype=self.dtype, name="conv1")(x)
        h = _bn(train, self.dtype, name="bn1")(h)
        h = PReLU(self.depth, name="prelu1")(h)
        h = nn.Conv(self.depth, (3,), padding=1, dtype=self.dtype, name="conv2")(h)
        h = _bn(train, self.dtype, name="bn2")(h)
        h = PReLU(self.depth, name="prelu2")(h)
        h = nn.Conv(self.depth, (1,), dtype=self.dtype, name="conv3")(h)
        h = _bn(train, self.dtype, name="bn3")(h)
        h = h + identity
        return PReLU(self.depth, name="prelu3")(h)


class ResnetBlock2d(nn.Module):
    """Same as ResnetBlock1d in 2d (reference networks/classifiers.py:72-104).

    Input (B, H, W, C). With ``fused_infer=True``, eval-mode forwards run
    the one-pass fused Pallas block (BN folded into conv weights,
    ops/pallas_resnet.py) instead of the 9-stage unfused chain; params and
    checkpoints are identical in both modes (init and training always take
    the unfused path)."""

    depth: int
    dtype: jnp.dtype = jnp.float32
    fused_infer: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.fused_infer and not train and not self.is_initializing()
                and x.shape[-1] == self.depth):
            from freesound_classification_tpu.ops.pallas_resnet import (
                resnet_block_2d_infer,
            )

            # v2 transposed-layout Pallas kernel on TPU (1.76 vs XLA's
            # 3.01 ms at the block0 bench shape); XLA folded twin off-TPU
            # or when the image would not fit VMEM
            return resnet_block_2d_infer(x, self.variables,
                                         use_pallas_kernel=True)
        identity = x
        h = nn.Conv(self.depth, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = _bn(train, self.dtype, name="bn1")(h)
        h = PReLU(self.depth, name="prelu1")(h)
        h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = _bn(train, self.dtype, name="bn2")(h)
        h = PReLU(self.depth, name="prelu2")(h)
        h = nn.Conv(self.depth, (1, 1), dtype=self.dtype, name="conv3")(h)
        h = _bn(train, self.dtype, name="bn3")(h)
        h = h + identity
        return PReLU(self.depth, name="prelu3")(h)


class ConvBlock1d(nn.Module):
    """BN -> Conv1d(k=3, pad 1) -> MaxPool(2) -> BN -> PReLU -> ResnetBlock.

    reference networks/classifiers.py:147-161. Halves the time axis.
    ``phase_pool=True`` routes eval-mode forwards through the
    phase-decomposed conv+pool lowering (``phase_conv_pool_1d``)."""

    depth: int
    dtype: jnp.dtype = jnp.float32
    fused_infer: bool = False
    phase_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _bn(train, self.dtype, name="bn_in")(x)
        # clamp the pool once the (static, per-bucket) time axis hits 1 —
        # torch's MaxPool1d(2) would error there; deep towers on short
        # buckets must stay well-defined
        wt = 2 if x.shape[1] >= 2 else 1
        if (self.phase_pool and not train and not self.is_initializing()):
            cp = self.variables["params"]["conv"]
            h = phase_conv_pool_1d(h, cp["kernel"], cp["bias"], wt,
                                   self.dtype)
        else:
            h = nn.Conv(self.depth, (3,), padding=1, dtype=self.dtype,
                        name="conv")(h)
            h = _max_pool(h, (wt,))
        h = _bn(train, self.dtype, name="bn_out")(h)
        h = PReLU(self.depth, name="prelu")(h)
        return ResnetBlock1d(self.depth, self.dtype,
                             fused_infer=self.fused_infer,
                             name="resnet")(h, train)


class ConvBlock2d(nn.Module):
    """2d variant (reference networks/classifiers.py:524-538). Halves H and W.

    ``phase_pool=True`` routes eval-mode forwards through the phase-
    decomposed conv+pool lowering (``phase_conv_pool_2d``): 4 stride-2
    convs + one elementwise max instead of stride-1 conv + reduce-window,
    bit-exact, never materializing the full-resolution conv map.

    ``fused_head=True`` routes eval-mode forwards of small-C_in stages
    (block0's 2-channel spectrogram input) through the fused Pallas head
    kernel (ops/pallas_head.py): conv+pool+bn_out+PReLU in one VMEM pass,
    so the full-resolution conv map never touches HBM. RETIRED from
    production (model-level 0.68x, docs/STUDIES.md). Params/checkpoints
    are identical in every mode (init and training always take the
    unfused path), and non-TPU / unsupported shapes fall back to it too."""

    depth: int
    dtype: jnp.dtype = jnp.float32
    fused_infer: bool = False
    fused_head: bool = False
    phase_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.fused_head and not train and not self.is_initializing()
                and x.shape[1] >= 2 and x.shape[2] >= 2):
            from freesound_classification_tpu.ops import pallas_head
            from freesound_classification_tpu.ops.pallas_kernels import (
                _on_tpu,
            )

            if _on_tpu() and pallas_head.head_supported(x.shape, self.depth):
                h = pallas_head.conv_block_2d_head_infer(
                    x, self.variables, dtype=self.dtype)
                return ResnetBlock2d(self.depth, self.dtype,
                                     fused_infer=self.fused_infer,
                                     name="resnet")(h, train)
        h = _bn(train, self.dtype, name="bn_in")(x)
        # clamp pooling per axis once its static size hits 1 (short buckets
        # under deep towers; see ConvBlock1d)
        wh = 2 if x.shape[1] >= 2 else 1
        ww = 2 if x.shape[2] >= 2 else 1
        if (self.phase_pool and not train and not self.is_initializing()):
            cp = self.variables["params"]["conv"]
            h = phase_conv_pool_2d(h, cp["kernel"], cp["bias"],
                                   (wh, ww), self.dtype)
        else:
            h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(h)
            h = _max_pool(h, (wh, ww))
        h = _bn(train, self.dtype, name="bn_out")(h)
        h = PReLU(self.depth, name="prelu")(h)
        return ResnetBlock2d(self.depth, self.dtype,
                             fused_infer=self.fused_infer,
                             name="resnet")(h, train)


def time_mask(lengths: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B,) valid frame counts -> (B, n_frames) {0,1} mask."""
    t = jnp.arange(n_frames)
    return (t[None, :] < lengths[:, None]).astype(jnp.float32)


def mask_time(h: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded time frames of a (B, T, C) feature map.

    Applied between conv blocks so that bucket padding stays a *constant*
    (zero — matching the convs' own SAME zero padding) no matter how deep the
    receptive field grows: without this, a ResnetBlock's post-pool 3-wide
    convs pull bucket-edge values back into the valid region and logits start
    depending on which bucket a clip was padded into.
    """
    return h * time_mask(lengths, h.shape[1])[..., None].astype(h.dtype)


def mask_time_2d(h: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded time frames (axis 2) of a (B, H, W, C) feature map."""
    return h * time_mask(lengths, h.shape[2])[:, None, :, None].astype(h.dtype)


def masked_max_pool_time(h: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Global max over the time axis restricted to valid frames.

    h: (B, T, C) (1d tower) — returns (B, C). The reference global-maxpools
    over all (padded) frames (networks/classifiers.py:199-201); masking makes
    logits exactly invariant to the bucket a clip landed in.
    """
    mask = time_mask(lengths, h.shape[1])[..., None]
    return jnp.max(jnp.where(mask > 0, h, NEG_INF), axis=1)


def masked_max_pool_2d(h: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Global max over (H, W) with W (time) masked. h: (B, H, W, C) -> (B, C)."""
    mask = time_mask(lengths, h.shape[2])[:, None, :, None]
    return jnp.max(jnp.where(mask > 0, h, NEG_INF), axis=(1, 2))


def masked_mean_time(h: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid time frames. h: (B, T, C) -> (B, C)."""
    mask = time_mask(lengths, h.shape[1])[..., None]
    total = jnp.sum(h * mask, axis=1)
    return total / jnp.maximum(jnp.sum(mask, axis=1), 1.0)


class MaskedBiGRU(nn.Module):
    """LayerNorm -> bidirectional GRU over time; returns concatenated final
    states of both directions at each sample's true sequence end.

    The reference aggregator (networks/classifiers.py:139-145, 202-207) is
    LayerNorm + nn.GRU(bidirectional) taking the final hidden states. Here the
    scan respects per-sample lengths: the forward carry freezes past
    ``lengths[b]``, and the backward pass runs over the length-aware flipped
    sequence, so bucket padding never reaches the states.
    """

    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        # x: (B, T, C); lengths: (B,) valid frame counts
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        fwd = nn.RNN(
            nn.GRUCell(self.hidden, dtype=self.dtype),
            return_carry=True,
            name="gru_fwd",
        )
        bwd = nn.RNN(
            nn.GRUCell(self.hidden, dtype=self.dtype),
            return_carry=True,
            reverse=True,
            keep_order=True,
            name="gru_bwd",
        )
        carry_f, _ = fwd(x, seq_lengths=lengths)
        carry_b, _ = bwd(x, seq_lengths=lengths)
        return jnp.concatenate([carry_f, carry_b], axis=-1)


class MLPHead(nn.Module):
    """BN -> Linear -> BN -> PReLU -> Dropout -> Linear(n_classes).

    reference networks/classifiers.py:165-172 / 542-549."""

    width: int
    n_classes: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _bn(train, self.dtype, name="bn1")(x)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc1")(h)
        h = _bn(train, self.dtype, name="bn2")(h)
        h = PReLU(self.width, name="prelu")(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="dropout")(h)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="fc2")(h)


def block_depths(
    num_conv_blocks: int, conv_base_depth: int, growth_rate: float
) -> Sequence[int]:
    """Per-stage channel widths: int(growth_rate**k * conv_base_depth)
    (reference networks/classifiers.py:130-132)."""
    return [
        int(growth_rate**k * conv_base_depth) for k in range(num_conv_blocks)
    ]
