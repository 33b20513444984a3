"""Train-mode ResnetBlock2d as explicit XLA ops (tap-split convolutions).

Why: the train step's model fwd+bwd is ~41 ms of the 49.9 ms no-aug step
(ROADMAP.md), and the round-3 ablation localized the cost to the resnet
blocks' 3x3 convs — XLA's native conv lowering runs the fwd+bwd core at
~16% MXU at the block shapes (C=64 caps lane utilization at 50%, so real
headroom is ~3x). The eval-side answer was the fused Pallas v2 kernel
(ops/pallas_resnet.py); train mode can't fold BN (batch statistics are a
full-batch barrier between the convs), so this module instead re-expresses
the block with surgical XLA:

- the 3x3 conv as NINE statically-shifted einsums ("tap-split"): each tap
  (dh, dw) is a slice of the padded activation contracted against its
  (C, K) weight plane. Slices are free (fused into the matmul reads),
  every matmul is a plain minor-dim contraction, and the BACKWARD of a
  shifted einsum is again shifted einsums — no conv_transpose lowering
  anywhere in the grad program.
- BatchNorm stays *flax's own* nn.BatchNorm, applied functionally — the
  round-3 ablation measured a hand-written BN 35% SLOWER than flax's
  (13.91 vs 10.28 ms fwd+bwd at block0); its lowering is already good,
  and reusing it keeps train-path numerics bit-identical to the unfused
  block.

The reference workload is networks/classifiers.py:72-104 (the torch
ResnetBlock2d this block family rebuilds; see models/blocks.py).

``ResnetBlock2d(fused_train=True)`` (models/blocks.py) routes train-mode
calls here; eval calls keep the fused_infer path. Parity (values, batch
stats, and grads) vs the unfused flax chain is tested in
tests/test_resnet_train.py; the hardware A/B is scripts/probe_train_block_v2.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _prelu(z, a):
    return jnp.where(z >= 0, z, a.astype(z.dtype) * z)


def _bn_train(u, params, stats, momentum, eps, dtype):
    """flax BatchNorm in train mode as a pure function.

    Returns (normalized, {"mean": new_running_mean, "var": new_running_var}).
    """
    bn = nn.BatchNorm(use_running_average=False, momentum=momentum,
                      epsilon=eps, dtype=dtype)
    out, mut = bn.apply({"params": params, "batch_stats": stats}, u,
                        mutable=["batch_stats"])
    return out, mut["batch_stats"]


def conv3x3_tap_split(h, kernel, bias):
    """3x3 SAME conv as nine statically-shifted minor-dim einsums.

    h: (B, H, W, C); kernel: (3, 3, C, K); bias: (K,). Zero padding
    supplies the SAME halo, so each tap is a (B, H, W, C) slice of the
    padded plane contracted against one (C, K) weight plane.
    """
    b, hh, ww, c = h.shape
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dh in range(3):
        for dw in range(3):
            t = jnp.einsum(
                "bhwc,ck->bhwk",
                hp[:, dh : dh + hh, dw : dw + ww],
                kernel[dh, dw].astype(h.dtype),
            )
            acc = t if acc is None else acc + t
    return acc + bias.astype(h.dtype)


def conv3_tap_split(h, kernel, bias):
    """1d twin of conv3x3_tap_split: (B, T, C) x (3, C, K) -> (B, T, K)."""
    b, tt, c = h.shape
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
    acc = None
    for dt_ in range(3):
        t = jnp.einsum("btc,ck->btk", hp[:, dt_ : dt_ + tt],
                       kernel[dt_].astype(h.dtype))
        acc = t if acc is None else acc + t
    return acc + bias.astype(h.dtype)


def basic_block_train(x, variables, *, momentum: float = 0.9,
                      eps: float = 1e-5):
    """Train-mode forward of a stride-1 identity BasicBlock
    (models/backbone.py): 3x3 -> BN -> relu -> 3x3 -> BN -> +id -> relu,
    convs tap-split. Projection / stride-2 blocks keep the flax path (one
    per stage; XLA's strided-conv lowering is not the hot loop).
    Returns (y, new_batch_stats)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    dt = x.dtype
    zero = jnp.zeros((p["conv1"]["kernel"].shape[-1],), dt)
    u1 = conv3x3_tap_split(x, p["conv1"]["kernel"], zero)
    z1, st1 = _bn_train(u1, p["bn1"], bs["bn1"], momentum, eps, dt)
    h = nn.relu(z1)
    u2 = conv3x3_tap_split(h, p["conv2"]["kernel"], zero)
    z2, st2 = _bn_train(u2, p["bn2"], bs["bn2"], momentum, eps, dt)
    return nn.relu(z2 + x), {"bn1": st1, "bn2": st2}


def resnet_block_1d_train(x, variables, *, momentum: float = 0.9,
                          eps: float = 1e-5):
    """Train-mode forward of one ResnetBlock1d (models/blocks.py), the
    (B, T, C) twin of resnet_block_2d_train. Returns (y, new_batch_stats).
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    dt = x.dtype

    u1 = jnp.einsum("btc,ck->btk", x, p["conv1"]["kernel"][0].astype(dt))
    u1 = u1 + p["conv1"]["bias"].astype(dt)
    z1, st1 = _bn_train(u1, p["bn1"], bs["bn1"], momentum, eps, dt)
    h1 = _prelu(z1, p["prelu1"]["alpha"])

    u2 = conv3_tap_split(h1, p["conv2"]["kernel"], p["conv2"]["bias"])
    z2, st2 = _bn_train(u2, p["bn2"], bs["bn2"], momentum, eps, dt)
    h2 = _prelu(z2, p["prelu2"]["alpha"])

    u3 = jnp.einsum("btc,ck->btk", h2, p["conv3"]["kernel"][0].astype(dt))
    u3 = u3 + p["conv3"]["bias"].astype(dt)
    z3, st3 = _bn_train(u3, p["bn3"], bs["bn3"], momentum, eps, dt)
    y = _prelu(z3 + x, p["prelu3"]["alpha"])
    return y, {"bn1": st1, "bn2": st2, "bn3": st3}


def resnet_block_2d_train(x, variables, *, momentum: float = 0.9,
                          eps: float = 1e-5):
    """Train-mode forward of one ResnetBlock2d, tap-split formulation.

    ``variables``: the block's {"params", "batch_stats"} subtree (same
    layout models/blocks.py ResnetBlock2d creates). Returns
    ``(y, new_batch_stats)`` where new_batch_stats mirrors the flax tree
    {"bn1": {"mean", "var"}, "bn2": ..., "bn3": ...}.

    Differentiable end to end: grads w.r.t. x and every param match the
    unfused flax chain (tests/test_resnet_train.py), because the math is
    the same ops in the same order — only the conv is re-expressed.
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    dt = x.dtype

    u1 = jnp.einsum("bhwc,ck->bhwk", x, p["conv1"]["kernel"][0, 0].astype(dt))
    u1 = u1 + p["conv1"]["bias"].astype(dt)
    z1, st1 = _bn_train(u1, p["bn1"], bs["bn1"], momentum, eps, dt)
    h1 = _prelu(z1, p["prelu1"]["alpha"])

    u2 = conv3x3_tap_split(h1, p["conv2"]["kernel"], p["conv2"]["bias"])
    z2, st2 = _bn_train(u2, p["bn2"], bs["bn2"], momentum, eps, dt)
    h2 = _prelu(z2, p["prelu2"]["alpha"])

    u3 = jnp.einsum("bhwc,ck->bhwk", h2,
                    p["conv3"]["kernel"][0, 0].astype(dt))
    u3 = u3 + p["conv3"]["bias"].astype(dt)
    z3, st3 = _bn_train(u3, p["bn3"], bs["bn3"], momentum, eps, dt)
    y = _prelu(z3 + x, p["prelu3"]["alpha"])
    return y, {"bn1": st1, "bn2": st2, "bn3": st3}
