"""Fused inference resnet BasicBlock (backbone family): one VMEM pass.

The backbone classifier's trunk (models/backbone.py, counterpart of
reference networks/classifiers.py:896-964) is a stack of standard resnet v1
basic blocks: conv3x3 -> BN -> relu -> conv3x3 -> BN -> +identity -> relu.
At eval time both BNs fold into the convs, so a stride-1 equal-channel
block collapses to two 3x3 convs plus elementwise — one HBM read of x and
one write of y.

Same transposed layout as the proven v2 ResnetBlock2d kernel
(ops/pallas_resnet.py): activations are (B, H, Cp, Wp) with C on sublanes
(padded to 16 for bf16 DMA tiling) and W on lanes (padded to a 128
multiple with >= 1 zero lane), so 3x3 taps are H-row offsets (free) plus
+-1 pltpu.roll lane rotates. Each conv row is three (C, 3C) @ (3C, Wp)
MXU dots against a 4-slot ring of pre-concatenated [row-1; row; row+1]
tap blocks; here there are TWO rings chained in a 2-deep software
pipeline — ring_x feeds conv1 (lag 1 behind the row loads) and ring_h
feeds conv2 (lag 2) — with zero halos supplying SAME padding. Rings are
f32 (Mosaic's tpu.dynamic_rotate rejects non-32-bit data on v5e); the
operands cast to bf16 at the dots.

Only stride-1 blocks with in_channels == features take the kernel (the
hot majority: every non-stage-head block); stride-2 / projection blocks
and off-TPU runs use the folded-weight XLA twin. Both paths are tested
against the unfused Flax block (tests/test_pallas_backbone.py); Mosaic
numerics are gated on hardware by tpu_smoke.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from freesound_classification_tpu.ops.pallas_kernels import _on_tpu

_VMEM_CAP = 13 * 1024 * 1024


def fold_basic_params(variables, eps: float = 1e-5):
    """Fold eval-mode BN into conv weights for one BasicBlock.

    ``variables``: the block's own {"params", "batch_stats"} subtree
    (conv1/bn1/conv2/bn2 and optionally downsample/downsample_bn, as
    created by models/backbone.py — convs are bias-free). Returns
    w1/w2 (3, 3, C, K) tap-major, b1/b2 (K,), and optionally
    wd (C, K)/bd (K,) for the projection shortcut.
    """
    p = variables["params"]
    bs = variables["batch_stats"]

    def fold(conv_name, bn_name):
        kern = p[conv_name]["kernel"]
        scale = p[bn_name]["scale"]
        beta = p[bn_name]["bias"]
        mean = bs[bn_name]["mean"]
        var = bs[bn_name]["var"]
        s = scale / jnp.sqrt(var + eps)
        return kern * s, beta - mean * s

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    fp = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}
    if "downsample" in p:
        wd, bd = fold("downsample", "downsample_bn")
        fp["wd"] = wd[0, 0]
        fp["bd"] = bd
    return fp


def basic_block_infer_xla(x, fp, strides: int = 1):
    """Folded-weight XLA twin (fallback and parity oracle). Stays in
    x.dtype throughout (f32 biases would promote every intermediate)."""
    dt = x.dtype
    h = jax.lax.conv_general_dilated(
        x, fp["w1"].astype(dt), window_strides=(strides, strides),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + fp["b1"].astype(dt)
    h = jax.nn.relu(h)
    h = jax.lax.conv_general_dilated(
        h, fp["w2"].astype(dt), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + fp["b2"].astype(dt)
    if "wd" in fp:
        res = jnp.einsum(
            "bhwc,ck->bhwk", x[:, ::strides, ::strides], fp["wd"].astype(dt)
        ) + fp["bd"].astype(dt)
    else:
        res = x
    return jax.nn.relu(h + res)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _basic_t_kernel(h_dim, n_b, k1_ref, k2_ref, b1_ref, b2_ref, lmask_ref,
                    x_hbm, out_hbm, xv, ring_x, ring_h, yv, sems):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)
    cp = b1_ref.shape[0]
    wp = ring_x.shape[2]

    def in_dma(i):
        s = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(x_hbm.at[i], xv.at[s], sems.at[s, 0])

    def out_dma(i):
        s = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(yv.at[s], out_hbm.at[i], sems.at[s, 1])

    @pl.when(b == 0)
    def _():
        in_dma(0).start()

    @pl.when(b + 1 < n_b)
    def _():
        in_dma(b + 1).start()  # prefetch next image during compute

    in_dma(b).wait()

    @pl.when(b >= 2)
    def _():
        out_dma(b - 2).wait()  # this yv slot's previous write must be done

    lmask = lmask_ref[:]  # (1, Wp)
    zrow = jnp.zeros((cp, wp), ring_x.dtype)
    ring_x[0, 0:cp] = zrow  # x[-1] = 0 (top SAME halo for conv1 row 0)
    ring_h[0, 0:cp] = zrow  # h1[-1] = 0 (top halo for conv2 row 0)

    def conv3(ring, g, k_ref):
        r = ring[g % 4]  # (3cp, Wp) assembled [row-1; row; row+1], f32
        rl = pltpu.roll(r, 1, 1).astype(jnp.bfloat16)
        rm = r.astype(jnp.bfloat16)
        # pltpu.roll requires shift >= 0: wp-1 is the circular -1
        rr = pltpu.roll(r, wp - 1, 1).astype(jnp.bfloat16)
        acc = jnp.dot(k_ref[0], rl, preferred_element_type=jnp.float32)
        acc += jnp.dot(k_ref[1], rm, preferred_element_type=jnp.float32)
        acc += jnp.dot(k_ref[2], rr, preferred_element_type=jnp.float32)
        return acc

    for s in range(h_dim + 2):
        # stage 0: publish x row s into ring_x tap slots
        if s < h_dim:
            xf = xv[slot, s].astype(ring_x.dtype)
            ring_x[(s + 1) % 4, 0:cp] = xf
            ring_x[s % 4, cp:2 * cp] = xf
            if s > 0:
                ring_x[(s - 1) % 4, 2 * cp:3 * cp] = xf
        elif s == h_dim:
            ring_x[(h_dim - 1) % 4, 2 * cp:3 * cp] = zrow  # x[H] = 0
        # stage 1: conv1 row g (ring_x[g] complete once row g+1 published)
        g = s - 1
        if 0 <= g < h_dim:
            h1 = _relu(conv3(ring_x, g, k1_ref) + b1_ref[:]) * lmask
            ring_h[(g + 1) % 4, 0:cp] = h1
            ring_h[g % 4, cp:2 * cp] = h1
            if g > 0:
                ring_h[(g - 1) % 4, 2 * cp:3 * cp] = h1
        elif g == h_dim:
            ring_h[(h_dim - 1) % 4, 2 * cp:3 * cp] = zrow  # h1[H] = 0
        # stage 2: conv2 + residual + relu for row g2
        g2 = s - 2
        if 0 <= g2 < h_dim:
            acc = conv3(ring_h, g2, k2_ref) + b2_ref[:]
            res = xv[slot, g2].astype(jnp.float32)
            yv[slot, g2] = (_relu(acc + res) * lmask).astype(yv.dtype)

    out_dma(b).start()

    @pl.when(b == n_b - 1)
    def _():
        out_dma(b).wait()

    @pl.when((b == n_b - 1) & (b >= 1))
    def _():
        out_dma(b - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _basic_pallas_t(xt, k1, k2, b1, b2, lmask, interpret: bool = False):
    """xt: (B, H, Cp, Wp) bf16, Cp a multiple of 16, Wp of 128, with >= 1
    zero lane past W and zero pad sublanes. Returns (B, H, Cp, Wp) bf16."""
    bsz, h_dim, cp, wp = xt.shape
    assert cp % 16 == 0 and wp % 128 == 0
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_basic_t_kernel, h_dim, bsz),
        grid=(bsz,),
        in_specs=[vm] * 5 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h_dim, cp, wp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, h_dim, cp, wp), jnp.bfloat16),  # xv (dbl buf)
            pltpu.VMEM((4, 3 * cp, wp), jnp.float32),      # conv1 tap ring
            pltpu.VMEM((4, 3 * cp, wp), jnp.float32),      # conv2 tap ring
            pltpu.VMEM((2, h_dim, cp, wp), jnp.bfloat16),  # yv (dbl buf)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h_dim * wp * cp * 18 * cp,
            bytes_accessed=4 * bsz * h_dim * cp * wp,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP + 2 * 1024 * 1024),
        interpret=interpret,
    )(k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
      b1.astype(jnp.float32), b2.astype(jnp.float32),
      lmask.astype(jnp.float32), xt)
    return out


@functools.lru_cache(maxsize=2)
def _basic_t_vmappable(interpret: bool):
    """Vmap-safe kernel (same design as the 2d/1d fused blocks): mapped
    weights statically unroll to per-fold calls, mapped images fold into
    the grid batch dim."""

    @custom_batching.custom_vmap
    def fn(xt, k1, k2, b1, b2, lmask):
        return _basic_pallas_t(xt, k1, k2, b1, b2, lmask,
                               interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        if in_batched[0] and not any(in_batched[1:]):
            xt = args[0]
            bsz = xt.shape[1]
            out = fn(xt.reshape(axis_size * bsz, *xt.shape[2:]), *args[1:])
            return out.reshape(axis_size, bsz, *out.shape[1:]), True
        outs = []
        for i in range(axis_size):
            sl = [a[i] if bb else a for a, bb in zip(args, in_batched)]
            outs.append(fn(*sl))
        return jnp.stack(outs), True

    return fn


def _vmem_estimate_basic(h: int, w: int, c: int) -> int:
    cp = -(-c // 16) * 16
    wp = -(-(w + 1) // 128) * 128
    return (
        2 * 2 * 2 * h * cp * wp      # xv + yv, double-buffered bf16
        + 2 * 4 * 4 * 3 * cp * wp    # two f32 tap rings
        + 4 * 3 * cp * wp * 3        # live f32 acc + rolled temps (rough)
        + 2 * cp * cp * 18           # weights bf16 (two (3, cp, 3cp))
    )


def _tap_concat(w, cp):
    """(3, 3, C, K) HWIO -> (3, cp, 3cp) dw-major, dh-concatenated,
    transposed for out-rows-first dots (zero pad rows/cols inert)."""
    c, k = w.shape[2], w.shape[3]

    def seg(dh, dw):
        m = w[dh, dw].T  # (K, C)
        return jnp.pad(m, ((0, cp - k), (0, cp - c)))

    return jnp.stack([
        jnp.concatenate([seg(dh, dw) for dh in range(3)], axis=1)
        for dw in range(3)
    ])


def basic_block_infer_pallas(x, fp, interpret: bool = False):
    """Fused stride-1 BasicBlock on (B, H, W, C) input; transposes to the
    kernel layout at the boundary."""
    bsz, h, w, c = x.shape
    cp = -(-c // 16) * 16
    wp = -(-(w + 1) // 128) * 128
    xt = jnp.transpose(x.astype(jnp.bfloat16), (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))

    def padc(v):
        return jnp.pad(v, (0, cp - v.shape[0]))[:, None]

    lmask = (jnp.arange(wp) < w).astype(jnp.float32)[None, :]
    out = _basic_t_vmappable(interpret)(
        xt, _tap_concat(fp["w1"], cp), _tap_concat(fp["w2"], cp),
        padc(fp["b1"]), padc(fp["b2"]), lmask)
    return jnp.transpose(out[:, :, :c, :w], (0, 1, 3, 2)).astype(x.dtype)


def basic_block_infer(x, variables, strides: int = 1,
                      use_pallas_kernel: bool = True):
    """Eval-mode fused BasicBlock forward. x: (B, H, W, C).

    Stride-1 equal-channel blocks route to the two-ring Pallas kernel on
    TPU when the working set fits VMEM; everything else (projection
    shortcuts, stride 2, off-TPU) uses the folded XLA twin.
    """
    fp = fold_basic_params(variables)
    bsz, h, w, c = x.shape
    k = fp["w1"].shape[3]
    if strides != 1 or c != k or "wd" in fp:
        return basic_block_infer_xla(x, fp, strides)
    if (use_pallas_kernel and _on_tpu()
            and _vmem_estimate_basic(h, w, c) <= _VMEM_CAP):
        return basic_block_infer_pallas(x, fp)
    return basic_block_infer_xla(x, fp)
