"""Fused inference resnet block, 1d variant: one VMEM pass per clip.

The reference's ResnetBlock1d (networks/classifiers.py:37-69) is the hot
loop of the HierarchicalCNN family: conv1x1 -> BN -> PReLU -> conv3(pad 1)
-> BN -> PReLU -> conv1x1 -> BN -> +identity -> PReLU over (B, T, C)
feature maps. Unfused, every stage round-trips the activation through HBM;
at eval time BatchNorm is a per-channel affine, so the block collapses to
three matmuls plus elementwise.

This is the 1d instance of the v2 transposed layout proven by the 2d
kernel (ops/pallas_resnet.py, "v2 kernel" section):
- activations live as (B, Cp, Tp): C on sublanes (padded to 16 for the
  bf16 DMA tiling grid), T on lanes (padded to a 128 multiple with >= 1
  zero lane past T);
- the width-3 conv taps are +-1 LANE rolls (pltpu.roll). With the zero
  lane padding, a circular roll is exactly SAME padding: roll(+1) wraps
  the zero pad lane into t=0's left halo, roll(Tp-1) pulls the zero lane
  at T into t=T-1's right halo;
- each conv is a (Cp, Cp) @ (Cp, Tp) MXU dot; zero-padded weights keep
  pad SUBLANES inert (prelu(0)=0) and the lane mask re-zeroes pad LANES
  after each bias+PReLU so rolls keep reading zeros;
- rolls happen on the f32 conv1 output: Mosaic's tpu.dynamic_rotate is
  "not implemented ... with non-32-bit data" on v5e (hardware-measured on
  the 2d kernel); operands cast to bf16 at the MXU dots.

Grid is (B,) with double-buffered manual DMA (prefetch clip b+1 during
clip b's compute). Falls back to a folded-weight XLA twin off-TPU or when
the working set (dominated by the (3, Cp, Cp) conv2 weights at deep
blocks) would not fit VMEM. Both paths are tested against the unfused
Flax block (tests/test_pallas_resnet1d.py).
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


def fold_block_params_1d(variables, eps: float = 1e-5):
    """Fold eval-mode BN into conv weights for one ResnetBlock1d.

    ``variables``: the block's own {"params", "batch_stats"} subtree
    (conv1/bn1/prelu1/conv2/bn2/prelu2/conv3/bn3/prelu3 as created by
    models/blocks.py). Returns w1 (C, K), w2 (3, C, K) tap-major,
    w3 (K, K), b1/b2/b3 (K,), a1/a2/a3 (K,).
    """
    p = variables["params"]
    bs = variables["batch_stats"]

    def fold(conv_name, bn_name):
        kern = p[conv_name]["kernel"]  # (1, C, K) or (3, C, K)
        bias = p[conv_name]["bias"]
        scale = p[bn_name]["scale"]
        beta = p[bn_name]["bias"]
        mean = bs[bn_name]["mean"]
        var = bs[bn_name]["var"]
        s = scale / jnp.sqrt(var + eps)
        return kern * s, (bias - mean) * s + beta

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    w3, b3 = fold("conv3", "bn3")
    return {
        "w1": w1[0],  # (C, K)
        "w2": w2,     # tap-major (3, C, K)
        "w3": w3[0],
        "b1": b1, "b2": b2, "b3": b3,
        "a1": p["prelu1"]["alpha"],
        "a2": p["prelu2"]["alpha"],
        "a3": p["prelu3"]["alpha"],
    }


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def resnet_block_1d_infer_xla(x, fp):
    """Folded-weight XLA twin (off-TPU fallback and parity oracle).
    Everything stays in x.dtype — f32 biases/alphas would silently promote
    every intermediate to f32 (same trap measured on the 2d twin)."""
    dt = x.dtype
    b1, b2, b3 = (fp["b1"].astype(dt), fp["b2"].astype(dt),
                  fp["b3"].astype(dt))
    a1, a2, a3 = (fp["a1"].astype(dt), fp["a2"].astype(dt),
                  fp["a3"].astype(dt))
    h = jnp.einsum("btc,ck->btk", x, fp["w1"].astype(dt)) + b1
    h = _prelu(h, a1)
    h = jax.lax.conv_general_dilated(
        h, fp["w2"].astype(dt), window_strides=(1,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC")) + b2
    h = _prelu(h, a2)
    h = jnp.einsum("btk,kj->btj", h, fp["w3"].astype(dt)) + b3
    h = h + x
    return _prelu(h, a3)


def _fused_1d_kernel(n_b, w1_ref, k2_ref, w3_ref, b1_ref, b2_ref, b3_ref,
                     a1_ref, a2_ref, a3_ref, lmask_ref,
                     x_hbm, out_hbm, xv, yv, sems):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)
    tp = xv.shape[2]

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
        in_dma(b + 1).start()  # prefetch next clip during compute

    in_dma(b).wait()

    @pl.when(b >= 2)
    def _():
        out_dma(b - 2).wait()  # this yv slot's previous write must be done

    lmask = lmask_ref[:]  # (1, Tp)
    x = xv[slot]
    t1 = jnp.dot(w1_ref[:], x, preferred_element_type=jnp.float32)
    h1 = _prelu(t1 + b1_ref[:], a1_ref[:]) * lmask  # f32 (rolls need 32-bit)
    hl = pltpu.roll(h1, 1, 1).astype(jnp.bfloat16)
    hm = h1.astype(jnp.bfloat16)
    # pltpu.roll requires shift >= 0: tp-1 is the circular -1
    hr = pltpu.roll(h1, tp - 1, 1).astype(jnp.bfloat16)
    acc = jnp.dot(k2_ref[0], hl, preferred_element_type=jnp.float32)
    acc += jnp.dot(k2_ref[1], hm, preferred_element_type=jnp.float32)
    acc += jnp.dot(k2_ref[2], hr, preferred_element_type=jnp.float32)
    h2 = (_prelu(acc + b2_ref[:], a2_ref[:]) * lmask).astype(jnp.bfloat16)
    t3 = jnp.dot(w3_ref[:], h2, preferred_element_type=jnp.float32)
    y = _prelu(t3 + b3_ref[:] + x.astype(jnp.float32), a3_ref[:]) * lmask
    yv[slot] = y.astype(yv.dtype)

    out_dma(b).start()

    @pl.when(b == n_b - 1)
    def _():
        out_dma(b).wait()

    @pl.when((b == n_b - 1) & (b >= 1))
    def _():
        out_dma(b - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pallas_1d(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3, lmask,
                     interpret: bool = False):
    """xt: (B, Cp, Tp) bf16, Cp a multiple of 16, Tp of 128, with >= 1
    zero lane past T and zero pad sublanes. Returns (B, Cp, Tp) bf16."""
    bsz, cp, tp = xt.shape
    assert cp % 16 == 0 and tp % 128 == 0
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_1d_kernel, bsz),
        grid=(bsz,),
        in_specs=[vm] * 10 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, cp, tp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, cp, tp), jnp.bfloat16),  # xv (double-buffered)
            pltpu.VMEM((2, cp, tp), jnp.bfloat16),  # yv (double-buffered)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * tp * cp * 5 * cp,
            bytes_accessed=4 * bsz * cp * tp,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP + 2 * 1024 * 1024),
        interpret=interpret,
    )(w1t.astype(jnp.bfloat16), k2.astype(jnp.bfloat16),
      w3t.astype(jnp.bfloat16),
      b1.astype(jnp.float32), b2.astype(jnp.float32),
      b3.astype(jnp.float32),
      a1.astype(jnp.float32), a2.astype(jnp.float32),
      a3.astype(jnp.float32), lmask.astype(jnp.float32), xt)
    return out


@functools.lru_cache(maxsize=2)
def _fused_1d_vmappable(interpret: bool):
    """Vmap-safe 1d kernel (same design as the 2d `_fused_t_vmappable`):
    the fold-ensemble inference path vmaps the eval forward over stacked
    per-fold PARAMS with a shared batch — automatic pallas batching can't
    express that, so mapped weights statically unroll to per-fold calls,
    while mapped images fold into the grid batch dim."""

    @custom_batching.custom_vmap
    def fn(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3, lmask):
        return _fused_pallas_1d(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3,
                                lmask, interpret=interpret)

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


def _vmem_estimate_1d(t: int, c: int) -> int:
    cp = -(-c // 16) * 16
    tp = -(-(t + 1) // 128) * 128
    return (
        2 * 2 * 2 * cp * tp          # xv + yv, double-buffered bf16
        + 4 * cp * tp * 4            # live f32 h1/acc/y temps (rough)
        + 2 * cp * cp * 5            # weights bf16
    )


def resnet_block_1d_infer_pallas(x, fp, interpret: bool = False):
    """Fused block on (B, T, C) input; transposes to the kernel layout at
    the boundary (two XLA relayout passes)."""
    bsz, t, c = x.shape
    cp = -(-c // 16) * 16
    tp = -(-(t + 1) // 128) * 128
    xt = jnp.transpose(x.astype(jnp.bfloat16), (0, 2, 1))
    xt = jnp.pad(xt, ((0, 0), (0, cp - c), (0, tp - t)))

    def padw(m):  # (C, K) -> (cp, cp) transposed for out-rows-first dots
        m = m.T
        return jnp.pad(m, ((0, cp - m.shape[0]), (0, cp - m.shape[1])))

    k2 = jnp.stack([padw(fp["w2"][i]) for i in range(3)])  # (3, cp, cp)

    def padc(v):
        return jnp.pad(v, (0, cp - v.shape[0]))[:, None]

    lmask = (jnp.arange(tp) < t).astype(jnp.float32)[None, :]
    out = _fused_1d_vmappable(interpret)(
        xt, padw(fp["w1"]), k2, padw(fp["w3"]),
        padc(fp["b1"]), padc(fp["b2"]), padc(fp["b3"]),
        padc(fp["a1"]), padc(fp["a2"]), padc(fp["a3"]), lmask)
    return jnp.transpose(out[:, :c, :t], (0, 2, 1)).astype(x.dtype)


def resnet_block_1d_infer(x, variables, use_pallas_kernel: bool = True):
    """Eval-mode fused ResnetBlock1d forward. x: (B, T, C) -> same shape.

    Routes to the lane-roll Pallas kernel on TPU when the working set fits
    VMEM; the folded-weight XLA twin otherwise (exact same math). The
    conv2 tap order in the kernel: k2[0] pairs with roll(+1) (the t-1 tap),
    k2[2] with roll(-1) (the t+1 tap) — matching SAME conv orientation
    (validated against the flax block in tests/test_pallas_resnet1d.py).
    """
    fp = fold_block_params_1d(variables)
    bsz, t, c = x.shape
    k = fp["w1"].shape[1]
    if c != k:
        return resnet_block_1d_infer_xla(x, fp)
    if (use_pallas_kernel and _on_tpu()
            and _vmem_estimate_1d(t, c) <= _VMEM_CAP):
        return resnet_block_1d_infer_pallas(x, fp)
    return resnet_block_1d_infer_xla(x, fp)
