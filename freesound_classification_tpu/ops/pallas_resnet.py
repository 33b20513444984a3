"""Fused inference resnet block: one VMEM pass per image.

The reference's ResnetBlock2d (networks/classifiers.py:72-104) is the
model's hot loop: conv1x1 -> BN -> PReLU -> conv3x3 -> BN -> PReLU ->
conv1x1 -> BN -> +identity -> PReLU. Unfused, every stage round-trips the
(B, H, W, C) activation through HBM (~9 passes); at eval time BatchNorm is
a per-channel affine, so the whole block collapses to three matmuls plus
elementwise — one HBM read of x and one write of y.

TPU formulation (all Mosaic-safe ops — no reshapes, no dynamic slices, no
gathers):
- BN folds into the conv weights/biases on the host: with
  s = scale/sqrt(var+eps), ``w' = w*s`` per out-channel and
  ``b' = (b-mean)*s + beta`` (exact at eval; no train-mode support).
- The image is laid out as FLAT zero-PADDED rows: (H+2)*(W+2) rows of C
  channels. In that layout a 3x3 tap shift (dh, dw) is a constant flat row
  offset ``(dh-1)*(W+2) + (dw-1)`` — the 3x3 conv is NINE statically-shifted
  full-tile matmuls accumulated in f32, with the zero halo supplying SAME
  padding. The only non-matmul work is PReLU and masks.
- Grid is (B,); per image the padded input is DMA'd to VMEM once, conv1 +
  PReLU writes the h1 plane to VMEM scratch (halo re-zeroed via a
  precomputed center mask), and the 9-tap accumulation + conv3 + residual +
  PReLU stream out in statically unrolled row bands (bounds live f32
  registers; all slice starts are Python constants).

Used by models/blocks.py ResnetBlock2d(fused_infer=True) at eval time (the
bench + predict/evaluate inference path). Falls back to a folded-weight XLA
twin off-TPU or when the working set would not fit VMEM; both paths are
tested against the unfused Flax block (tests/test_pallas_resnet.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from freesound_classification_tpu.ops.pallas_kernels import _on_tpu

_BAND = 2048  # center rows per unrolled compute band
_VMEM_CAP = 13 * 1024 * 1024  # fit check (chip VMEM ~16 MB, compiler slack)


def fold_block_params(variables, eps: float = 1e-5):
    """Fold eval-mode BN into conv weights for one ResnetBlock2d.

    ``variables``: the block's own {"params": ..., "batch_stats": ...}
    subtree (conv1/bn1/prelu1/conv2/bn2/prelu2/conv3/bn3/prelu3 as created
    by models/blocks.py). Returns a dict of arrays:
    w1 (C, K), w2 (9, K, K) tap-major, w3 (K, K), b1/b2/b3 (K,),
    a1/a2/a3 (K,).
    """
    p = variables["params"]
    bs = variables["batch_stats"]

    def fold(conv_name, bn_name):
        kern = p[conv_name]["kernel"]  # (1,1,C,K) or (3,3,C,K)
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
        "w1": w1[0, 0],  # (C, K)
        "w2": w2.reshape(9, w2.shape[2], w2.shape[3]),  # tap-major (9, C, K)
        "w3": w3[0, 0],
        "b1": b1, "b2": b2, "b3": b3,
        "a1": p["prelu1"]["alpha"],
        "a2": p["prelu2"]["alpha"],
        "a3": p["prelu3"]["alpha"],
    }


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def resnet_block_2d_infer_xla(x, fp):
    """Folded-weight XLA twin (default fused path, off-TPU fallback, and
    parity oracle). Everything stays in x.dtype — f32 biases/alphas would
    silently promote every intermediate to f32 and double the HBM traffic
    (measured: -25% on the 5-fold bench before the casts were added)."""
    dt = x.dtype
    b1, b2, b3 = (fp["b1"].astype(dt), fp["b2"].astype(dt),
                  fp["b3"].astype(dt))
    a1, a2, a3 = (fp["a1"].astype(dt), fp["a2"].astype(dt),
                  fp["a3"].astype(dt))
    h = jnp.einsum("bhwc,ck->bhwk", x, fp["w1"].astype(dt)) + b1
    h = _prelu(h, a1)
    w2 = fp["w2"].reshape(3, 3, fp["w2"].shape[1], fp["w2"].shape[2])
    h = jax.lax.conv_general_dilated(
        h, w2.astype(dt), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    h = _prelu(h, a2)
    h = jnp.einsum("bhwk,kj->bhwj", h, fp["w3"].astype(dt)) + b3
    h = h + x
    return _prelu(h, a3)


def _fused_kernel(n_center, wp, n_bands, band, x_hbm, mask_ref,
                  w1_ref, w2_ref, w3_ref, b1_ref, b2_ref, b3_ref,
                  a1_ref, a2_ref, a3_ref, out_hbm,
                  xv, h1, ystage, sems):
    b = pl.program_id(0)
    r_in = x_hbm.shape[1]

    cp_in = pltpu.make_async_copy(x_hbm.at[b], xv, sems.at[0])
    cp_in.start()

    # zero the h1 plane (its tail slack rows and the halo must read 0)
    h1[:] = jnp.zeros_like(h1)
    cp_in.wait()

    # conv1 (1x1) + folded bn1 + PReLU over every padded row, in bands so
    # the f32 temporary stays ~1 MB (a full-plane value blew scoped VMEM);
    # the center mask re-zeroes the halo (bias/PReLU made it nonzero)
    for s1 in range(0, r_in, band):
        n1 = min(band, r_in - s1)
        t1 = jnp.dot(xv[s1 : s1 + n1], w1_ref[:],
                     preferred_element_type=jnp.float32)
        t1 = _prelu(t1 + b1_ref[:], a1_ref[:]) * mask_ref[s1 : s1 + n1]
        h1[s1 : s1 + n1] = t1.astype(h1.dtype)

    def out_dma(band_i):
        # all out DMAs move one FULL band (tiling-aligned offsets/sizes);
        # the tail band's slack rows are garbage the caller slices away
        slot = band_i % 2
        s = band_i * band
        return pltpu.make_async_copy(
            ystage.at[slot], out_hbm.at[b, s : s + band], sems.at[1 + slot])

    base = wp + 1  # flat row of center position (h=1, w=1)
    for band_i in range(n_bands):
        s = band_i * band
        nb = min(band, n_center - s)
        acc = None
        for dh in range(3):
            for dw in range(3):
                off = (dh - 1) * wp + (dw - 1)
                sub = h1[base + off + s : base + off + s + nb]
                t = jnp.dot(sub, w2_ref[3 * dh + dw],
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        h2 = _prelu(acc + b2_ref[:], a2_ref[:]).astype(h1.dtype)
        h3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
        res = xv[base + s : base + s + nb].astype(jnp.float32)
        y = _prelu(h3 + b3_ref[:] + res, a3_ref[:])

        slot = band_i % 2
        if band_i >= 2:  # slot reused: prior DMA out of it must be done
            out_dma(band_i - 2).wait()
        ystage[slot, 0:nb] = y.astype(ystage.dtype)
        out_dma(band_i).start()
    # drain outstanding writes before the next grid step reuses the slots
    for band_i in range(max(n_bands - 2, 0), n_bands):
        out_dma(band_i).wait()


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _fused_pallas(x_flat, mask, fp_w1, fp_w2, fp_w3, b1, b2, b3, a1, a2, a3,
                  h: int, w: int, interpret: bool = False):
    """x_flat: (B, R, C) zero-padded flat rows (R = (H+2)*(W+2) rounded up
    to 16, C rounded up to 128 — Mosaic HBM DMA slices must sit on the
    (16, 128) bf16 tiling grid), bf16."""
    bsz, r_in, c = x_flat.shape
    assert r_in % 16 == 0, "pad flat rows to a multiple of 16"
    assert c % 128 == 0, "pad channels to a multiple of 128"
    k = fp_w1.shape[1]
    wp = w + 2
    n_center = h * wp  # center rows, halo columns included (masked later)
    band = min(_BAND, ((n_center + 15) // 16) * 16)
    n_bands = -(-n_center // band)
    n_pad = n_bands * band

    out = pl.pallas_call(
        functools.partial(_fused_kernel, n_center, wp, n_bands, band),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x, manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # center mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (9, C, K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a3
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # manual DMA out
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, k), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((r_in, c), jnp.bfloat16),      # xv
            pltpu.VMEM((r_in + 16, k), jnp.bfloat16),  # h1 plane (+slack)
            pltpu.VMEM((2, band, k), jnp.bfloat16),   # out staging
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_center * c * (c + 9 * k + k),
            bytes_accessed=2 * bsz * (r_in * c + n_center * k),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP + 2 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, mask,
      fp_w1.astype(jnp.bfloat16),
      fp_w2.astype(jnp.bfloat16),
      fp_w3.astype(jnp.bfloat16),
      b1.astype(jnp.float32)[None, :], b2.astype(jnp.float32)[None, :],
      b3.astype(jnp.float32)[None, :],
      a1.astype(jnp.float32)[None, :], a2.astype(jnp.float32)[None, :],
      a3.astype(jnp.float32)[None, :])
    return out[:, :n_center]


def _vmem_estimate(h: int, w: int, c: int, k: int) -> int:
    r_in = (h + 2) * (w + 2)
    lanes = -(-max(c, k) // 128) * 128
    band = min(_BAND, ((h * (w + 2) + 15) // 16) * 16)
    return (
        2 * r_in * lanes          # xv bf16
        + 2 * (r_in + 2) * lanes  # h1 bf16
        + 2 * 2 * band * lanes    # staging bf16
        + 3 * 4 * band * lanes    # live f32 acc/temps (rough)
        + 2 * 11 * lanes * lanes  # weights
    )


# ---------------------------------------------------------------------------
# v2 kernel: transposed (C-on-sublanes, W-on-lanes) layout
# ---------------------------------------------------------------------------
#
# The v1 flat-row kernel above is a measured NEGATIVE result: its 3x3 taps
# are sublane slices at odd offsets, each forcing a whole-band relayout
# (7.97 ms vs XLA's 3.12 at B=64, 64x215x64). v2 removes every relayout by
# construction:
# - activations live as (B, H, C, Wp): C on sublanes (pad to 16 for bf16
#   DMA tiling), W on lanes (pad to a 128 multiple, >= W+1 zero lanes).
#   HBM DMA slices are tile-aligned with NO channel padding waste (the v1
#   NHWC alternative would have to pad C 64->128, doubling traffic).
# - dh taps select a different H row — a leading-axis offset, free.
# - dw taps are +-1 LANE rolls (pltpu.roll). With the zero lane padding,
#   a circular roll is exactly SAME padding: roll(+1) wraps lane Wp-1
#   (zero pad) into w=0's left halo; roll(-1) pulls lane W (zero pad)
#   into w=W-1's right halo.
# - a 4-slot ring buffer holds conv1 outputs pre-concatenated as
#   (3C, Wp) tap rows [h1[g-1]; h1[g]; h1[g+1]], so conv2 is three
#   (C, 3C) @ (3C, Wp) MXU dots per output row — contraction depth 3C.
# Zero-padded weights keep pad SUBLANES inert (prelu(0)=0); the lane mask
# re-zeroes pad LANES after each bias+PReLU so rolls keep reading zeros.
# The ring is f32, not bf16: Mosaic's tpu.dynamic_rotate is "not
# implemented ... with non-32-bit data" on v5e (hardware-measured), so
# rolls happen in f32 and the operands cast to bf16 at the MXU dots.


def _fused_t_kernel(h_dim, n_b, w1_ref, k2_ref, w3_ref, b1_ref, b2_ref,
                    b3_ref, a1_ref, a2_ref, a3_ref, lmask_ref,
                    x_hbm, out_hbm, xv, ring, yv, sems):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)
    cp = w1_ref.shape[0]
    wp = ring.shape[2]

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
    zrow = jnp.zeros((cp, wp), ring.dtype)
    ring[0, 0:cp] = zrow  # h1[-1] = 0 (top SAME halo for output row 0)
    for h in range(h_dim + 1):
        if h < h_dim:
            t1 = jnp.dot(w1_ref[:], xv[slot, h],
                         preferred_element_type=jnp.float32)
            h1 = (_prelu(t1 + b1_ref[:], a1_ref[:]) * lmask).astype(
                ring.dtype)
            # h1[h] is the dh=-1 tap of row h+1, dh=0 of row h, dh=+1 of
            # row h-1; slot g%4 is fully assembled right before its read
            ring[(h + 1) % 4, 0:cp] = h1
            ring[h % 4, cp:2 * cp] = h1
            if h > 0:
                ring[(h - 1) % 4, 2 * cp:3 * cp] = h1
        else:
            ring[(h_dim - 1) % 4, 2 * cp:3 * cp] = zrow  # h1[H] = 0
        if h >= 1:
            g = h - 1
            r = ring[g % 4]  # (3cp, Wp) assembled taps, f32
            rl = pltpu.roll(r, 1, 1).astype(jnp.bfloat16)
            rm = r.astype(jnp.bfloat16)
            # pltpu.roll requires shift >= 0: wp-1 is the circular -1
            rr = pltpu.roll(r, wp - 1, 1).astype(jnp.bfloat16)
            acc = jnp.dot(k2_ref[0], rl,
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(k2_ref[1], rm, preferred_element_type=jnp.float32)
            acc += jnp.dot(k2_ref[2], rr,
                           preferred_element_type=jnp.float32)
            h2 = (_prelu(acc + b2_ref[:], a2_ref[:]) * lmask).astype(
                jnp.bfloat16)
            t3 = jnp.dot(w3_ref[:], h2, preferred_element_type=jnp.float32)
            res = xv[slot, g].astype(jnp.float32)
            y = _prelu(t3 + b3_ref[:] + res, a3_ref[:]) * lmask
            yv[slot, g] = y.astype(yv.dtype)

    out_dma(b).start()

    @pl.when(b == n_b - 1)
    def _():
        out_dma(b).wait()

    @pl.when((b == n_b - 1) & (b >= 1))
    def _():
        out_dma(b - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_pallas_t(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3, lmask,
                    interpret: bool = False):
    """xt: (B, H, Cp, Wp) bf16, Cp a multiple of 16, Wp of 128, with >= 1
    zero lane past W and zero pad sublanes. Returns (B, H, Cp, Wp) bf16."""
    bsz, h_dim, cp, wp = xt.shape
    assert cp % 16 == 0 and wp % 128 == 0
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_t_kernel, h_dim, bsz),
        grid=(bsz,),
        in_specs=[vm] * 10 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h_dim, cp, wp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, h_dim, cp, wp), jnp.bfloat16),  # xv (dbl buf)
            pltpu.VMEM((4, 3 * cp, wp), jnp.float32),      # tap-row ring
            pltpu.VMEM((2, h_dim, cp, wp), jnp.bfloat16),  # yv (dbl buf)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h_dim * wp * cp * (2 * cp + 9 * cp),
            bytes_accessed=4 * bsz * h_dim * cp * wp,
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
def _fused_t_vmappable(interpret: bool):
    """Vmap-safe v2 kernel. The fold-ensemble inference path
    (training/ensemble.py, bench.py) vmaps the eval forward over stacked
    per-fold PARAMS with a shared batch; JAX's automatic pallas batching
    can't express that (and trips Mosaic on the manual-DMA specs), so:
    - mapped WEIGHTS: statically unroll over folds — same kernel, K calls
      (images are grid steps; a per-fold weight swap inside one grid is
      not expressible without K-fold VMEM cost);
    - mapped IMAGES only: fold the axis into the image batch dim (grid
      steps are independent)."""

    @custom_batching.custom_vmap
    def fn(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3, lmask):
        return _fused_pallas_t(xt, w1t, k2, w3t, b1, b2, b3, a1, a2, a3,
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


def _vmem_estimate_t(h: int, w: int, c: int) -> int:
    cp = -(-c // 16) * 16
    wp = -(-(w + 1) // 128) * 128
    return (
        2 * 2 * 2 * h * cp * wp      # xv + yv, double-buffered bf16
        + 4 * 4 * 3 * cp * wp        # ring f32 (bf16 rolls unimplemented)
        + 4 * 3 * cp * wp * 3        # live f32 acc + rolled temps (rough)
        + 2 * cp * cp * 5            # weights bf16
    )


def resnet_block_2d_infer_pallas_t(x, fp, interpret: bool = False):
    """v2 fused block on (B, H, W, C) input; transposes to the kernel
    layout at the boundary (two XLA relayout passes, ~56 MB each at the
    block0 bench shape)."""
    bsz, h, w, c = x.shape
    cp = -(-c // 16) * 16
    wp = -(-(w + 1) // 128) * 128
    xt = jnp.transpose(x.astype(jnp.bfloat16), (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))

    w2r = fp["w2"].reshape(3, 3, c, -1)

    def seg(dh, dw):  # (K, C) -> (cp, cp), zero pad rows/cols inert
        m = w2r[dh, dw].T
        return jnp.pad(m, ((0, cp - m.shape[0]), (0, cp - m.shape[1])))

    k2 = jnp.stack([
        jnp.concatenate([seg(dh, dw) for dh in range(3)], axis=1)
        for dw in range(3)
    ])  # (3, cp, 3cp), dw-major, matching the ring's dh part order

    def padw(m):
        return jnp.pad(m, ((0, cp - m.shape[0]), (0, cp - m.shape[1])))

    def padc(v):
        return jnp.pad(v, (0, cp - v.shape[0]))[:, None]

    lmask = (jnp.arange(wp) < w).astype(jnp.float32)[None, :]
    out = _fused_t_vmappable(interpret)(
        xt, padw(fp["w1"].T), k2, padw(fp["w3"].T),
        padc(fp["b1"]), padc(fp["b2"]), padc(fp["b3"]),
        padc(fp["a1"]), padc(fp["a2"]), padc(fp["a3"]), lmask)
    return jnp.transpose(out[:, :, :c, :w], (0, 1, 3, 2)).astype(x.dtype)


def resnet_block_2d_infer(x, variables, use_pallas_kernel: bool = False):
    """Eval-mode fused ResnetBlock2d forward. x: (B, H, W, C) -> same shape.

    Default path is the folded-weight XLA twin: BN collapsed into the conv
    weights, which removes the BN stages entirely and measured slightly
    faster than the unfused flax block on hardware (2.84 vs 3.04 ms at
    B=64, 64x215x64 bf16).

    ``use_pallas_kernel=True`` routes to the v2 transposed-layout Pallas
    kernel when it fits VMEM (see the v2 section above).
    ``use_pallas_kernel="v1"`` routes to the flat-row v1 kernel — a
    MEASURED NEGATIVE RESULT kept for the record (v5e-1, same shape):
    numerically exact (corr 0.9999994 vs flax) but 7.97 ms vs XLA's
    3.12 ms — its statically-shifted tap slices land at odd sublane
    offsets, and each triggers a whole-band relayout that costs more than
    the HBM round trips the fusion saves. v2 is the transposed
    (C, positions) rework ROADMAP.md called for: taps are lane rolls.
    """
    fp = fold_block_params(variables)
    bsz, h, w, c = x.shape
    k = fp["w1"].shape[1]
    if c != k:
        return resnet_block_2d_infer_xla(x, fp)
    if use_pallas_kernel and use_pallas_kernel != "v1":
        if _on_tpu() and _vmem_estimate_t(h, w, c) <= _VMEM_CAP:
            return resnet_block_2d_infer_pallas_t(x, fp)
        return resnet_block_2d_infer_xla(x, fp)
    if not (use_pallas_kernel == "v1" and _on_tpu()
            and _vmem_estimate(h, w, c, k) <= _VMEM_CAP):
        return resnet_block_2d_infer_xla(x, fp)

    wp, hp = w + 2, h + 2
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_flat = xp.reshape(bsz, hp * wp, c)
    # Mosaic HBM DMA slices must sit on the bf16 (16, 128) tiling grid:
    # round flat rows to 16 and channels to a full 128-lane tile (the lane
    # padding costs nothing extra in VMEM — it stores 128 lanes either way)
    r_pad = -(-(hp * wp) // 16) * 16
    c_pad = -(-c // 128) * 128
    x_flat = jnp.pad(x_flat, ((0, 0), (0, r_pad - hp * wp),
                              (0, c_pad - c)))
    # center mask in flat coords: 1 <= h_pos <= H and 1 <= w_pos <= W
    idx = np.arange(r_pad)
    hh, ww = idx // wp, idx % wp
    mask = (((hh >= 1) & (hh <= h) & (ww >= 1) & (ww <= w)
             & (idx < hp * wp)).astype(np.float32))[:, None]

    def padw(m):  # (C, K) -> (c_pad, c_pad): zero rows/cols are inert
        return jnp.pad(m, ((0, c_pad - m.shape[0]), (0, c_pad - m.shape[1])))

    def padv(v):
        return jnp.pad(v, (0, c_pad - v.shape[0]))

    w2p = jnp.pad(fp["w2"], ((0, 0), (0, c_pad - c), (0, c_pad - c)))
    out = _fused_pallas(
        x_flat, jnp.asarray(mask), padw(fp["w1"]), w2p, padw(fp["w3"]),
        padv(fp["b1"]), padv(fp["b2"]), padv(fp["b3"]),
        padv(fp["a1"]), padv(fp["a2"]), padv(fp["a3"]),
        h=h, w=w, interpret=not _on_tpu())
    # flat out row j maps to padded position (Wp+1)+j, so the (h, Wp)
    # reshape's column c is interior pixel (h+1, c+1): the first w columns
    # are exactly the valid region, the last two are halo-wrap discards
    out = out.reshape(bsz, h, wp, c_pad)[:, :, :w, :k]
    return out.astype(x.dtype)
