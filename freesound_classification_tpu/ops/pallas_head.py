"""Fused inference ConvBlock2d head: conv3x3 -> maxpool(2x2) -> BN -> PReLU
in one VMEM pass — the full-resolution conv output never touches HBM.

Why: the 5-fold predict program's single biggest traffic line is block0's
conv output (reference networks/classifiers.py:524-538 is the block; at the
bench shape the merged map is (320, 128, 431, 64) bf16 = 2.26 GB, written by
the conv and read back by the pool). scripts/probe_pool_rank.py bound-probed
the fused prize at ~10.7 ms of the 56.5 ms program: a stride-2-conv stand-in
(wrong numerics, same traffic shape) ran 45.8 ms.

TPU formulation — polyphase transposed layout, every tap a lane roll:
- The head's input has C_in <= 4 channels (block0: mel + frequency encoding
  = 2), so the conv contraction is intrinsically tiny (9 taps x C_in). The
  input is packed HOST/XLA-side as per-row PHASE PLANES: for each image row
  h, an (8, Wp) f32 page whose sublane s = 2*ci + parity holds the even
  (x[2w]) / odd (x[2w+1]) columns of channel ci — i.e. the input is already
  split into the two pooling phases along W. bn_in (eval-mode affine) is
  applied in the same packing pass, so the kernel's zero padding IS the
  flax conv's SAME zero padding of the bn_in output.
- A conv row h needs planes h-1, h, h+1 — a contiguous, 8-aligned sublane
  slice of the in-VMEM image (the f32 (8, 128) tile makes every plane
  exactly one tile row; no relayouts by construction).
- Both polyphase conv outputs (even/odd output columns) come from ONE MXU
  dot per conv row: K = [R; roll(R,+1); roll(R,-1)] stacks the three lane
  shifts of the 24-sublane row context (72 x Wp), and the (2*depth, 72)
  weight matrix's rows 0:depth produce y[2wo] while rows depth:2*depth
  produce y[2wo+1] (see _build_wall for the exact tap -> column map).
  Circular rolls are exact SAME padding because the lane tail is zero.
- The 2x2/2 maxpool collapses to an elementwise max of FOUR (depth, Wp)
  planes (two conv rows x two phases) — no strided lane selection, which
  probe_pool_rank.py measured as a physical relayout in every lowering.
  The conv bias and eval-mode bn_out fold into a single post-pool affine
  (bias commutes with max); PReLU runs on the pooled tile.
- Output is written transposed, (B, H/2, depth, Wp) bf16; the caller pays
  one XLA transpose back to NHWC (~0.6 GB at the bench shape) — still ~4x
  less traffic than the unfused conv+pool round trip it replaces.

Used by models/blocks.py ConvBlock2d(fused_head=True) at eval time on TPU.
Parity vs the unfused flax head is tested in tests/test_pallas_head.py
(interpret mode); Mosaic lowering is gated on hardware by tpu_smoke.py.
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


def fold_head_params(variables, eps: float = 1e-5):
    """Fold the head's eval-mode BNs around the conv.

    ``variables``: the ConvBlock2d's own {"params", "batch_stats"} subtree
    (bn_in/conv/bn_out/prelu as created by models/blocks.py). bn_in stays an
    input affine (applied in the packing pass — folding it into the conv
    weights would corrupt SAME padding, which pads bn_in's OUTPUT with
    zeros); conv bias + bn_out collapse into one post-pool affine since a
    per-channel constant commutes with max pooling.
    """
    p = variables["params"]
    bs = variables["batch_stats"]
    s_in = p["bn_in"]["scale"] / jnp.sqrt(bs["bn_in"]["var"] + eps)
    t_in = p["bn_in"]["bias"] - bs["bn_in"]["mean"] * s_in
    s_out = p["bn_out"]["scale"] / jnp.sqrt(bs["bn_out"]["var"] + eps)
    t_out = (p["conv"]["bias"] - bs["bn_out"]["mean"]) * s_out \
        + p["bn_out"]["bias"]
    return {
        "s_in": s_in, "t_in": t_in,
        "kern": p["conv"]["kernel"],  # (3, 3, C_in, depth)
        "scale": s_out, "bias": t_out,
        "alpha": p["prelu"]["alpha"],
    }


def _build_wall(kern):
    """Tap weights -> the (2*depth, 72) polyphase matrix.

    Column index = 24*r + 8*dh + (2*ci + parity) where r in {0: no roll,
    1: roll(+1) = lane w reads w-1, 2: roll(-1) = lane w reads w+1} and the
    sublane s holds phase plane (ci, parity). Row co computes the even
    output column y[2wo], row depth+co the odd column y[2wo+1]:

      y[2wo]   = k[dh,0]*xo[wo-1] + k[dh,1]*xe[wo] + k[dh,2]*xo[wo]
      y[2wo+1] = k[dh,0]*xe[wo]   + k[dh,1]*xo[wo] + k[dh,2]*xe[wo+1]
    """
    c_in, depth = kern.shape[2], kern.shape[3]
    w = jnp.zeros((2 * depth, 72), kern.dtype)
    ev, od = slice(0, depth), slice(depth, 2 * depth)
    for dh in range(3):
        for ci in range(c_in):
            se = 8 * dh + 2 * ci        # even-phase plane of ci
            so = se + 1                  # odd-phase plane
            w = w.at[ev, se].set(kern[dh, 1, ci])
            w = w.at[ev, so].set(kern[dh, 2, ci])
            w = w.at[ev, 24 + so].set(kern[dh, 0, ci])   # roll(+1) section
            w = w.at[od, se].set(kern[dh, 0, ci])
            w = w.at[od, so].set(kern[dh, 1, ci])
            w = w.at[od, 48 + se].set(kern[dh, 2, ci])   # roll(-1) section
    return w


def _pack_input(x, s_in, t_in):
    """(B, H, W, C) -> (B, 8*(H+2), Wp) f32 phase planes, bn_in applied.

    Plane page for padded row p (p=0 and p=H+1 are the zero SAME halo):
    sublane 2*ci+0 holds bn_in(x)[p-1, 0::2, ci], 2*ci+1 the odd columns;
    sublanes 2*C..8 and lanes past the phase width are zero (so the
    kernel's circular rolls wrap zeros — exact SAME padding).
    """
    b, h, w, c = x.shape
    n_e = (w + 1) // 2
    wp = -(-(n_e + 1) // 128) * 128
    xbn = x.astype(jnp.float32) * s_in.astype(jnp.float32) \
        + t_in.astype(jnp.float32)
    xt = jnp.transpose(xbn, (0, 1, 3, 2))  # (B, H, C, W)
    xe = jnp.pad(xt[..., 0::2], ((0, 0),) * 3 + ((0, wp - n_e),))
    xo = jnp.pad(xt[..., 1::2], ((0, 0),) * 3 + ((0, wp - (w // 2)),))
    planes = jnp.stack([xe, xo], axis=3).reshape(b, h, 2 * c, wp)
    planes = jnp.pad(planes, ((0, 0), (1, 1), (0, 8 - 2 * c), (0, 0)))
    return planes.reshape(b, 8 * (h + 2), wp)


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def _head_kernel(h_out, n_b, w_ref, s_ref, t_ref, a_ref, x_hbm, out_hbm,
                 xv, yv, sems):
    b = pl.program_id(0)
    slot = jax.lax.rem(b, 2)
    wp = xv.shape[-1]
    d2 = w_ref.shape[0]
    d = d2 // 2

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

    for ho in range(h_out):
        ys = []
        for j in range(2):
            # conv row 2*ho+j reads planes (2*ho+j) + {0,1,2} of the padded
            # image — one contiguous 8-aligned sublane slice (f32 tiles)
            r = xv[slot, 8 * (2 * ho + j): 8 * (2 * ho + j) + 24]
            kmat = jnp.concatenate(
                [r, pltpu.roll(r, 1, 1), pltpu.roll(r, wp - 1, 1)], axis=0
            ).astype(jnp.bfloat16)
            ys.append(jnp.dot(w_ref[:], kmat,
                              preferred_element_type=jnp.float32))
        y0, y1 = ys
        # 2x2 maxpool = elementwise max of the two phases of two conv rows
        p = jnp.maximum(jnp.maximum(y0[0:d], y0[d:d2]),
                        jnp.maximum(y1[0:d], y1[d:d2]))
        out = _prelu(p * s_ref[:] + t_ref[:], a_ref[:])
        yv[slot, ho] = out.astype(yv.dtype)

    out_dma(b).start()

    @pl.when(b == n_b - 1)
    def _():
        out_dma(b).wait()

    @pl.when((b == n_b - 1) & (b >= 1))
    def _():
        out_dma(b - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _head_pallas(xp, wall, scale, bias, alpha, interpret: bool = False):
    """xp: (B, 8*(H+2), Wp) f32 phase planes; wall: (2*depth, 72).
    Returns (B, H//2, depth, Wp) bf16 (pooled, bn_out+PReLU applied)."""
    bsz, rows, wp = xp.shape
    assert rows % 8 == 0 and wp % 128 == 0
    h_dim = rows // 8 - 2
    h_out = h_dim // 2
    d = wall.shape[0] // 2
    out = pl.pallas_call(
        functools.partial(_head_kernel, h_out, bsz),
        grid=(bsz,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h_out, d, wp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp), jnp.float32),     # xv (dbl buf)
            pltpu.VMEM((2, h_out, d, wp), jnp.bfloat16),  # yv (dbl buf)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * 2 * h_out * 2 * d * 72 * wp,
            bytes_accessed=bsz * (4 * rows * wp + 2 * h_out * d * wp),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP + 2 * 1024 * 1024),
        interpret=interpret,
    )(wall.astype(jnp.bfloat16),
      scale.astype(jnp.float32)[:, None],
      bias.astype(jnp.float32)[:, None],
      alpha.astype(jnp.float32)[:, None], xp)
    return out


@functools.lru_cache(maxsize=2)
def _head_vmappable(interpret: bool):
    """Vmap rule for the fold-ensemble path (training/ensemble.py, bench.py):
    per-fold bn_in stats make the packed input AND the weights fold-mapped,
    so the rule statically unrolls over folds (same kernel, K calls);
    images-only mapping folds into the batch grid."""

    @custom_batching.custom_vmap
    def fn(xp, wall, scale, bias, alpha):
        return _head_pallas(xp, wall, scale, bias, alpha,
                            interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        if in_batched[0] and not any(in_batched[1:]):
            xp = args[0]
            bsz = xp.shape[1]
            out = fn(xp.reshape(axis_size * bsz, *xp.shape[2:]), *args[1:])
            return out.reshape(axis_size, bsz, *out.shape[1:]), True
        outs = []
        for i in range(axis_size):
            sl = [a[i] if bb else a for a, bb in zip(args, in_batched)]
            outs.append(fn(*sl))
        return jnp.stack(outs), True

    return fn


def _vmem_estimate(h: int, w: int, depth: int) -> int:
    wp = -(-((w + 1) // 2 + 1) // 128) * 128
    return (
        2 * 4 * 8 * (h + 2) * wp       # xv double-buffered f32
        + 2 * 2 * (h // 2) * depth * wp  # yv double-buffered bf16
        + 4 * (72 + 3 * 2 * depth) * wp  # kmat + dot temps f32 (rough)
    )


def head_supported(shape, depth: int) -> bool:
    """Static guard: shapes the kernel handles within VMEM."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return (
        1 <= c <= 4
        and h >= 2 and w >= 2
        and depth % 16 == 0 and 16 <= depth <= 128
        and _vmem_estimate(h, w, depth) <= _VMEM_CAP
    )


def conv_block_2d_head_infer(x, variables, interpret: bool | None = None,
                             dtype: jnp.dtype | None = None):
    """Eval-mode fused head forward. x: (B, H, W, C_in) ->
    (B, H//2, W//2, depth), numerically the unfused bn_in -> conv3x3(SAME)
    -> maxpool(2,2) -> bn_out -> PReLU chain (bf16 conv accumulation order
    differs; parity tested to bf16 tolerance). ``dtype`` is the block's
    compute dtype — the output is cast to it so the fused path feeds the
    downstream ResnetBlock exactly what the unfused PReLU would (not
    x.dtype, which may differ for an f32 input into a bf16 model)."""
    if interpret is None:
        interpret = not _on_tpu()
    fp = fold_head_params(variables)
    xp = _pack_input(x, fp["s_in"], fp["t_in"])
    wall = _build_wall(fp["kern"])
    out = _head_vmappable(bool(interpret))(
        xp, wall, fp["scale"], fp["bias"], fp["alpha"])
    w_out = x.shape[2] // 2
    out = jnp.transpose(out[:, :, :, :w_out], (0, 1, 3, 2))
    return out.astype(x.dtype if dtype is None else dtype)
