"""Pallas TPU kernels for the featurization hot path.

The reference's per-step device program starts with ``torch.stft`` ->
magnitude -> mel conv1d -> log (reference: ops/utils.py:110-127 +
networks/classifiers.py:574-579). On TPU the FFT itself is best left to XLA
(native rFFT), but the tail — complex magnitude, the (T, F) x (F, M) mel
projection, and the log — is one VMEM-resident Pallas kernel here, so the
magnitude never round-trips to HBM and the mel matmul lands on the MXU.

All shapes are padded to lane/sublane multiples outside the kernel; the mel
filterbank's zero-padding rows/cols make the padding numerically inert.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-4


def _merge_lead(axis_size: int, x, batched: bool):
    """Fold a custom_vmap leading axis into the row/batch dim (axis 0)."""
    if not batched:
        x = jnp.broadcast_to(x[None], (axis_size, *x.shape))
    return x.reshape(axis_size * x.shape[1], *x.shape[2:])

_ROW_TILE = 256  # rows (= batch*time frames) per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mel_log_kernel(re_ref, im_ref, fb_ref, out_ref):
    mag = jnp.sqrt(re_ref[:] * re_ref[:] + im_ref[:] * im_ref[:])
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + LOG_EPS)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mel_project_log_2d(
    re: jnp.ndarray, im: jnp.ndarray, fb_t: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(R, F) re/im spectra x (F, M) filterbank -> (R, M) log-mel rows."""
    rows, n_freq = re.shape
    n_mel = fb_t.shape[1]

    rows_p = _round_up(rows, _ROW_TILE)
    freq_p = _round_up(n_freq, 128)
    mel_p = _round_up(n_mel, 128)

    re_p = jnp.pad(re, ((0, rows_p - rows), (0, freq_p - n_freq)))
    im_p = jnp.pad(im, ((0, rows_p - rows), (0, freq_p - n_freq)))
    fb_p = jnp.pad(fb_t, ((0, freq_p - n_freq), (0, mel_p - n_mel)))

    grid = (rows_p // _ROW_TILE,)
    out = pl.pallas_call(
        _mel_log_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_ROW_TILE, freq_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROW_TILE, freq_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((freq_p, mel_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROW_TILE, mel_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_p, mel_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_p * freq_p * mel_p + 3 * rows_p * freq_p,
            bytes_accessed=4 * (2 * rows_p * freq_p + freq_p * mel_p + rows_p * mel_p),
            transcendentals=rows_p * (freq_p + mel_p),
        ),
        interpret=interpret,
    )(re_p, im_p, fb_p)
    return out[:rows, :n_mel]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def static_bound_exceeded(x, bound: float):
    """None if ``x`` is a tracer (unknown at trace time), else whether
    max(x) exceeds ``bound``.

    The windowed kernels below are only valid up to a static playback
    rate/stretch factor; beyond it they would synthesize silence or garbage
    with no error. Concrete out-of-domain inputs must therefore either raise
    (the raw kernel wrappers) or fall back to the XLA formulation (the
    public ops in ops/augment.py, ops/pv.py). Traced values cannot be
    checked — in-jit callers are responsible for staying in-domain (the
    augmentation chain's ranges are proven: pitch*speed <= 1.31, PV rate
    <= 1.19)."""
    if isinstance(x, jax.core.Tracer):
        return None
    import numpy as np

    return bool(np.max(np.asarray(x)) > bound)


# ---------------------------------------------------------------------------
# Linear-interpolation resampling (playback-rate change)
#
# The augmentation chain's hot spot: as an XLA take_along_axis it is an
# elementwise HBM gather (~700 ms/step at 64 x 10 s clips). Access is
# monotonic with bounded stride, so each output tile of K samples reads a
# W-sample source window DMA'd into VMEM. Per 128-output row, linear
# interpolation is ONE triangle-weight mask — weights[w, k] =
# max(0, 1 - |w - pos_k|) is exactly (1-frac) at floor(pos) and frac at
# floor(pos)+1 — contracted against a 384-sample sub-window on the MXU.
# The per-row sub-window (3 x 128-aligned sublanes of the tile window)
# bounds mask construction at O(384 x 128) per row instead of the full
# O(2048 x 128) (the original two-one-hot formulation was ~112 ms/step at
# 64 x 10 s; this is ~10x cheaper in VPU mask-building work).
# ---------------------------------------------------------------------------

_RS_TILE = 1024  # output samples per grid step (one (8, 128) vreg tile)
_RS_WIN = 2048  # tile source window (>= TILE * max_factor + 129 margin)
_RS_SUB = 384  # per-row sub-window: 128 (alignment) + max_factor*128 + 2
_RS_MAX_FACTOR = 1.8  # supported playback rate (aug uses pitch*speed <= 1.31)


def _resample_kernel(factor_ref, wave_hbm, out_ref, win, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f = factor_ref[b]

    start_f = (t * _RS_TILE).astype(jnp.float32) * f
    # align the DMA start down to a 128-sample block; the remainder moves
    # into the in-window offset. wave_hbm is (B, NB, 128) block-major.
    nb = wave_hbm.shape[1]
    sb = jnp.clip(jnp.floor(start_f).astype(jnp.int32) // 128, 0,
                  nb - _RS_WIN // 128)

    copy = pltpu.make_async_copy(
        wave_hbm.at[b, pl.ds(sb, _RS_WIN // 128), :], win, sem
    )
    copy.start()

    # per-sublane source index grid (w, k): lane index w within one
    # 128-sample sub-window block, per output lane k
    w_idx = jax.lax.broadcasted_iota(
        jnp.int32, (128, 128), 0).astype(jnp.float32)
    k_col = jax.lax.broadcasted_iota(
        jnp.int32, (1, 128), 1).astype(jnp.float32)
    copy.wait()

    start = (sb * 128).astype(jnp.float32)
    rows = []
    for r in range(8):
        pos = (t * _RS_TILE + r * 128 + k_col) * f  # (1, 128) absolute
        pos_rel = pos - start  # within tile window
        # row sub-window: 3 aligned sublanes covering [row start, +231];
        # pos is increasing, so the row minimum is lane 0
        row_lo = (t * _RS_TILE + r * 128) * f - start
        s0 = jnp.clip(jnp.floor(row_lo).astype(jnp.int32) // 128, 0,
                      _RS_WIN // 128 - 3)
        sub = win[pl.ds(s0, 3), :]  # (3, 128) ref read, dynamic sublanes
        p = pos_rel - (s0 * 128).astype(jnp.float32)  # (1, 128) in [0, 384)
        # triangle weights == linear interpolation taps; one (128, 128)
        # mask + (1, 128)@(128, 128) dot per sub-window block
        acc = None
        for s in range(3):
            weights = jnp.maximum(
                0.0, 1.0 - jnp.abs((w_idx + (s * 128)) - p))
            d = jnp.dot(sub[s : s + 1, :], weights,
                        preferred_element_type=jnp.float32)  # (1, 128)
            acc = d if acc is None else acc + d
        rows.append(acc)
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resample_pallas(wave: jnp.ndarray, factor: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    b, l = wave.shape
    l_pad = _round_up(max(l, _RS_WIN), _RS_TILE)
    wave_p = jnp.pad(wave, ((0, 0), (0, l_pad - l)))
    # block-major (B, NB, 128): DMAs slice whole 128-sample blocks and the
    # kernel's dynamic reads stay on the (well-supported) sublane dimension
    wave_p = wave_p.reshape(b, l_pad // 128, 128)
    n_tiles = l_pad // _RS_TILE

    out = pl.pallas_call(
        _resample_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # all factors
            pl.BlockSpec(memory_space=pl.ANY),  # whole wave, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_RS_WIN // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l_pad * _RS_SUB,
            bytes_accessed=4 * (b * l_pad * 3),
            transcendentals=0,
        ),
        interpret=interpret,
    )(factor.astype(jnp.float32), wave_p.astype(jnp.float32))
    return out.reshape(b, l_pad)[:, :l]


@functools.lru_cache(maxsize=4)
def _resample_vmappable(interpret: bool):
    """Vmap-safe wrapper: jax's automatic pallas batching prepends a dim to
    every operand, which breaks the 1-D SMEM ``factor`` block under Mosaic's
    last-two-dims tiling rule (a (K, B) block is neither 8-divisible nor
    equal to the array). Rows are independent, so vmap == flattening the
    mapped axis into the batch dim — exactly what this custom_vmap rule
    does (found via the fold-parallel train step, which vmaps the
    augmenter over folds on one chip)."""

    @custom_batching.custom_vmap
    def fn(wave, factor):
        return _resample_pallas(wave, factor, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, wave, factor):  # noqa: ANN001
        k = axis_size
        b = wave.shape[1] if in_batched[0] else wave.shape[0]
        out = fn(_merge_lead(k, wave, in_batched[0]),
                 _merge_lead(k, factor, in_batched[1]))
        return out.reshape(k, b, *out.shape[1:]), True

    return fn


def resample_linear_pallas(wave: jnp.ndarray, factor: jnp.ndarray
                           ) -> jnp.ndarray:
    """(B, L) x (B,) playback-rate change; gather-free Pallas kernel.

    Valid for factor in (0, _RS_MAX_FACTOR]. Off-TPU runs interpreted.
    Masking to new valid lengths is the caller's job (ops.augment
    .resample_rate wraps this, and falls back to the XLA gather path for
    concrete out-of-domain factors instead of raising)."""
    if static_bound_exceeded(factor, _RS_MAX_FACTOR):
        raise ValueError(
            f"resample_linear_pallas supports factor <= {_RS_MAX_FACTOR}; "
            "use ops.augment.resample_rate, which falls back to the XLA "
            "path for out-of-domain factors")
    return _resample_vmappable(not _on_tpu())(wave, factor)



# ---------------------------------------------------------------------------
# Fused phase-vocoder resynthesis (+ in-kernel overlap-add)
#
# The PV stretch's output-domain middle (frame interpolation gathers, the
# sequential phase accumulation, sin/cos, and the inverse-DFT synthesis
# matmul) is one kernel: per 128 output frames it DMAs the needed analysis
# rows, forms the interpolation as two small MXU matmuls (triangle weights
# for magnitude lerp, one-hot for the phase-advance pick), carries the
# accumulated phase across grid steps in VMEM scratch (a single sequential
# pass instead of XLA's log-depth cumsum over HBM), rotates, and contracts
# against the windowed inverse-rDFT basis on the MXU. As separate XLA ops
# this stage cost ~22 ms at 64 x 10 s (gathers 12.3, cumsum 6.4,
# sincos 2.3); fused it is HBM-traffic bound on the analysis tiles alone.
#
# The windowed overlap-add runs INSIDE the kernel too (round-2): frame k's
# hop-wide chunk o lands on OLA row k+o, so per tile the OLA is r exact
# shift matmuls (one-hot shift matrices x bf16-exact chunk values; single
# bf16 MXU passes are exact here) plus an incomplete-top-rows carry into
# the next grid step. Writing OLA'd (rows, hop) f32 instead of raw
# (frames, n_fft) bf16 frames halves the kernel's HBM writes AND deletes
# the former 226 MB syn-buffer round trip through the XLA pad-add tail
# (9.6 of PV's 28.7 ms at 64 x 10 s; probe_pv_breakdown.py).
# ---------------------------------------------------------------------------

_PV_TM = 128  # output frames per grid step
# analysis rows per step: >= TM * max_rate + interp margin + sublane
# alignment slack (the DMA start must sit on the (8, 128) tiling grid)
_PV_TILE_IN = 184
_PV_MAX_RATE = 1.3  # supported stretch position step (aug uses <= 1.19)


def _pv_resynth_kernel(t_in_real, hop, rate_ref, mag_hbm, dphi_hbm,
                       phase0_ref, icos_ref, isin_ref, out_ref,
                       mag_tiles, dphi_tiles, carry, ola_carry, sems):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    rate = rate_ref[b]
    t_in = mag_hbm.shape[1]  # zero-PADDED row count (DMA bounds only)

    def tile_start(tt):
        # aligned to the sublane tiling (Mosaic requires HBM slice offsets
        # on the (8, 128) grid); the remainder moves into rel
        s = jnp.clip(
            (jnp.floor((tt * _PV_TM) * rate).astype(jnp.int32) // 8) * 8,
            0, t_in - _PV_TILE_IN)
        return pl.multiple_of(s, 8)

    def make_dmas(tt, slot):
        s = tile_start(tt)
        return (
            pltpu.make_async_copy(
                mag_hbm.at[b, pl.ds(s, _PV_TILE_IN), :],
                mag_tiles.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                dphi_hbm.at[b, pl.ds(s, _PV_TILE_IN), :],
                dphi_tiles.at[slot], sems.at[slot, 1]),
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        m0, d0 = make_dmas(0, 0)
        m0.start()
        d0.start()
        carry[:] = phase0_ref[0]
        ola_carry[:] = jnp.zeros(ola_carry.shape, ola_carry.dtype)

    # double buffering: start the next tile's DMAs before waiting on the
    # current ones (its slot was drained two steps ago)
    @pl.when(t + 1 < nt)
    def _():
        mn, dn = make_dmas(t + 1, jax.lax.rem(t + 1, 2))
        mn.start()
        dn.start()

    start = tile_start(t)
    # output-frame analysis positions, relative to the tile start; clamp to
    # the REAL frame count so tail frames repeat the last analysis frame
    # exactly like the XLA path (round-1 ADVICE: clamping to the padded
    # count interpolated into zero rows and faded the tail to silence).
    # mags clamp to t_in_real-1 (XLA: i0<=t_in-2 with frac->1), the dphi
    # pick to t_in_real-2 (XLA repeats the last real dphi row).
    j_col = jax.lax.broadcasted_iota(
        jnp.int32, (_PV_TM, 1), 0).astype(jnp.float32)
    pos = (t * _PV_TM + j_col) * rate  # (TM, 1) absolute
    pos_m = jnp.clip(pos, 0.0, (t_in_real - 1) * 1.0)
    pos_d = jnp.clip(pos, 0.0, (t_in_real - 2) * 1.0)
    startf = start.astype(jnp.float32)
    s_row = jax.lax.broadcasted_iota(
        jnp.int32, (_PV_TM, _PV_TILE_IN), 1).astype(jnp.float32)
    # triangle weights = linear interp taps; exact one-hot = floor pick
    w_tri = jnp.maximum(0.0, 1.0 - jnp.abs(s_row - (pos_m - startf)))
    w_one = (s_row == jnp.floor(pos_d - startf)).astype(jnp.float32)

    copy_m, copy_d = make_dmas(t, slot)
    copy_m.wait()
    copy_d.wait()
    mag_tile = mag_tiles[pl.ds(slot, 1)][0]
    dphi_tile = dphi_tiles[pl.ds(slot, 1)][0]
    # mags tolerate bf16 MXU passes (default); the PHASE path cannot:
    # Mosaic lowers f32 dots to a SINGLE bf16 pass by default, and bf16
    # truncation of dphi values up to ~800 rad randomizes the synthesis
    # phase entirely (hardware-smoke finding: corr ~ -0.1 vs XLA while CPU
    # interpret mode was exact). HIGHEST = bf16x6 passes = f32-exact picks.
    hi = jax.lax.Precision.HIGHEST
    mags = jnp.dot(w_tri, mag_tile, preferred_element_type=jnp.float32)
    dphi = jnp.dot(w_one, dphi_tile, preferred_element_type=jnp.float32,
                   precision=hi)

    # exclusive prefix sum as a strictly-lower-triangular MXU contraction
    # (Mosaic has no cumsum lowering; a (TM, TM) ones-triangle dot is a
    # 21 MFLOP afterthought on the MXU and yields the exclusive form
    # directly)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (_PV_TM, _PV_TM), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (_PV_TM, _PV_TM), 1)
    ).astype(jnp.float32)
    excl = jnp.dot(tri, dphi, preferred_element_type=jnp.float32,
                   precision=hi)
    # principal-value wrap before sincos: Mosaic's sin/cos lowering has no
    # wide-range argument reduction (hardware-smoke finding — unwrapped
    # phases reach ~1e5 rad and synthesized pure garbage, corr ~ -0.1,
    # while CPU interpret mode was exact); the carry is wrapped too so it
    # stays O(pi) for the whole grid instead of drifting in f32
    two_pi = 6.283185307179586
    phis = carry[:] + excl
    phis = phis - two_pi * jnp.floor(phis / two_pi + 0.5)
    new_carry = carry[:] + jnp.sum(dphi, axis=0, keepdims=True)
    carry[:] = new_carry - two_pi * jnp.floor(new_carry / two_pi + 0.5)

    out_re = (mags * jnp.cos(phis)).astype(jnp.bfloat16)
    out_im = (mags * jnp.sin(phis)).astype(jnp.bfloat16)
    syn = (
        jnp.dot(out_re, icos_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(out_im, isin_ref[:], preferred_element_type=jnp.float32)
    )
    # bf16 round-trip preserves the former HBM-buffer quantization exactly,
    # so the fused OLA below is numerically the old XLA pad-add tail
    synb = syn.astype(jnp.bfloat16)

    # Overlap-add within the tile: OLA row k (hop samples) sums frame k-o's
    # chunk o. Expressed as r exact shift matmuls — S_o[j, i] = [i == j - o]
    # one-hots picking bf16-exact values accumulate exactly in the MXU's
    # f32 accumulator even under Mosaic's single-bf16-pass default — plus a
    # carry of the top rows' previous-tile contributions (P_o picks i =
    # TM + j - o, nonzero only for j < o <= r-1).
    tm = out_ref.shape[1]
    jj = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (tm, tm), 1)
    r = icos_ref.shape[1] // hop
    acc = None
    carry_acc = None
    for o in range(r):
        chunk = synb[:, o * hop:(o + 1) * hop]
        if o == 0:
            shifted = chunk.astype(jnp.float32)
        else:
            shifted = jnp.dot((ii == jj - o).astype(jnp.bfloat16), chunk,
                              preferred_element_type=jnp.float32)
            pc = jnp.dot((ii == tm + jj - o).astype(jnp.bfloat16), chunk,
                         preferred_element_type=jnp.float32)
            carry_acc = pc if carry_acc is None else carry_acc + pc
        acc = shifted if acc is None else acc + shifted
    out_ref[0] = acc + ola_carry[:]
    ola_carry[:] = carry_acc


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "t_out", "hop", "interpret",
                                    "t_in_real"))
def _pv_resynth(mag, dphi_in, phase0, rate, icos, isin, n_fft: int,
                t_out: int, hop: int, interpret: bool = False,
                t_in_real: int | None = None):
    """(B, t_in, F) mag + (B, t_in-1, F) dphi -> (B, t_out + n_fft//hop - 1,
    hop) f32 OLA rows: the windowed synthesis frames
    irfft(mags*e^{i phis}) * window, overlap-added in-kernel (frame k's
    chunk o lands on row k+o); reshape to (B, ola_len) and normalize by the
    window-squared sum outside. Requires hop % 128 == 0 and
    n_fft % hop == 0 (ops/pv.py routes away otherwise)."""
    b, t_rows, f = mag.shape
    # t_in_real: the REAL analysis frame count for interpolation clamping.
    # When the prologue pre-pads (ops/pv.py aligned path), mag/dphi arrive
    # already lane/sublane-aligned with ghost rows/bins the kernel never
    # reads, t_rows > t_in_real, and every jnp.pad below is zero-width
    # (folded away by XLA) — the unaligned path's pads cost ~1 GB of HBM
    # round trips at 64 x 10 s (probe_pv_context.py).
    t_in = t_in_real if t_in_real is not None else t_rows
    r = n_fft // hop
    rows_total = t_out + r - 1
    f_pad = _round_up(f, 128)
    t_in_pad = _round_up(max(t_rows, _PV_TILE_IN), 8)
    # grid covers every OLA row; tiles past t_out synthesize clamped ghost
    # frames whose rows land beyond rows_total (or are crop-dead: the
    # n_fft//2 crop never reads rows >= t_out; see ops/pv.py)
    t_out_pad = _round_up(rows_total, _PV_TM)

    mag_p = jnp.pad(
        mag.astype(jnp.float32),
        ((0, 0), (0, t_in_pad - t_rows), (0, f_pad - f)))
    # dphi row r = advance from analysis frame r to r+1; pad the missing
    # final row with zeros (only reachable through the i0 clip)
    dphi_p = jnp.pad(
        dphi_in.astype(jnp.float32),
        ((0, 0), (0, t_in_pad - dphi_in.shape[1]), (0, f_pad - f)))
    phase0_p = jnp.pad(
        phase0.astype(jnp.float32), ((0, 0), (0, f_pad - f)))[:, None, :]
    # the bases stay at the natural bin count even when mag/dphi arrive
    # pre-padded; zero rows keep ghost-bin contributions at 0
    icos_p = jnp.pad(
        icos.astype(jnp.bfloat16), ((0, f_pad - icos.shape[0]), (0, 0)))
    isin_p = jnp.pad(
        isin.astype(jnp.bfloat16), ((0, f_pad - isin.shape[0]), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_pv_resynth_kernel, t_in, hop),
        grid=(b, t_out_pad // _PV_TM),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rate
            pl.BlockSpec(memory_space=pl.ANY),  # mag, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # dphi, manual DMA
            pl.BlockSpec((1, 1, f_pad), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # phase0 row
            pl.BlockSpec((f_pad, n_fft), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),  # icos
            pl.BlockSpec((f_pad, n_fft), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),  # isin
        ],
        out_specs=pl.BlockSpec(
            (1, _PV_TM, hop), lambda i, t: (i, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_out_pad, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, _PV_TILE_IN, f_pad), jnp.float32),
            pltpu.VMEM((2, _PV_TILE_IN, f_pad), jnp.float32),
            pltpu.VMEM((1, f_pad), jnp.float32),
            pltpu.VMEM((_PV_TM, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_out_pad * f_pad * (2 * _PV_TILE_IN + 2 * n_fft),
            bytes_accessed=4 * b * (
                2 * (t_out_pad // _PV_TM) * _PV_TILE_IN * f_pad
                + t_out_pad * hop),
            transcendentals=2 * b * t_out_pad * f_pad,
        ),
        interpret=interpret,
    )(rate.astype(jnp.float32), mag_p, dphi_p, phase0_p, icos_p, isin_p)
    return out[:, :rows_total]


@functools.lru_cache(maxsize=16)
def _pv_resynth_vmappable(n_fft: int, t_out: int, hop: int, interpret: bool,
                          t_in_real: int | None = None):
    """Vmap-safe PV resynthesis (same story as _resample_vmappable: the
    1-D SMEM ``rate`` operand breaks under automatic pallas batching, and
    rows are independent so the mapped axis folds into the batch dim).
    ``icos``/``isin`` are the shared inverse-DFT bases — the kernel cannot
    express per-row bases, so a batched basis is rejected."""

    @custom_batching.custom_vmap
    def fn(mag, dphi_in, phase0, rate, icos, isin):
        return _pv_resynth(mag, dphi_in, phase0, rate, icos, isin,
                           n_fft, t_out, hop, interpret=interpret,
                           t_in_real=t_in_real)

    @fn.def_vmap
    def _rule(axis_size, in_batched, mag, dphi_in, phase0, rate,
              icos, isin):  # noqa: ANN001
        if in_batched[4] or in_batched[5]:
            raise NotImplementedError(
                "pv_resynth_pallas: per-batch inverse-DFT bases are not "
                "supported under vmap (the bases are shared weights)")
        k = axis_size
        b = mag.shape[1] if in_batched[0] else mag.shape[0]
        out = fn(_merge_lead(k, mag, in_batched[0]),
                 _merge_lead(k, dphi_in, in_batched[1]),
                 _merge_lead(k, phase0, in_batched[2]),
                 _merge_lead(k, rate, in_batched[3]),
                 icos, isin)
        return out.reshape(k, b, *out.shape[1:]), True

    return fn


def pv_resynth_pallas(mag, dphi_in, phase0, rate, icos, isin, n_fft: int,
                      t_out: int, hop: int, t_in_real: int | None = None):
    """Fused PV resynthesis + in-kernel OLA -> (B, t_out + n_fft//hop - 1,
    hop) f32 rows; off-TPU runs interpreted (see ops/pv.py).
    ``t_in_real``: real analysis frame count when mag/dphi arrive
    pre-aligned with ghost rows/bins (ops/pv.py aligned prologue)."""
    return _pv_resynth_vmappable(n_fft, t_out, hop, not _on_tpu(),
                                 t_in_real)(
        mag, dphi_in, phase0, rate, icos, isin)


def mel_project_log_ri(
    re: jnp.ndarray, im: jnp.ndarray, fb_t: jnp.ndarray
) -> jnp.ndarray:
    """Real/imag spectra (..., T, F) x (F, M) filterbank -> log-mel (..., M, T).

    Fuses |.| -> mel matmul -> log(+1e-4) in one Pallas kernel. Takes the
    split (re, im) pair directly — complex64 intermediates lower to
    UNIMPLEMENTED on some TPU runtimes (round-1 HEAD regression), so the
    block-DFT producer (dsp.stft_spectrum_dft) feeds this without ever
    forming a complex array. Off-TPU the kernel runs in interpreter mode so
    tests on the CPU backend stay exact.
    """
    *lead, n_frames, n_freq = re.shape
    rows = 1
    for d in lead:
        rows *= d
    rows *= n_frames
    re2 = re.reshape(rows, n_freq).astype(jnp.float32)
    im2 = im.reshape(rows, n_freq).astype(jnp.float32)
    out = _mel_project_log_2d(re2, im2, fb_t, interpret=not _on_tpu())
    out = out.reshape(*lead, n_frames, fb_t.shape[1])
    return jnp.swapaxes(out, -1, -2)


def mel_project_log(spec: jnp.ndarray, fb_t: jnp.ndarray) -> jnp.ndarray:
    """Complex spectrum (..., T, F) -> log-mel (..., M, T).

    Compat wrapper over mel_project_log_ri for complex-valued producers
    (e.g. jnp.fft.rfft). Prefer the (re, im) form on TPU.
    """
    return mel_project_log_ri(jnp.real(spec), jnp.imag(spec), fb_t)
