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

from freesound_classification_tpu.ops.dsp import frame_signal, hann_window


def _princarg(x):
    """Wrap phase to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def phase_vocoder_stretch(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    rate: jnp.ndarray,
    n_fft: int = 2048,
    hop: int = 512,
):
    """Time-stretch each clip by per-sample ``rate`` (rate>1 -> shorter).

    wave: (B, L) padded batch; lengths: valid samples; rate: (B,) in
    ~[0.8, 1.25]. Returns (stretched (B, L), new_lengths) — output stays in
    the same static buffer (tails beyond it are dropped).
    """
    b, l = wave.shape
    window = hann_window(n_fft)

    frames = frame_signal(wave, n_fft, hop) * window  # (B, T, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)  # (B, T, F)
    t_in = spec.shape[1]
    t_out = int(t_in * 1.25) + 1

    omega = 2.0 * jnp.pi * jnp.arange(n_fft // 2 + 1) / n_fft  # per-bin
    expected = omega * hop  # expected phase advance per analysis hop

    mag = jnp.abs(spec)
    phase = jnp.angle(spec)

    def stretch_one(mag_i, phase_i, rate_i):
        # per-output-frame analysis position
        pos = jnp.arange(t_out) * rate_i
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t_in - 2)
        frac = jnp.clip(pos - i0, 0.0, 1.0)

        mag0 = mag_i[i0]          # (t_out, F)
        mag1 = mag_i[i0 + 1]
        mags = (1.0 - frac[:, None]) * mag0 + frac[:, None] * mag1

        dphi = _princarg(phase_i[i0 + 1] - phase_i[i0] - expected) + expected

        # librosa-style accumulation: frame k is synthesized with the phase
        # *before* advancing by dphi(p_k) — an exclusive cumulative sum
        # (inclusive would delay the output by one hop)
        cum = jnp.cumsum(dphi, axis=0)
        phis = phase_i[0][None, :] + jnp.concatenate(
            [jnp.zeros_like(cum[:1]), cum[:-1]], axis=0)
        return mags * jnp.exp(1j * phis)

    out_spec = jax.vmap(stretch_one)(mag, phase, rate)  # (B, t_out, F)

    # synthesis: inverse rFFT + windowed overlap-add. hop divides n_fft, so
    # OLA decomposes into R = n_fft//hop static shifted adds — dense ops,
    # never a scatter (TPU scatter serializes and was ~60x the model cost).
    syn = jnp.fft.irfft(out_spec, n_fft, axis=-1) * window  # (B, t_out, n_fft)
    r = n_fft // hop
    ola_frames = t_out + r - 1
    ola_len = ola_frames * hop
    chunks = syn.reshape(b, t_out, r, hop)
    out = jnp.zeros((b, ola_frames, hop), jnp.float32)
    for o in range(r):
        out = out.at[:, o : o + t_out].add(chunks[:, :, o])
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
