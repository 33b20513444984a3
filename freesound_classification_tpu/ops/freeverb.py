"""Sox-faithful freeverb, TPU-native.

The reference's reverb is literally sox (reference ops/transforms.py:96-101
via pysndfx), and sox's ``reverb`` effect is freeverb (Jezar/Dreampoint):
8 parallel feedback-comb filters with a one-pole lowpass in the loop,
followed by 4 series (Schroeder) allpasses, a pre-delay line, a 0.015 wet
gain, and dry+wet summation. This module reproduces that topology with
sox's exact parameter mappings:

- comb delay lengths  = round(scale * r * [1116 1188 1277 1356 1422 1491
  1557 1617]) where scale = room_scale/100 * 0.9 + 0.1 and r = sr/44100
- allpass lengths     = round(r * [225 341 441 556])  (not room-scaled)
- feedback            = 1 - exp((reverberance - b) / (a*b)) with
  a = -1/log(0.7), b = 100/(log(0.02)*a + 1)   (0.30 at 0% .. 0.98 at 100%)
- damping             = hf_damping/100 * 0.3 + 0.2
- wet gain            = 10^(wet_gain_dB/20) * 0.015
- pre-delay           = pre_delay_ms (pysndfx default 20 ms)
- output              = dry + wet  (mono; stereo_depth is inert for mono
  input, as in sox)

TPU-first formulation: the topology is LTI for fixed parameters, so instead
of a per-sample ``lax.scan`` recursion (hopeless at 44.1 kHz) the transfer
function is evaluated in closed form on an rFFT grid:

    H_comb(z)    = z^-N (1 - d z^-1) / (1 - d z^-1 - f (1-d) z^-N)
    H_allpass(z) = (1.5 z^-N - 1) / (1 - 0.5 z^-N)
    H_wet(z)     = gain * z^-D * [sum_i H_comb,Ni] * [prod_j H_ap,Mj]

(from the sox per-sample recurrences: comb stores w[n] = x[n] + f*s[n],
s[n] = (1-d) w[n-N] + d s[n-1], output w[n-N]; allpass stores
w[n] = x[n] + 0.5 w[n-N], output w[n-N] - x[n].)

The IR is recovered by frequency sampling on a grid that covers the decay
tail (time-aliasing beyond it is < -120 dB at the reference's parameter
ranges), then applied by FFT convolution. z^-N phases use exact
integer arithmetic mod the (power-of-two) FFT length, so there is no
phase drift at high bins.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# sox reverb.c filter tunings (44100 Hz base)
COMB_LENGTHS = np.array([1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617])
ALLPASS_LENGTHS = np.array([225, 341, 441, 556])

# feedback-curve constants (sox reverb_create)
_A = -1.0 / math.log(1.0 - 0.3)
_B = 100.0 / (math.log(1.0 - 0.98) * _A + 1.0)


def feedback_of(reverberance):
    """sox: comb feedback from reverberance %, 0.30 at 0 .. 0.98 at 100."""
    return 1.0 - jnp.exp((reverberance - _B) / (_A * _B))


def comb_sizes(room_scale, sr: int):
    """(B,) room_scale % -> (B, 8) comb delay lengths in samples."""
    scale = room_scale / 100.0 * 0.9 + 0.1
    r = sr / 44100.0
    sizes = scale[..., None] * (r * COMB_LENGTHS[None, :]) + 0.5
    return jnp.floor(sizes).astype(jnp.int32)


def allpass_sizes(sr: int) -> np.ndarray:
    r = sr / 44100.0
    return np.floor(r * ALLPASS_LENGTHS + 0.5).astype(np.int64)


@functools.lru_cache(maxsize=4)
def _static_response(fft_len: int, sr: int, pre_delay_ms: float,
                     wet_gain_db: float):
    """Allpass cascade x pre-delay x wet gain on the rFFT grid (numpy f64;
    parameter-independent, so computed once per grid)."""
    k = np.arange(fft_len // 2 + 1)
    w = 2.0 * np.pi * k / fft_len
    h = np.full(k.shape, 10.0 ** (wet_gain_db / 20.0) * 0.015, complex)
    for m in allpass_sizes(sr):
        zm = np.exp(-1j * w * m)
        h *= (1.5 * zm - 1.0) / (1.0 - 0.5 * zm)
    d = int(pre_delay_ms / 1000.0 * sr + 0.5)
    h *= np.exp(-1j * w * d)
    return h.astype(np.complex64)


@functools.partial(
    jax.jit,
    static_argnames=("fft_len", "sr", "hf_damping", "pre_delay_ms",
                     "wet_gain_db", "aligned"),
)
def wet_response(
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    fft_len: int,
    sr: int,
    hf_damping: float = 50.0,
    pre_delay_ms: float = 20.0,
    wet_gain_db: float = 0.0,
    aligned: bool = False,
) -> jnp.ndarray:
    """(B,) params -> (B, fft_len//2+1) complex64 wet-path transfer function.

    fft_len must be a power of two (z^-N phases are computed as exact
    integer products mod fft_len, relying on wrapping int32 arithmetic
    being exact mod 2^32).

    ``aligned=True`` returns the pair ``(H[:, :fft_len//2], H[:, fft_len//2])``
    — the same response split into a lane-ALIGNED width-n/2 array plus the
    Nyquist column (B, 1). The default (n/2 + 1)-wide layout has an odd
    last dimension that knocks every elementwise op off the 128-lane
    tiling grid; on TPU that costs more than the comb math itself
    (measured via ops/mxu_fft.py), so the FFT-filter path consumes the
    aligned pair instead.
    """
    assert fft_len & (fft_len - 1) == 0, "fft_len must be a power of two"
    damp = hf_damping / 100.0 * 0.3 + 0.2
    static_np = _static_response(fft_len, sr, pre_delay_ms, wet_gain_db)
    fb = feedback_of(reverberance).astype(jnp.float32)  # (B,)
    sizes = comb_sizes(room_scale, sr)  # (B, 8)

    def eval_grid(k, static):
        # k: (F,) int32 bin indices; static: (F,) complex64
        w = 2.0 * jnp.pi * k.astype(jnp.float32) / fft_len
        z1 = jax.lax.complex(jnp.cos(w), -jnp.sin(w))
        denom_lp = 1.0 - damp * z1  # (F,)

        def one_row(fb_i, ns):
            h = jnp.zeros(k.shape, jnp.complex64)
            for i in range(COMB_LENGTHS.size):
                # exact phase: (k*N) mod fft_len survives int32 wraparound
                # because fft_len is a power of two dividing 2^32
                kn = (k * ns[i]) & (fft_len - 1)
                ang = 2.0 * jnp.pi * kn.astype(jnp.float32) / fft_len
                zn = jax.lax.complex(jnp.cos(ang), -jnp.sin(ang))
                h = h + zn * denom_lp / (
                    denom_lp - (fb_i * (1.0 - damp)) * zn)
            return h

        return jax.vmap(one_row)(fb, sizes) * static[None, :]

    if not aligned:
        k = jnp.arange(fft_len // 2 + 1, dtype=jnp.int32)
        return eval_grid(k, jnp.asarray(static_np))
    # lane-aligned width-n/2 main grid + the lone Nyquist bin separately
    k_main = jnp.arange(fft_len // 2, dtype=jnp.int32)
    main = eval_grid(k_main, jnp.asarray(static_np[:-1]))
    nyq = eval_grid(jnp.asarray([fft_len // 2], jnp.int32),
                    jnp.asarray(static_np[-1:]))
    return main, nyq


@functools.partial(
    jax.jit,
    static_argnames=("fft_len", "sr", "hf_damping", "pre_delay_ms",
                     "wet_gain_db"),
)
def wet_response_split(
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    fft_len: int,
    sr: int,
    hf_damping: float = 50.0,
    pre_delay_ms: float = 20.0,
    wet_gain_db: float = 0.0,
):
    """wet_response(aligned=True) with hand-split re/im arithmetic and
    outer-product phase generation. Returns f32 arrays
    ``(h_main_re, h_main_im, h_nyq_re)`` of shapes (B, F), (B, F), (B, 1)
    with F = fft_len//2 — exactly what real_filter_pairs_split_native
    consumes, so no complex64 tensor exists anywhere on the reverb path.

    Two wins over the complex evaluator (both measured motivations in
    ops/mxu_fft.py's split-arithmetic note):
    - XLA complex64 ops materialize re/im copies; split f32 fuses.
    - Per-bin phases exp(-2i pi (k N) mod n / n) are generated as an EXACT
      outer product over a (Q, K) factorization of the bin axis:
      k = q K + r => W^{kN} = W^{(q K N) mod n} * W^{(r N) mod n}, so the
      transcendental count drops from F per comb to Q + K (~256x at the
      bench grid; the product of two unit-magnitude f32 complexes adds
      ~1 ulp, vs the comb resonances' ~50x amplification this stays below
      the f32 sincos error already present). Integer phase products rely
      on wrapping int32 arithmetic being exact mod 2^32 (fft_len | 2^32).
    """
    assert fft_len & (fft_len - 1) == 0, "fft_len must be a power of two"
    f_bins = fft_len // 2
    damp = hf_damping / 100.0 * 0.3 + 0.2
    static_np = _static_response(fft_len, sr, pre_delay_ms, wet_gain_db)
    fb = feedback_of(reverberance).astype(jnp.float32)  # (B,)
    sizes = comb_sizes(room_scale, sr)  # (B, 8)
    mask = fft_len - 1

    # (Q, K) factorization of the main grid; direct eval for tiny grids
    kq_bits = max((f_bins.bit_length() - 1) // 2, 0)
    k_fac = 1 << kq_bits
    q_fac = f_bins // k_fac

    def phases(ns):
        """ns: (B, 8) comb lengths -> W^{k ns} split as the outer-product
        factors (Aq_re, Aq_im) (B, 8, Q) x (Br_re, Br_im) (B, 8, K)."""
        step_q = (ns * k_fac) & mask  # (B, 8)
        q_idx = jnp.arange(q_fac, dtype=jnp.int32)
        r_idx = jnp.arange(k_fac, dtype=jnp.int32)
        kq = (step_q[..., None] * q_idx) & mask  # (B, 8, Q)
        kr = (ns[..., None] * r_idx) & mask      # (B, 8, K)
        aq = 2.0 * jnp.pi * kq.astype(jnp.float32) / fft_len
        ar_ = 2.0 * jnp.pi * kr.astype(jnp.float32) / fft_len
        return (jnp.cos(aq), -jnp.sin(aq)), (jnp.cos(ar_), -jnp.sin(ar_))

    # z^-1 on the (Q, K) grid (no batch/comb axes): N = 1
    ones = jnp.ones((1, 1), jnp.int32)
    (z1qr, z1qi), (z1rr, z1ri) = phases(ones)
    z1r = z1qr[0, 0, :, None] * z1rr[0, 0, None, :] \
        - z1qi[0, 0, :, None] * z1ri[0, 0, None, :]
    z1i = z1qr[0, 0, :, None] * z1ri[0, 0, None, :] \
        + z1qi[0, 0, :, None] * z1rr[0, 0, None, :]

    (aqr, aqi), (brr, bri) = phases(sizes)
    znr = aqr[..., None] * brr[..., None, :] - aqi[..., None] * bri[..., None, :]
    zni = aqr[..., None] * bri[..., None, :] + aqi[..., None] * brr[..., None, :]
    hr, hi = _comb_sum(z1r, z1i, znr, zni, fb, damp)
    hr = hr.reshape(hr.shape[0], f_bins)
    hi = hi.reshape(hi.shape[0], f_bins)
    statr = jnp.asarray(np.ascontiguousarray(static_np[:-1].real))
    stati = jnp.asarray(np.ascontiguousarray(static_np[:-1].imag))
    out_r = hr * statr - hi * stati
    out_i = hr * stati + hi * statr
    out_n = _nyquist_response(sizes, fb, damp, static_np)
    return out_r, out_i, out_n


def _comb_sum(z1r, z1i, znr, zni, fb, damp):
    """Sum over combs of zn * denom_lp / (denom_lp - c zn) with
    denom_lp = 1 - damp z^-1 and c = fb (1 - damp). z1*: (*grid) phases
    of z^-1; zn*: (B, 8, *grid) phases of z^-N per comb; fb: (B,).
    Grid-shape agnostic (the (Q, K) and scrambled digit grids share it)."""
    denr = 1.0 - damp * z1r
    deni = -damp * z1i
    c = (fb * (1.0 - damp)).reshape(fb.shape[0], *([1] * (znr.ndim - 1)))
    numr = znr * denr - zni * deni
    numi = znr * deni + zni * denr
    ddr = denr - c * znr
    ddi = deni - c * zni
    inv = 1.0 / (ddr * ddr + ddi * ddi)
    hr = jnp.sum((numr * ddr + numi * ddi) * inv, axis=1)
    hi = jnp.sum((numi * ddr - numr * ddi) * inv, axis=1)
    return hr, hi


def _nyquist_response(sizes, fb, damp, static_np):
    """H at the Nyquist bin: z^-1 = -1 exactly, z^-N = (-1)^N. (B, 1)."""
    sgn = jnp.where((sizes & 1) == 1, -1.0, 1.0)  # (B, 8)
    c = (fb * (1.0 - damp))[:, None]
    dnyq = 1.0 + damp  # 1 - damp * (-1), purely real
    hn = jnp.sum(sgn * dnyq / (dnyq - c * sgn), axis=-1, keepdims=True)
    return hn * float(static_np[-1].real)


@functools.partial(
    jax.jit,
    static_argnames=("fft_len", "sr", "hf_damping", "pre_delay_ms",
                     "wet_gain_db"),
)
def wet_response_split_scrambled(
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    fft_len: int,
    sr: int,
    hf_damping: float = 50.0,
    pre_delay_ms: float = 20.0,
    wet_gain_db: float = 0.0,
):
    """wet_response_split evaluated directly on the SCRAMBLED half grid
    (mxu_fft.scrambled_half_bins order) — the closed form doesn't care
    what order bins are visited in, so feeding
    mxu_fft.real_filter_pairs_split_scrambled costs nothing extra and the
    FFT's two digit-reversal transposes disappear from the reverb path.

    Phases are exact per-digit outer products: a scrambled position's bin
    is sum_i k_i w_i (w_i = prod_{l<i} r_l), so W^{N bin} factorizes over
    the digits — p sincos grids of r_0 + ... + r_{p-2} + r_{p-1}/2 points
    (fewer transcendentals than the (Q, K) split), combined by successive
    complex outer products with exact int32 phase arithmetic mod n."""
    from freesound_classification_tpu.ops import mxu_fft

    assert fft_len & (fft_len - 1) == 0, "fft_len must be a power of two"
    radices = mxu_fft._factor(fft_len)
    f_bins = fft_len // 2
    damp = hf_damping / 100.0 * 0.3 + 0.2
    static_np = _static_response(fft_len, sr, pre_delay_ms, wet_gain_db)
    fb = feedback_of(reverberance).astype(jnp.float32)  # (B,)
    sizes = comb_sizes(room_scale, sr)  # (B, 8)
    mask = fft_len - 1
    # digit sizes on the half grid: minor digit runs [0, r_minor/2)
    dsizes = list(radices[:-1]) + [radices[-1] // 2]
    weights = []
    w = 1
    for r in radices:
        weights.append(w)
        w *= r

    def digit_phases(ns):
        """ns: (B, 8) -> list of (cos, sin) (B, 8, d_i) per digit, of
        W^{ns * w_i * k_i} (exact integer phase mod fft_len)."""
        out = []
        for w_i, d_i in zip(weights, dsizes):
            step = (ns * w_i) & mask  # (B, 8)
            idx = jnp.arange(d_i, dtype=jnp.int32)
            ks = (step[..., None] * idx) & mask
            ang = 2.0 * jnp.pi * ks.astype(jnp.float32) / fft_len
            out.append((jnp.cos(ang), -jnp.sin(ang)))
        return out

    def outer_all(factors):
        """Successive complex outer products -> (B, 8, *dsizes)."""
        zr, zi = factors[0]
        for fr, fi in factors[1:]:
            shape = fr.shape[:2] + (1,) * (zr.ndim - 2) + fr.shape[-1:]
            fr = fr.reshape(shape)
            fi = fi.reshape(shape)
            zr, zi = (zr[..., None] * fr - zi[..., None] * fi,
                      zr[..., None] * fi + zi[..., None] * fr)
        return zr, zi

    ones = jnp.ones((1, 1), jnp.int32)
    z1r, z1i = outer_all(digit_phases(ones))
    z1r, z1i = z1r[0, 0], z1i[0, 0]  # (*dsizes)
    znr, zni = outer_all(digit_phases(sizes))  # (B, 8, *dsizes)
    hr, hi = _comb_sum(z1r, z1i, znr, zni, fb, damp)
    hr = hr.reshape(hr.shape[0], f_bins)
    hi = hi.reshape(hi.shape[0], f_bins)
    order = mxu_fft.scrambled_half_bins(fft_len)
    statr = jnp.asarray(np.ascontiguousarray(static_np.real[order]))
    stati = jnp.asarray(np.ascontiguousarray(static_np.imag[order]))
    out_r = hr * statr - hi * stati
    out_i = hr * stati + hi * statr
    out_n = _nyquist_response(sizes, fb, damp, static_np)
    return out_r, out_i, out_n


def decay_samples(reverberance, room_scale, sr: int, db: float = 60.0):
    """Per-row tail length: samples for the slowest comb to decay by ``db``."""
    fb = feedback_of(reverberance)
    n_max = comb_sizes(room_scale, sr)[..., -1].astype(jnp.float32)
    per_sample = jnp.log(fb) / n_max  # log-amplitude per sample (< 0)
    return (jnp.log(10.0 ** (-db / 20.0)) / per_sample).astype(jnp.int32)


def freeverb_ir(
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    sr: int,
    ir_len: int,
    hf_damping: float = 50.0,
    pre_delay_ms: float = 20.0,
    wet_gain_db: float = 0.0,
) -> jnp.ndarray:
    """(B,) params -> (B, ir_len) wet impulse responses.

    Frequency-samples the closed-form response on a grid covering ~2x the
    worst-case -120 dB decay time of the reference's parameter ranges
    (reverberance/room_scale in [0, 50) -> feedback <= ~0.89, longest comb
    ~890 samples -> -120 dB within ~2.3 s at 44.1 kHz); the periodization
    (time-aliasing) the sampling induces is below -120 dB on that grid.
    """
    grid = 1 << max(2 * ir_len - 1, int(2.4 * sr)).bit_length()
    h = wet_response(
        reverberance, room_scale, grid, sr,
        hf_damping=hf_damping, pre_delay_ms=pre_delay_ms,
        wet_gain_db=wet_gain_db,
    )
    return jnp.fft.irfft(h, grid, axis=-1)[..., :ir_len]


def reverb_batch(
    wave: jnp.ndarray,
    lengths: jnp.ndarray,
    reverberance: jnp.ndarray,
    room_scale: jnp.ndarray,
    sr: int,
    ir_seconds: float = 1.5,
    wet_only: bool = False,
    use_mxu_fft: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply sox-semantics reverb to a (B, L) batch; returns (out, new_len).

    out = dry + wet (sox mono output), computed by circular FFT convolution
    against the closed-form wet transfer function sampled DIRECTLY on the
    conv grid — no explicit IR, which saves the irfft->truncate->rfft
    round trip of the IR formulation (two of its 3.5 big FFT passes) and
    keeps the full decay tail instead of truncating at ``ir_seconds``.
    ``ir_seconds`` now sizes the circular-wrap margin: wrap-around
    contamination is exactly the IR tail beyond ``fft_len - L`` samples,
    below the level the old truncation discarded. The static buffer
    truncates any tail beyond L.

    ``use_mxu_fft`` routes the two big transforms through the radix-split
    MXU matmul FFT (ops/mxu_fft.py) instead of XLA's native FFT, which
    runs at a flat ~0.3 TFLOP/s on TPU; default is on for TPU backends,
    off elsewhere (pocketfft beats matmuls on CPU).
    """
    b, l = wave.shape
    ir_len = int(ir_seconds * sr)
    # pow2 conv length (non-pow2 rFFTs lower to dense DFT matmuls on TPU)
    fft_len = 1 << (l + ir_len - 1).bit_length()
    if use_mxu_fft is None:
        from freesound_classification_tpu.ops.pallas_kernels import _on_tpu

        use_mxu_fft = _on_tpu()
    if use_mxu_fft:
        from freesound_classification_tpu.ops import mxu_fft

        # scrambled-order convolution: the filter is evaluated directly
        # on the digit-scrambled grid, eliding both digit-reversal
        # transposes from the FFT pipeline (mxu_fft module note)
        hmr, hmi, hnr = wet_response_split_scrambled(
            reverberance, room_scale, fft_len, sr)
        if not wet_only:
            # fold the dry path into the transfer function: dry + wet =
            # irfft(X * (1 + H)) — saves a full (B, L) elementwise pass
            # (the f32 FFT roundtrip of the dry term costs ~1e-7 relative
            # vs adding wave directly; tests/test_freeverb.py covers it)
            hmr = hmr + 1.0
            hnr = hnr + 1.0
        if b % 2:  # pair packing needs an even row count
            wave_p = jnp.pad(wave, ((0, 1), (0, 0)))
            hmr = jnp.pad(hmr, ((0, 1), (0, 0)))
            hmi = jnp.pad(hmi, ((0, 1), (0, 0)))
            hnr = jnp.pad(hnr, ((0, 1), (0, 0)))
            wet = mxu_fft.real_filter_pairs_split_scrambled(
                wave_p, hmr, hmi, hnr, fft_len)[:b, :l]
        else:
            wet = mxu_fft.real_filter_pairs_split_scrambled(
                wave, hmr, hmi, hnr, fft_len)[..., :l]
    else:
        h = wet_response(reverberance, room_scale, fft_len, sr)
        if not wet_only:
            h = h + 1.0
        xf = jnp.fft.rfft(wave, fft_len, axis=-1)
        wet = jnp.fft.irfft(xf * h, fft_len, axis=-1)[..., :l]
    out = wet
    tail = decay_samples(reverberance, room_scale, sr)
    new_len = jnp.minimum(lengths + tail, l)
    return out, jnp.maximum(new_len, 1).astype(lengths.dtype)
