"""Power-of-two FFTs as MXU matmul stages (radix-split Cooley-Tukey).

Why: XLA's native TPU FFT runs at a flat ~0.3 TFLOP/s effective at every
size 2^13..2^19 (measured, ROADMAP.md) — the freeverb wet convolution
(ops/freeverb.py, the TPU rebuild of the reference's sox reverb at
/root/reference/ops/transforms.py:96-101) spends ~23 ms of the train step
in two 2^19-point transforms over 64 rows. This module re-expresses those
transforms as a small number of <=128-point DFT *matmuls* (MXU work) plus
twiddle multiplies and transposes (bandwidth work):

    N = r1 * r2 * ... * rm,  each r <= 128
    cost ~= N * (r1 + ... + rm) complex MACs     (N*272 for 2^18 vs the
    naive N^2, or the N*1536 of a two-factor split)

- ``cfft_last`` — complex FFT over the last axis by recursive four-step
  splitting: reshape (n2, n1), FFT the n2 axis, twiddle W_n^{n1*k2}, FFT
  the n1 axis, transpose-flatten. Sub-FFTs of length <= 128 are direct
  DFT-matrix einsums.
- ``rfft_pow2`` / ``irfft_pow2`` — real transforms via the half-length
  complex-packing trick: pack even/odd samples into a complex signal of
  length N/2, one complex FFT, then an O(N) untangle. Halves the matmul
  work relative to a complex FFT of length N.

All DFT/twiddle matmuls run at ``precision=HIGHEST``: Mosaic/XLA f32 dots
default to ONE bf16 MXU pass (~0.4% error — the r2 phase-vocoder garbage,
CLAUDE.md), which would put a correlated ~-60 dB error floor under the
reverb tail. At HIGHEST the transform matches jnp.fft to ~1e-6 relative
(tests/test_mxu_fft.py) and the matmul FLOPs are still far below the
bandwidth cost of the passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_RADIX_MAX = 128
_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=16)
def _dft_matrix(n: int) -> np.ndarray:
    """(n, n) complex64 DFT matrix D[j, k] = exp(-2i pi j k / n)."""
    j = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(j, j) / n).astype(np.complex64)


@functools.lru_cache(maxsize=16)
def _twiddle(n1: int, n2: int) -> np.ndarray:
    """(n2, n1) complex64 twiddles W_{n1*n2}^{n1_idx * k2}."""
    k2 = np.arange(n2)[:, None]
    n1_idx = np.arange(n1)[None, :]
    return np.exp(-2j * np.pi * k2 * n1_idx / (n1 * n2)).astype(np.complex64)


def _factor(n: int):
    """Radix factorization of pow2 n, slowest digit first, radices <= 128
    with any small remainder as the slowest digit: 2^18 -> (16, 128, 128)."""
    fast = []
    while n > _RADIX_MAX:
        fast.append(_RADIX_MAX)
        n //= _RADIX_MAX
    fast.append(n)
    return tuple(fast[::-1])


@functools.lru_cache(maxsize=16)
def _stage_twiddle(radices: tuple, i: int) -> np.ndarray:
    """Twiddle applied after stage i (0-indexed) of the mixed-radix FFT:
    shape (r_0, ..., r_i, r_{i+1}), angle -2 pi K_i f / (prod_{l<=i} r_l *
    r_{i+1}) where K_i = sum_j k_j * prod_{l<j} r_l (digit-major weights)."""
    done = radices[: i + 1]
    nxt = radices[i + 1]
    k = np.zeros(done, dtype=np.float64)
    weight = 1
    for j, r in enumerate(done):
        shape = [1] * len(done)
        shape[j] = r
        k = k + np.arange(r).reshape(shape) * weight
        weight *= r
    f = np.arange(nxt)
    ang = -2.0 * np.pi * k[..., None] * f / (weight * nxt)
    return np.exp(1j * ang).astype(np.complex64)


def cfft_last(x: jnp.ndarray) -> jnp.ndarray:
    """Complex FFT over the last axis. Length must be a power of two.

    Iterative mixed-radix Cooley-Tukey: the length is split into digit
    axes (slowest first), each stage replaces one digit axis by its DFT
    via an in-place einsum (contraction over a non-minor axis folds into
    the matmul — no standalone transpose, the relayout killer on TPU),
    twiddles broadcast over the remaining fast digits, and a single
    digit-reversal transpose at the end restores natural bin order.
    """
    n = x.shape[-1]
    assert n & (n - 1) == 0, "power-of-two lengths only"
    if n <= _RADIX_MAX:
        return jnp.einsum(
            "...j,jk->...k", x, jnp.asarray(_dft_matrix(n)),
            precision=_HIGHEST)
    radices = _factor(n)
    p = len(radices)
    batch = x.shape[:-1]
    a = x.reshape(*batch, *radices)
    # subscript letters for the digit axes
    letters = "abcdefgh"[:p]
    for i in range(p):
        sub = f"...{letters},{letters[i]}z->...{letters.replace(letters[i], 'z')}"
        a = jnp.einsum(sub, a, jnp.asarray(_dft_matrix(radices[i])),
                       precision=_HIGHEST)
        if i < p - 1:
            tw = jnp.asarray(_stage_twiddle(radices, i))
            # broadcast over the not-yet-transformed digits after f_{i+1}
            a = a * tw.reshape(tw.shape + (1,) * (p - i - 2))
    # output digit k_j has weight prod_{l<j} r_l: natural order = reversed
    # digit axes, fastest output digit (largest weight) slowest axis
    nb = len(batch)
    perm = tuple(range(nb)) + tuple(nb + j for j in reversed(range(p)))
    return a.transpose(perm).reshape(*batch, n)


def _icfft_last(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized inverse complex FFT via the conjugation identity."""
    return jnp.conj(cfft_last(jnp.conj(x)))


@functools.lru_cache(maxsize=16)
def _half_twiddle(n: int) -> np.ndarray:
    """(n//2 + 1,) complex64: exp(-2i pi k / n) for the rfft untangle."""
    k = np.arange(n // 2 + 1)
    return np.exp(-2j * np.pi * k / n).astype(np.complex64)


def rfft_pow2(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """rfft over the last axis, zero-padded/truncated to length n (pow2).

    Matches jnp.fft.rfft(x, n): returns (..., n//2 + 1) complex64.
    """
    assert n & (n - 1) == 0 and n >= 4
    l = x.shape[-1]
    if l < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - l)])
    elif l > n:
        x = x[..., :n]
    h = n // 2
    # pack even/odd samples into a half-length complex signal
    z = x.reshape(*x.shape[:-1], h, 2)
    z = jax.lax.complex(z[..., 0], z[..., 1])
    zf = cfft_last(z)  # (..., h)
    # untangle: X[k] = E[k] + W_n^k O[k], E/O from Z and conj(Z[-k])
    zrev = jnp.roll(jnp.flip(zf, axis=-1), 1, axis=-1)  # Z[(h - k) mod h]
    zf1 = jnp.concatenate([zf, zf[..., :1]], axis=-1)  # k = 0..h
    zrev1 = jnp.concatenate([zrev, zrev[..., :1]], axis=-1)
    e = 0.5 * (zf1 + jnp.conj(zrev1))
    o = -0.5j * (zf1 - jnp.conj(zrev1))
    return e + jnp.asarray(_half_twiddle(n)) * o


def real_filter_pow2(x: jnp.ndarray, h_bins: jnp.ndarray, n: int
                     ) -> jnp.ndarray:
    """Fused ``irfft(rfft(x, n) * H, n)`` for real rows x and per-row
    transfer functions H (``h_bins``: (..., n//2 + 1) complex).

    Why not rfft_pow2 -> multiply -> irfft_pow2: the rfft untangle and
    irfft retangle materialize (n//2 + 1)-wide spectra, and that odd last
    dimension knocks every subsequent op off the 128-lane tiling grid —
    measured 9.5 ms for rfft_pow2 at (64, 2^19) where the underlying
    half-length complex FFT is 2.3 ms. Composing untangle, filter, and
    retangle algebraically gives a pointwise two-term form on ALIGNED
    width-n/2 arrays:

        Z' = alpha * Z + beta * conj(Z[(h - k) mod h]),   h = n/2
        alpha = (Hk (1 - iW)(1 + iW~) + Hf~ (1 + iW)(1 - iW~)) / 4
        beta  = (Hk (1 + iW)(1 + iW~) + Hf~ (1 - iW)(1 - iW~)) / 4

    with W[k] = exp(-2i pi k / n), Hk = H[k], Hf = H[h - k], ~ = conj.
    The DC/Nyquist bins of H are projected to their real parts (the
    numpy irfft convention for a real signal's spectrum).
    """
    assert h_bins.shape[-1] == n // 2 + 1, "expected n//2 + 1 filter bins"
    return real_filter_pow2_aligned(
        x, h_bins[..., : n // 2], h_bins[..., n // 2:], n)


def real_filter_pow2_aligned(x: jnp.ndarray, h_main: jnp.ndarray,
                             h_nyq: jnp.ndarray, n: int) -> jnp.ndarray:
    """real_filter_pow2 with the filter given as a lane-aligned pair:
    ``h_main`` (..., n//2) = H[0 .. n//2-1] and ``h_nyq`` (..., 1) = H[n//2]
    (the layout freeverb.wet_response(aligned=True) produces — odd-width
    spectra never touch the hot path)."""
    assert n & (n - 1) == 0 and n >= 4
    assert h_main.shape[-1] == n // 2 and h_nyq.shape[-1] == 1
    l = x.shape[-1]
    if l < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - l)])
    elif l > n:
        x = x[..., :n]
    h = n // 2
    z = x.reshape(*x.shape[:-1], h, 2)
    z = jax.lax.complex(z[..., 0], z[..., 1])
    zf = cfft_last(z)
    zflip = jnp.conj(jnp.roll(jnp.flip(zf, axis=-1), 1, axis=-1))

    # aligned width-h views of H with real DC/Nyquist bins
    hk = jnp.concatenate(
        [jnp.real(h_main[..., :1]).astype(h_main.dtype), h_main[..., 1:]],
        axis=-1)
    hf = jnp.concatenate(
        [jnp.real(h_nyq).astype(h_nyq.dtype),
         jnp.flip(h_main[..., 1:], axis=-1)],
        axis=-1)
    w = jnp.asarray(_half_twiddle(n)[:h])
    iw = 1j * w
    iwc = 1j * jnp.conj(w)
    a_coef = (hk * (1 - iw) * (1 + iwc)
              + jnp.conj(hf) * (1 + iw) * (1 - iwc)) * 0.25
    b_coef = (hk * (1 + iw) * (1 + iwc)
              + jnp.conj(hf) * (1 - iw) * (1 - iwc)) * 0.25
    zp = a_coef * zf + b_coef * zflip
    zt = _icfft_last(zp) / h
    out = jnp.stack([jnp.real(zt), jnp.imag(zt)], axis=-1)
    return out.reshape(*x.shape[:-1], n).astype(jnp.float32)


def real_filter_pow2_pairs(x: jnp.ndarray, h_main: jnp.ndarray,
                           h_nyq: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-row real FFT filtering via batch-row pairing: rows (2r, 2r+1)
    become ONE full-length complex signal x[2r] + i x[2r+1].

    Equivalent to real_filter_pow2_aligned but faster on TPU: row packing
    strides the UNTILED batch dimension (free) where sample packing
    interleaves lanes (measured 1.4 ms pack + 3.7 ms unpack at
    (64, 2^19)), and the two-for-one trick replaces the untangle/retangle
    coefficient algebra with a plain A/B separation. x: (B, L) real, B
    even (odd B: caller pads a row); h_main (B, n//2), h_nyq (B, 1)
    per-row transfer functions as produced by
    freeverb.wet_response(aligned=True).
    """
    assert n & (n - 1) == 0 and n >= 4
    b, l = x.shape
    assert b % 2 == 0, "pair packing needs an even number of rows"
    assert h_main.shape[-1] == n // 2 and h_nyq.shape[-1] == 1
    if l < n:
        x = jnp.pad(x, ((0, 0), (0, n - l)))
    elif l > n:
        x = x[..., :n]
    h = n // 2
    z = jax.lax.complex(x[0::2], x[1::2])  # (B/2, n)
    zf = cfft_last(z)
    # conj(Z[-k]): Z[(n - k) mod n], conjugated
    zrevc = jnp.conj(jnp.roll(jnp.flip(zf, axis=-1), 1, axis=-1))
    # separate the two rows' spectra on the aligned half grid k in [0, h)
    a = 0.5 * (zf[..., :h] + zrevc[..., :h])      # rfft of even rows
    bb = -0.5j * (zf[..., :h] - zrevc[..., :h])   # rfft of odd rows
    # per-row filters (real DC bin per the real-filter convention)
    def _real_dc(hm):
        return jnp.concatenate(
            [jnp.real(hm[..., :1]).astype(hm.dtype), hm[..., 1:]], axis=-1)

    he = _real_dc(h_main[0::2])
    ho = _real_dc(h_main[1::2])
    y1 = a * he
    y2 = bb * ho
    # Nyquist bin: A[h] = Re Z[h], B[h] = Im Z[h] (Z[-h] = Z[h])
    znyq = zf[..., h : h + 1]
    y1n = jnp.real(znyq) * jnp.real(h_nyq[0::2])
    y2n = jnp.imag(znyq) * jnp.real(h_nyq[1::2])
    ynyq = jax.lax.complex(y1n, y2n)
    # rebuild the full filtered spectrum Y[k] = A H_e + i B H_o, using
    # Y[n - k] = conj(Y1[k]) + i conj(Y2[k]) = conj(Y1 - i Y2)[k]
    yp = y1 + 1j * y2                       # bins [0, h)
    ym = jnp.conj(y1 - 1j * y2)
    q = jnp.roll(jnp.flip(ym, axis=-1), 1, axis=-1)  # q[m] = ym[h - m]
    q = jnp.concatenate([ynyq, q[..., 1:]], axis=-1)  # bin h at m = 0
    yfull = jnp.concatenate([yp, q], axis=-1)  # (B/2, n), both halves aligned
    zt = _icfft_last(yfull) / n
    # even rows = real part, odd rows = imaginary part; the stack rides the
    # untiled row dimension
    out = jnp.stack([jnp.real(zt), jnp.imag(zt)], axis=1)
    return out.reshape(b, n).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Hand-split re/im arithmetic
# ---------------------------------------------------------------------------
#
# A jax.profiler trace of real_filter_pow2_pairs at (64, 2^19) shows the
# program shattering into ~45 HBM passes: XLA's complex64 lowering
# materializes separate re/im copies around nearly every op (each complex
# multiply/add becomes extract-real, extract-imag, compute, re-complex), so
# the 25.5 ms reverb is dominated by bandwidth the MATH doesn't need — the
# matmul core alone is 2.28 ms. The *_split variants below carry every
# complex value as a PAIR of f32 arrays: stage matmuls are plain f32
# einsums (the MXU work is identical — a complex matmul is 4 real matmuls
# either way) and the twiddle/untangle algebra is plain f32 elementwise
# that XLA fuses into the surrounding matmuls instead of materializing.


@functools.lru_cache(maxsize=32)
def _dft_split(n: int):
    d = _dft_matrix(n)
    return (np.ascontiguousarray(d.real), np.ascontiguousarray(d.imag))


@functools.lru_cache(maxsize=32)
def _stage_twiddle_split(radices: tuple, i: int):
    t = _stage_twiddle(radices, i)
    return (np.ascontiguousarray(t.real), np.ascontiguousarray(t.imag))


def _stages_split(xr: jnp.ndarray, xi: jnp.ndarray, radices: tuple):
    """The cfft stage pipeline on split re/im, WITHOUT the final
    digit-reversal transpose: (..., n) flat in -> (*batch, r_0..r_{p-1})
    digit view out, holding output digit k_i (bin weight prod_{l<i} r_l)
    on axis i. Flattening that view yields SCRAMBLED (digit-major) bin
    order — see scrambled_bins."""
    p = len(radices)
    batch = xr.shape[:-1]
    ar = xr.reshape(*batch, *radices)
    ai = xi.reshape(*batch, *radices)
    letters = "abcdefgh"[:p]
    for i in range(p):
        sub = (f"...{letters},{letters[i]}z"
               f"->...{letters.replace(letters[i], 'z')}")
        dr, di = map(jnp.asarray, _dft_split(radices[i]))
        nr = (jnp.einsum(sub, ar, dr, precision=_HIGHEST)
              - jnp.einsum(sub, ai, di, precision=_HIGHEST))
        ni = (jnp.einsum(sub, ar, di, precision=_HIGHEST)
              + jnp.einsum(sub, ai, dr, precision=_HIGHEST))
        if i < p - 1:
            twr, twi = _stage_twiddle_split(radices, i)
            shape = twr.shape + (1,) * (p - i - 2)
            twr = jnp.asarray(twr).reshape(shape)
            twi = jnp.asarray(twi).reshape(shape)
            ar = nr * twr - ni * twi
            ai = nr * twi + ni * twr
        else:
            ar, ai = nr, ni
    return ar, ai


def _stages_t_split(ar: jnp.ndarray, ai: jnp.ndarray, radices: tuple):
    """TRANSPOSED stage pipeline: consumes a scrambled digit view
    (*batch, r_0..r_{p-1}) and emits the natural-order flat FFT
    (*batch, n). Because the DFT matrix is symmetric, F = F^T =
    T^T S^-1, so the forward FFT of a scrambled-order vector is the
    stage pipeline run in reverse (DFT matrices are symmetric, stage
    twiddles diagonal) with NO permutation anywhere. Validated against
    numpy in tests/test_mxu_fft.py."""
    p = len(radices)
    nb = ar.ndim - p
    batch = ar.shape[:nb]
    letters = "abcdefgh"[:p]
    for i in reversed(range(p)):
        sub = (f"...{letters},{letters[i]}z"
               f"->...{letters.replace(letters[i], 'z')}")
        dr, di = map(jnp.asarray, _dft_split(radices[i]))
        nr = (jnp.einsum(sub, ar, dr, precision=_HIGHEST)
              - jnp.einsum(sub, ai, di, precision=_HIGHEST))
        ni = (jnp.einsum(sub, ar, di, precision=_HIGHEST)
              + jnp.einsum(sub, ai, dr, precision=_HIGHEST))
        if i > 0:
            twr, twi = _stage_twiddle_split(radices, i - 1)
            shape = twr.shape + (1,) * (p - i - 1)
            twr = jnp.asarray(twr).reshape(shape)
            twi = jnp.asarray(twi).reshape(shape)
            ar = nr * twr - ni * twi
            ai = nr * twi + ni * twr
        else:
            ar, ai = nr, ni
    return ar.reshape(*batch, -1), ai.reshape(*batch, -1)


def cfft_last_split(xr: jnp.ndarray, xi: jnp.ndarray):
    """cfft_last on hand-split re/im f32 arrays -> (yr, yi).

    Bit-identical math to cfft_last (same stage order, same HIGHEST-
    precision dots); only the value representation changes.
    """
    n = xr.shape[-1]
    assert n & (n - 1) == 0, "power-of-two lengths only"
    if n <= _RADIX_MAX:
        dr, di = map(jnp.asarray, _dft_split(n))
        yr = (jnp.einsum("...j,jk->...k", xr, dr, precision=_HIGHEST)
              - jnp.einsum("...j,jk->...k", xi, di, precision=_HIGHEST))
        yi = (jnp.einsum("...j,jk->...k", xr, di, precision=_HIGHEST)
              + jnp.einsum("...j,jk->...k", xi, dr, precision=_HIGHEST))
        return yr, yi
    radices = _factor(n)
    p = len(radices)
    batch = xr.shape[:-1]
    ar, ai = _stages_split(xr, xi, radices)
    nb = len(batch)
    perm = tuple(range(nb)) + tuple(nb + j for j in reversed(range(p)))
    return (ar.transpose(perm).reshape(*batch, n),
            ai.transpose(perm).reshape(*batch, n))


def real_filter_pow2_pairs_split(x: jnp.ndarray, h_main: jnp.ndarray,
                                 h_nyq: jnp.ndarray, n: int) -> jnp.ndarray:
    """real_filter_pow2_pairs with hand-split re/im arithmetic.

    Identical algebra (same row pairing, untangle, and Nyquist handling);
    every complex value is carried as two f32 arrays so no complex64
    tensor is ever materialized. The complex twin above is kept as the
    parity oracle (tests/test_mxu_fft.py) and for A/B probes; the
    production freeverb path (ops/freeverb.py reverb_batch) calls
    real_filter_pairs_split_native with filters that were never complex.
    """
    assert h_main.shape[-1] == n // 2 and h_nyq.shape[-1] == 1
    return real_filter_pairs_split_native(
        x, jnp.real(h_main).astype(jnp.float32),
        jnp.imag(h_main).astype(jnp.float32),
        jnp.real(h_nyq).astype(jnp.float32), n)


def real_filter_pairs_split_native(x: jnp.ndarray, hmr: jnp.ndarray,
                                   hmi: jnp.ndarray, hnr: jnp.ndarray,
                                   n: int) -> jnp.ndarray:
    """Split-native core: per-row filters given as f32 arrays
    ``hmr``/``hmi`` (B, n//2) = Re/Im H[0..n//2-1] and ``hnr`` (B, 1) =
    Re H[n//2] (the Nyquist bin of a real filter is real; any imaginary
    part is discarded per the irfft convention, as is Im H[0])."""
    assert n & (n - 1) == 0 and n >= 4
    b, l = x.shape
    assert b % 2 == 0, "pair packing needs an even number of rows"
    assert hmr.shape[-1] == n // 2 and hnr.shape[-1] == 1
    if l < n:
        x = jnp.pad(x, ((0, 0), (0, n - l)))
    elif l > n:
        x = x[..., :n]
    h = n // 2
    fr, fi = cfft_last_split(x[0::2], x[1::2])  # (B/2, n)
    # conj(Z[(n - k) mod n]) split on the HALF grid k in [0, h): index 0
    # maps to itself, 1..h-1 map to n-1..h+1 — a half-length flip. The
    # r2 formulation (roll(flip(f), 1)[..., :h]) materialized TWO full-n
    # relayout passes per array; this is one half-n reverse each
    # (probe_reverb_middle.py: middle 4.31 -> measured below).
    rr = jnp.concatenate(
        [fr[..., :1], jnp.flip(fr[..., h + 1:], axis=-1)], axis=-1)
    ri = jnp.concatenate(
        [fi[..., :1], jnp.flip(fi[..., h + 1:], axis=-1)], axis=-1)
    # A = rfft(even rows), B = rfft(odd rows) on the aligned half grid
    ar = 0.5 * (fr[..., :h] + rr)
    ai = 0.5 * (fi[..., :h] - ri)
    br = 0.5 * (fi[..., :h] + ri)
    bi = -0.5 * (fr[..., :h] - rr)
    # per-row filters, DC bin projected to its real part
    dc0 = jnp.zeros((hmi.shape[0] // 2, 1), jnp.float32)

    def _zero_dc(hi_arr):
        return jnp.concatenate([dc0, hi_arr[..., 1:]], axis=-1)

    her, hei = hmr[0::2], _zero_dc(hmi[0::2])
    hor, hoi = hmr[1::2], _zero_dc(hmi[1::2])
    y1r = ar * her - ai * hei
    y1i = ar * hei + ai * her
    y2r = br * hor - bi * hoi
    y2i = br * hoi + bi * hor
    # Nyquist bin: A[h] = Re Z[h], B[h] = Im Z[h]
    y1n = fr[..., h : h + 1] * hnr[0::2]
    y2n = fi[..., h : h + 1] * hnr[1::2]
    # Y[k] = Y1 + i Y2 on [0, h); Y[n - m] = conj(Y1 - i Y2)[m]
    ypr = y1r - y2i
    ypi = y1i + y2r
    ymr = y1r + y2i
    ymi = y2r - y1i
    # Y[n - m] = (ymr + i ymi)[m] for m in 1..h-1: roll(flip(ym), 1)[1:]
    # is exactly flip(ym[1:]) — again half-length flips, no rolls
    yfr = jnp.concatenate(
        [ypr, y1n, jnp.flip(ymr[..., 1:], axis=-1)], axis=-1)
    yfi = jnp.concatenate(
        [ypi, y2n, jnp.flip(ymi[..., 1:], axis=-1)], axis=-1)
    # unnormalized inverse via conjugation: icfft(y) = conj(cfft(conj y))
    gr, gi = cfft_last_split(yfr, -yfi)
    inv = 1.0 / n
    out = jnp.stack([gr * inv, gi * (-inv)], axis=1)
    return out.reshape(b, n).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Scrambled-order convolution
# ---------------------------------------------------------------------------
#
# The two digit-reversal transposes (end of the forward pipeline, end of the
# inverse) are pure relayout passes over the full (B/2, n) re/im arrays —
# bandwidth the convolution doesn't need, since a pointwise filter doesn't
# care what order the bins are visited in. The *_scrambled path below elides
# both: the forward emits the digit view as-is, the filter (evaluated by the
# caller directly on the scrambled bin grid — freeverb.wet_response_split
# takes a bin_order) multiplies in scrambled order, and the inverse consumes
# scrambled order via the TRANSPOSED stage pipeline (_stages_t_split). The
# rfft untangle's conj-partner pairing survives scrambling with structure:
# (n - bin) mod n complements every digit with a carry from the weight-1
# digit, so the partner gather is a nest of p small flips on the digit view
# (one special row/plane per carry level) instead of a full-length
# roll(flip(.)) — and the half grid (bins < n/2) is exactly the lower half
# of the MINOR digit axis.


@functools.lru_cache(maxsize=16)
def scrambled_bins(n: int) -> np.ndarray:
    """(n,) int64: the natural bin index at each scrambled position.

    Scrambled position j has digit decomposition (k_0 .. k_{p-1}) with
    k_0 MAJOR (j = ((k_0 r_1 + k_1) r_2 + ...)); its bin is
    sum_i k_i * w_i with w_i = prod_{l<i} r_l. The first n/2 positions of
    the HALF grid are scrambled_bins(n).reshape(radices)[..., :r_m//2]."""
    radices = _factor(n)
    b = np.zeros(radices, dtype=np.int64)
    w = 1
    for i, r in enumerate(radices):
        shape = [1] * len(radices)
        shape[i] = r
        b = b + np.arange(r).reshape(shape) * w
        w *= r
    return b.reshape(-1)


def scrambled_half_bins(n: int) -> np.ndarray:
    """(n//2,) int64: bins of the scrambled HALF grid (minor digit <
    r_minor/2), the order real_filter_pairs_split_scrambled expects its
    per-row filters in."""
    radices = _factor(n)
    hm = radices[-1] // 2
    return np.ascontiguousarray(
        scrambled_bins(n).reshape(radices)[..., :hm]).reshape(-1)


def _partner_half(v: jnp.ndarray, radices: tuple) -> jnp.ndarray:
    """v: (*batch, r_0..r_{p-1}) digit view of a full-grid array; returns
    the half-grid digit view u with u[pos] = v[partner(pos)],
    partner(bin) = (n - bin) mod n, for positions with minor digit <
    r_{p-1}/2. Structure: (n - bin) complements every digit (r-1-k) then
    adds 1 at the weight-1 digit (k_0); the carry ripples only while
    digits are 0, so level i of the nest handles 'digits 0..i-1 zero,
    digit i nonzero' -> flip digit i over [1:], full-flip all faster
    digits (minor restricted to its upper half)."""
    p = len(radices)
    hm = radices[-1] // 2
    nb = v.ndim - p
    # innermost line: all digits 0 but the minor; (n - k w_m) mod n
    line = v[(slice(None),) * nb + (0,) * (p - 1)]  # (*batch, r_m)
    out = jnp.concatenate(
        [line[..., :1], jnp.flip(line[..., hm + 1:], -1)], -1)
    out = out.reshape(out.shape[:nb] + (1,) * (p - 1) + (hm,))
    for i in range(p - 2, -1, -1):
        idx = (slice(None),) * nb + (slice(0, 1),) * i + (slice(1, None),)
        blk = v[idx][..., hm:]
        blk = jnp.flip(blk, axis=tuple(range(nb + i, blk.ndim)))
        out = jnp.concatenate([out, blk], axis=nb + i)
    return out


def _upper_from_half(ym: jnp.ndarray, ynyq: jnp.ndarray, radices: tuple
                     ) -> jnp.ndarray:
    """Inverse placement: given half-grid values ym with
    Y[(n - bin(pos)) mod n] = ym[pos] and the Nyquist value ynyq
    (*batch, 1), build the upper-half digit view (minor digit >= r/2).
    Same involution as _partner_half, restricted to the upper half."""
    p = len(radices)
    nb = ym.ndim - p
    line = ym[(slice(None),) * nb + (0,) * (p - 1)]  # (*batch, hm)
    out = jnp.concatenate([ynyq, jnp.flip(line[..., 1:], -1)], -1)
    out = out.reshape(out.shape[:nb] + (1,) * (p - 1) + (out.shape[-1],))
    for i in range(p - 2, -1, -1):
        idx = (slice(None),) * nb + (slice(0, 1),) * i + (slice(1, None),)
        blk = jnp.flip(ym[idx], axis=tuple(range(nb + i, ym.ndim)))
        out = jnp.concatenate([out, blk], axis=nb + i)
    return out


def real_filter_pairs_split_scrambled(x: jnp.ndarray, hmr: jnp.ndarray,
                                      hmi: jnp.ndarray, hnr: jnp.ndarray,
                                      n: int) -> jnp.ndarray:
    """real_filter_pairs_split_native with BOTH digit-reversal transposes
    elided: the filter is applied in scrambled bin order.

    ``hmr``/``hmi``: (B, n//2) filter re/im ON THE SCRAMBLED HALF GRID —
    row r's value at column j is H[scrambled_half_bins(n)[j]] (freeverb's
    wet_response_split evaluates there directly via bin_order, at no extra
    cost — the closed form doesn't care about bin order). ``hnr``: (B, 1)
    Re H[n//2]. Output is identical to the natural-order path (golden
    tested); only the internal bin visit order differs."""
    assert n & (n - 1) == 0 and n > _RADIX_MAX
    b, l = x.shape
    assert b % 2 == 0, "pair packing needs an even number of rows"
    assert hmr.shape[-1] == n // 2 and hnr.shape[-1] == 1
    if l < n:
        x = jnp.pad(x, ((0, 0), (0, n - l)))
    elif l > n:
        x = x[..., :n]
    radices = _factor(n)
    p = len(radices)
    hm = radices[-1] // 2
    b2 = b // 2
    fr, fi = _stages_split(x[0::2], x[1::2], radices)  # (B/2, *radices)
    # conj Z[(n - bin) mod n] on the half grid (conj = negate im at use)
    rr = _partner_half(fr, radices)
    ri = _partner_half(fi, radices)
    # A = rfft(even rows), B = rfft(odd rows), scrambled half grid
    zhr, zhi = fr[..., :hm], fi[..., :hm]
    ar = 0.5 * (zhr + rr)
    ai = 0.5 * (zhi - ri)
    br = 0.5 * (zhi + ri)
    bi = -0.5 * (zhr - rr)
    # per-row filters in scrambled flat order; DC (bin 0 = digits all
    # zero = flat position 0) projected to its real part, then digit view
    dc0 = jnp.zeros((b2, 1), jnp.float32)

    def _digit_half(h_flat):
        return h_flat.reshape(b2, *radices[:-1], hm)

    her = _digit_half(hmr[0::2])
    hor = _digit_half(hmr[1::2])
    hei = _digit_half(jnp.concatenate([dc0, hmi[0::2][..., 1:]], -1))
    hoi = _digit_half(jnp.concatenate([dc0, hmi[1::2][..., 1:]], -1))
    y1r = ar * her - ai * hei
    y1i = ar * hei + ai * her
    y2r = br * hor - bi * hoi
    y2i = br * hoi + bi * hor
    # Nyquist bin n/2 = digits (0,..,0, hm): A = Re Z, B = Im Z there
    nyq = (slice(None),) + (0,) * (p - 1) + (slice(hm, hm + 1),)
    y1n = fr[nyq] * hnr[0::2]  # (B/2, 1)
    y2n = fi[nyq] * hnr[1::2]
    # Y[k] = Y1 + i Y2 on the half grid; Y[n - m] = conj(Y1 - i Y2)[m]
    ypr = y1r - y2i
    ypi = y1i + y2r
    ymr = y1r + y2i
    ymi = y2r - y1i
    upr = _upper_from_half(ymr, y1n, radices)
    upi = _upper_from_half(ymi, y2n, radices)
    yfr = jnp.concatenate([ypr, upr], axis=-1)  # (B/2, *radices)
    yfi = jnp.concatenate([ypi, upi], axis=-1)
    # unnormalized inverse via conjugation, consuming scrambled order:
    # icfft(y)[natural] = conj(T^T(conj y_scrambled))
    gr, gi = _stages_t_split(yfr, -yfi, radices)
    inv = 1.0 / n
    out = jnp.stack([gr * inv, gi * (-inv)], axis=1)
    return out.reshape(b, n).astype(jnp.float32)


def irfft_pow2(xf: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of rfft_pow2: (..., n//2 + 1) complex -> (..., n) real f32.

    Matches jnp.fft.irfft(xf, n).
    """
    assert n & (n - 1) == 0 and n >= 4
    assert xf.shape[-1] == n // 2 + 1, "expected n//2 + 1 rfft bins"
    h = n // 2
    # numpy irfft convention: the DC and Nyquist bins of a real signal's
    # spectrum are real — discard any imaginary part they carry
    edges = jnp.real(xf[..., [0, -1]]).astype(xf.dtype)
    xf = jnp.concatenate([edges[..., :1], xf[..., 1:-1], edges[..., 1:]],
                         axis=-1)
    # retangle: rebuild the half-length complex spectrum
    e = 0.5 * (xf[..., :-1] + jnp.conj(jnp.flip(xf[..., 1:], axis=-1)))
    o = 0.5 * (xf[..., :-1] - jnp.conj(jnp.flip(xf[..., 1:], axis=-1)))
    tw = jnp.conj(jnp.asarray(_half_twiddle(n)))[..., :h]
    z = e + 1j * (tw * o)
    zt = _icfft_last(z) / h  # (..., h) complex: even + i*odd samples
    out = jnp.stack([jnp.real(zt), jnp.imag(zt)], axis=-1)
    return out.reshape(*xf.shape[:-1], n).astype(jnp.float32)
