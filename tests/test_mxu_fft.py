"""MXU radix-split FFT vs jnp.fft golden values (ops/mxu_fft.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import mxu_fft


def _rel_err(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30)


@pytest.mark.parametrize("n", [16, 128, 256, 1024, 1 << 15])
def test_cfft_matches_numpy(n):
    rng = np.random.RandomState(0)
    z = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    out = mxu_fft.cfft_last(jnp.asarray(z))
    ref = np.fft.fft(z, axis=-1)
    assert _rel_err(out, ref) < 2e-6


@pytest.mark.parametrize("n", [64, 4096, 1 << 16])
def test_rfft_matches_numpy(n):
    rng = np.random.RandomState(1)
    x = rng.randn(4, n).astype(np.float32)
    out = mxu_fft.rfft_pow2(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n, axis=-1)
    assert out.shape == (4, n // 2 + 1)
    assert _rel_err(out, ref) < 2e-6


def test_rfft_pads_and_truncates():
    rng = np.random.RandomState(2)
    n = 2048
    x = rng.randn(2, 1500).astype(np.float32)  # shorter -> zero pad
    out = mxu_fft.rfft_pow2(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n, axis=-1)
    assert _rel_err(out, ref) < 2e-6
    x2 = rng.randn(2, 3000).astype(np.float32)  # longer -> truncate
    out2 = mxu_fft.rfft_pow2(jnp.asarray(x2), n)
    ref2 = np.fft.rfft(x2[:, :n], n, axis=-1)
    assert _rel_err(out2, ref2) < 2e-6


@pytest.mark.parametrize("n", [64, 4096, 1 << 16])
def test_irfft_matches_numpy(n):
    rng = np.random.RandomState(3)
    x = rng.randn(4, n).astype(np.float32)
    xf = np.fft.rfft(x, axis=-1).astype(np.complex64)
    out = mxu_fft.irfft_pow2(jnp.asarray(xf), n)
    ref = np.fft.irfft(xf, n, axis=-1)
    assert out.shape == (4, n)
    assert out.dtype == jnp.float32
    assert _rel_err(out, ref) < 2e-6


def test_roundtrip_filter_convolution():
    """The freeverb usage shape: rfft -> multiply transfer fn -> irfft."""
    rng = np.random.RandomState(4)
    n = 1 << 14
    x = rng.randn(2, 9000).astype(np.float32)
    h = (rng.randn(n // 2 + 1) + 1j * rng.randn(n // 2 + 1)).astype(
        np.complex64)
    out = mxu_fft.irfft_pow2(
        mxu_fft.rfft_pow2(jnp.asarray(x), n) * jnp.asarray(h), n)
    ref = np.fft.irfft(np.fft.rfft(x, n, axis=-1) * h, n, axis=-1)
    assert _rel_err(out, ref) < 5e-6


@pytest.mark.parametrize("n", [64, 4096, 1 << 15])
def test_real_filter_matches_separate_transforms(n):
    """real_filter_pow2 == irfft(rfft(x) * H) for Hermitian-consistent H
    (real DC/Nyquist bins, the real-filter case it exists for)."""
    rng = np.random.RandomState(5)
    x = rng.randn(3, n - min(100, n // 2)).astype(np.float32)
    h = (rng.randn(3, n // 2 + 1) + 1j * rng.randn(3, n // 2 + 1)).astype(
        np.complex64)
    h[:, 0] = h[:, 0].real
    h[:, -1] = h[:, -1].real
    out = mxu_fft.real_filter_pow2(jnp.asarray(x), jnp.asarray(h), n)
    ref = np.fft.irfft(np.fft.rfft(x, n, axis=-1) * h, n, axis=-1)
    assert out.shape == (3, n)
    assert _rel_err(out, ref) < 5e-6


def test_real_filter_projects_edge_bins_to_real():
    """Complex DC/Nyquist bins are ignored (numpy irfft convention)."""
    rng = np.random.RandomState(6)
    n = 1024
    x = rng.randn(2, n).astype(np.float32)
    h = (rng.randn(2, n // 2 + 1) + 1j * rng.randn(2, n // 2 + 1)).astype(
        np.complex64)
    out = mxu_fft.real_filter_pow2(jnp.asarray(x), jnp.asarray(h), n)
    ref = np.fft.irfft(np.fft.rfft(x, n, axis=-1) * h, n, axis=-1)
    assert _rel_err(out, ref) < 5e-6


@pytest.mark.parametrize("n", [256, 4096, 1 << 15])
@pytest.mark.parametrize(
    "fn", [mxu_fft.real_filter_pow2_pairs,
           mxu_fft.real_filter_pow2_pairs_split])
def test_real_filter_pairs_matches_separate_transforms(n, fn):
    """Row-pair packed filtering == per-row irfft(rfft(x) * H), for both
    the complex64 implementation and the hand-split re/im production
    twin."""
    rng = np.random.RandomState(8)
    b = 6
    x = rng.randn(b, n - min(64, n // 4)).astype(np.float32)
    h = (rng.randn(b, n // 2 + 1) + 1j * rng.randn(b, n // 2 + 1)).astype(
        np.complex64)
    h[:, 0] = h[:, 0].real
    h[:, -1] = h[:, -1].real
    out = fn(
        jnp.asarray(x), jnp.asarray(h[:, : n // 2]),
        jnp.asarray(h[:, n // 2:]), n)
    ref = np.fft.irfft(np.fft.rfft(x, n, axis=-1) * h, n, axis=-1)
    assert out.shape == (b, n)
    assert _rel_err(out, ref) < 5e-6


@pytest.mark.parametrize("n", [128, 1024, 1 << 14])
def test_cfft_split_matches_complex(n):
    """The split-re/im FFT is the same math as the complex64 one."""
    rng = np.random.RandomState(9)
    xr = rng.randn(3, n).astype(np.float32)
    xi = rng.randn(3, n).astype(np.float32)
    yr, yi = mxu_fft.cfft_last_split(jnp.asarray(xr), jnp.asarray(xi))
    ref = np.fft.fft(xr + 1j * xi, axis=-1)
    assert _rel_err(np.asarray(yr) + 1j * np.asarray(yi), ref) < 2e-6


@pytest.mark.parametrize("n", [256, 8192, 1 << 17])
def test_scrambled_bins_is_digit_reversal_permutation(n):
    bins = mxu_fft.scrambled_bins(n)
    assert sorted(bins) == list(range(n))
    half = mxu_fft.scrambled_half_bins(n)
    assert len(half) == n // 2 and half.max() < n // 2
    assert half[0] == 0  # DC leads the scrambled order
    # half grid = lower half of the minor digit axis of the full grid
    radices = mxu_fft._factor(n)
    want = bins.reshape(radices)[..., : radices[-1] // 2].reshape(-1)
    np.testing.assert_array_equal(half, want)


@pytest.mark.parametrize("n", [256, 8192, 1 << 17])
def test_stages_t_is_fft_of_scrambled_input(n):
    """_stages_t_split(scrambled v) == fft(natural v): the transposed
    pipeline IS the FFT for digit-scrambled input (F = T^T S^-1)."""
    rng = np.random.RandomState(10)
    radices = mxu_fft._factor(n)
    z = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    zs = z[:, mxu_fft.scrambled_bins(n)]  # scrambled-order copy of z
    gr, gi = mxu_fft._stages_t_split(
        jnp.asarray(zs.real).reshape(2, *radices),
        jnp.asarray(zs.imag).reshape(2, *radices), radices)
    ref = np.fft.fft(z, axis=-1)
    assert _rel_err(np.asarray(gr) + 1j * np.asarray(gi), ref) < 2e-6


@pytest.mark.parametrize("n", [256, 8192, 1 << 17])
def test_real_filter_pairs_scrambled_matches_separate_transforms(n):
    """The scrambled-order filter path == per-row irfft(rfft(x) * H)
    with the filter handed over in scrambled_half_bins order."""
    rng = np.random.RandomState(11)
    b = 6
    x = rng.randn(b, n - min(64, n // 4)).astype(np.float32)
    h = (rng.randn(b, n // 2 + 1) + 1j * rng.randn(b, n // 2 + 1)).astype(
        np.complex64)
    h[:, 0] = h[:, 0].real
    h[:, -1] = h[:, -1].real
    order = mxu_fft.scrambled_half_bins(n)
    out = mxu_fft.real_filter_pairs_split_scrambled(
        jnp.asarray(x),
        jnp.asarray(np.ascontiguousarray(h[:, order].real)),
        jnp.asarray(np.ascontiguousarray(h[:, order].imag)),
        jnp.asarray(np.ascontiguousarray(h[:, n // 2:].real)), n)
    ref = np.fft.irfft(np.fft.rfft(x, n, axis=-1) * h, n, axis=-1)
    assert out.shape == (b, n)
    assert _rel_err(out, ref) < 5e-6
