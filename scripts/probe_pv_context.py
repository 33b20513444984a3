"""Find the PV composition gap: full(26.5) - [ab(8.6) + kernel(9.3)] ~ 8.6 ms
after the in-kernel OLA landed — the OUTSIDE tail is now just
reshape/recip/crop/mask over 113 MB (~1 ms floor), so where does the rest go?

Splits timed (honest tunnel timing):
  c+tail. kernel + outside tail from precomputed mag/dphi/phase0
  abc.    prologue + kernel, no tail (rows forced via sum)
  tail.   outside tail alone on a precomputed rows array
  pads.   the _pv_resynth prologue pads alone (mag/dphi -> 640-lane f32)

Usage: PYTHONPATH=/root/repo python scripts/probe_pv_context.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.ops import pv
from freesound_classification_tpu.ops.dsp import (
    num_stft_frames,
    stft_spectrum_dft,
)
from freesound_classification_tpu.ops.pallas_kernels import pv_resynth_pallas

SR = 44100
N_FFT, HOP = 1024, 256
_RTT = [0.03]


def measure_rtt():
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"RTT {_RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, *args, n=20, label=""):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    print(f"  {label:56s} {ms:8.3f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    rate = jnp.asarray(np.linspace(0.85, 1.18, b).astype(np.float32))
    measure_rtt()

    t_in = num_stft_frames(l, N_FFT, HOP)
    t_out = (l + N_FFT // 2) // HOP + 2
    r = N_FFT // HOP
    ola_frames = t_out + r - 1
    ola_len = ola_frames * HOP

    omega = 2.0 * jnp.pi * jnp.arange(N_FFT // 2 + 1) / N_FFT
    expected = omega * HOP
    icos, isin = pv._synthesis_basis(N_FFT)

    wsum_np = np.zeros(ola_len, np.float32)
    w_np = np.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N_FFT)
                                         / N_FFT), np.float32)
    for k in range(t_out):
        wsum_np[k * HOP:k * HOP + N_FFT] += w_np * w_np
    recip = jnp.asarray(1.0 / np.maximum(wsum_np, 1e-8))

    def prologue(w):
        re, im = stft_spectrum_dft(w, N_FFT, HOP, precision="default")
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        dphi_in = pv._princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]
        return mag, dphi_in, phase[:, 0]

    def kernel(mag, dphi_in, phase0, rate):
        return pv_resynth_pallas(
            mag, dphi_in, phase0, rate, jnp.asarray(icos),
            jnp.asarray(isin), N_FFT, t_out, HOP)

    def tail(rows, new_len):
        out = rows.reshape(b, ola_len) * recip
        start = N_FFT // 2
        out = jax.lax.dynamic_slice_in_dim(
            out, start, min(l, ola_len - start), axis=1)
        if out.shape[1] < l:
            out = jnp.pad(out, ((0, 0), (0, l - out.shape[1])))
        valid = jnp.arange(l)[None, :] < new_len[:, None]
        return jnp.where(valid, out, 0.0)

    new_len = jnp.minimum(
        (lengths.astype(jnp.float32) / rate).astype(jnp.int32), l)

    mag, dphi_in, phase0 = jax.jit(prologue)(wave)
    mag = jax.block_until_ready(mag)
    rows = jax.jit(kernel)(mag, dphi_in, phase0, rate)
    float(jnp.sum(rows))

    timed(jax.jit(lambda m, d, p0, rr: tail(kernel(m, d, p0, rr), new_len)),
          mag, dphi_in, phase0, rate, label="c+tail. kernel + outside tail")
    timed(jax.jit(lambda w, rr: kernel(*prologue(w), rr)), wave, rate,
          label="abc. prologue + kernel, no tail")
    timed(jax.jit(tail), rows, new_len, label="tail alone on rows")

    def pads(mag, dphi_in):
        f = mag.shape[-1]
        f_pad = 640
        t_in_pad = ((max(t_in, 184) + 7) // 8) * 8
        mp = jnp.pad(mag, ((0, 0), (0, t_in_pad - t_in), (0, f_pad - f)))
        dp = jnp.pad(dphi_in,
                     ((0, 0), (0, t_in_pad - (t_in - 1)), (0, f_pad - f)))
        return mp.sum() + dp.sum()

    timed(jax.jit(pads), mag, dphi_in, label="pads alone (640-lane copies)")


def extra():
    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    rate = jnp.asarray(np.linspace(0.85, 1.18, b).astype(np.float32))
    measure_rtt()

    t_in = num_stft_frames(l, N_FFT, HOP)
    t_out = (l + N_FFT // 2) // HOP + 2

    omega = 2.0 * jnp.pi * jnp.arange(N_FFT // 2 + 1) / N_FFT
    expected = omega * HOP
    icos, isin = pv._synthesis_basis(N_FFT)

    def prologue(w):
        re, im = stft_spectrum_dft(w, N_FFT, HOP, precision="default")
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        dphi_in = pv._princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]
        return mag, dphi_in, phase[:, 0]

    def kernel(mag, dphi_in, phase0, rate):
        return pv_resynth_pallas(
            mag, dphi_in, phase0, rate, jnp.asarray(icos),
            jnp.asarray(isin), N_FFT, t_out, HOP)

    def pads(mag, dphi_in):
        f = mag.shape[-1]
        f_pad = 640
        t_in_pad = ((max(t_in, 184) + 7) // 8) * 8
        mp = jnp.pad(mag, ((0, 0), (0, t_in_pad - t_in), (0, f_pad - f)))
        dp = jnp.pad(dphi_in,
                     ((0, 0), (0, t_in_pad - (t_in - 1)), (0, f_pad - f)))
        return mp.sum() + dp.sum()

    timed(jax.jit(lambda w: pads(*prologue(w)[:2])), wave,
          label="prologue + pads composed (no kernel)")
    timed(jax.jit(lambda w, rr: kernel(
        *jax.lax.optimization_barrier(prologue(w)), rr)), wave, rate,
        label="abc with optimization_barrier")
    timed(jax.jit(lambda w: sum(x.sum() for x in prologue(w))), wave,
          label="prologue alone (all outputs forced)")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra()
    else:
        main()
