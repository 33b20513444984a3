"""Stage breakdown of phase_vocoder_stretch at the effects-chain shape
(B=64, 441k samples, n_fft=1024, hop=256) — where do the 33.9 ms go?

Stages timed separately (honest tunnel timing):
  a. analysis block-DFT (stft_spectrum_dft, single-bf16-pass)
  b. prologue: mag + arctan2 phase + dphi (the (B, 1723, 513) f32 passes)
  c. pv_resynth_pallas kernel alone (precomputed inputs)
  d. full phase_vocoder_stretch (= a+b+c + OLA/norm/crop tail)

Usage: PYTHONPATH=/root/repo python scripts/probe_pv_breakdown.py
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
    print(f"t_in={t_in} t_out={t_out} F={N_FFT//2+1}")

    @jax.jit
    def stage_a(w):
        re, im = stft_spectrum_dft(w, N_FFT, HOP, precision="default")
        return re + im

    omega = 2.0 * jnp.pi * jnp.arange(N_FFT // 2 + 1) / N_FFT
    expected = omega * HOP

    @jax.jit
    def stage_ab(w):
        re, im = stft_spectrum_dft(w, N_FFT, HOP, precision="default")
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        dphi_in = pv._princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]
        return mag, dphi_in, phase[:, 0]

    icos, isin = pv._synthesis_basis(N_FFT)

    @jax.jit
    def stage_c(mag, dphi_in, phase0, rate):
        return pv_resynth_pallas(
            mag, dphi_in, phase0, rate, jnp.asarray(icos),
            jnp.asarray(isin), N_FFT, t_out, HOP)

    @jax.jit
    def full(w, ln, r):
        return pv.phase_vocoder_stretch(w, ln, r, n_fft=N_FFT, hop=HOP)

    timed(stage_a, wave, label="a. analysis DFT (re+im forced)")
    timed(stage_ab, wave, label="a+b. DFT + mag/phase/dphi prologue")
    mag, dphi_in, phase0 = jax.jit(stage_ab)(wave)
    mag = jax.block_until_ready(mag)
    timed(stage_c, mag, dphi_in, phase0, rate,
          label="c. pv_resynth_pallas kernel alone")
    timed(full, wave, lengths, rate, label="d. full phase_vocoder_stretch")


if __name__ == "__main__":
    main()
