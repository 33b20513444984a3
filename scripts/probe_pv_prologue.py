"""A/B the PV kernel-path prologue on hardware (round-3).

Variants at the bench shape (B=64, 10 s, n_fft=1024, hop=256):
  unaligned : 513-bin einsum spectra + jnp.pad relayouts in the kernel
              wrapper (the round-2 shipped path; suspected ~6.6 ms of
              pad copies, ROADMAP "PV in-context tail")
  einsum    : aligned prologue (pad_bins_to=640, pad_frames_to), einsum
  conv      : aligned prologue, strided-conv lowering (advisor r2:
              context-independent good lowering)

Honest timing: dispatch N, read one scalar, subtract RTT.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_pv_prologue.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SR = 44100
N_FFT, HOP = 1024, 256
B, L = 64, SR * 10
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
    print(f"  {label:48s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    from freesound_classification_tpu.ops import pv
    from freesound_classification_tpu.ops.dsp import (
        num_stft_frames,
        stft_spectrum_dft,
    )
    from freesound_classification_tpu.ops.pallas_kernels import (
        pv_resynth_pallas,
    )

    measure_rtt()
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, L).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), L, jnp.int32)
    rate = jnp.asarray(np.linspace(0.85, 1.18, B).astype(np.float32))

    t_in = num_stft_frames(L, N_FFT, HOP)
    t_out = (L + N_FFT // 2) // HOP + 2
    icos, isin = pv._synthesis_basis(N_FFT)

    def unaligned(w, ln, rr):
        """Round-2 shipped kernel branch: natural-shape spectra, pads in
        the wrapper."""
        re, im = stft_spectrum_dft(w, N_FFT, HOP, precision="default")
        omega = 2.0 * jnp.pi * jnp.arange(N_FFT // 2 + 1) / N_FFT
        expected = omega * HOP
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re)
        dphi = pv._princarg(
            phase[:, 1:] - phase[:, :-1] - expected[None, None, :]
        ) + expected[None, None, :]
        out = pv_resynth_pallas(
            mag, dphi, phase[:, 0], rr, jnp.asarray(icos),
            jnp.asarray(isin), N_FFT, t_out, HOP)
        r = N_FFT // HOP
        ola_len = (t_out + r - 1) * HOP
        out = out.reshape(B, ola_len)
        return out

    results = {}
    results["unaligned"] = timed(
        jax.jit(unaligned), wave, lengths, rate,
        label="unaligned (r2 shipped: wrapper pads)")
    outs = {}
    for form in ("einsum", "conv"):
        fn = jax.jit(functools.partial(
            pv._pv_stretch_impl, n_fft=N_FFT, hop=HOP, use_kernel=True,
            prologue_form=form))
        results[form] = timed(fn, wave, lengths, rate,
                              label=f"aligned prologue, form={form}")
        outs[form] = fn(wave, lengths, rate)[0]

    d = float(jnp.max(jnp.abs(outs["einsum"] - outs["conv"])))
    s = float(jnp.max(jnp.abs(outs["einsum"])))
    print(f"  einsum-vs-conv max abs diff {d:.3e} (scale {s:.3f})")
    best = min(results, key=results.get)
    print(f"  BEST: {best}  ({results[best]:.2f} ms; "
          f"unaligned {results['unaligned']:.2f})")


if __name__ == "__main__":
    main()
