"""Measure the components that a scrambled-order freeverb convolution
would remove or add (ROADMAP #3 next lever / round-2 VERDICT #7).

Candidate design: forward FFT without the final digit-reversal transpose,
filter applied in scrambled order via Yf = alpha*Z + beta*conj(Z[-k])
(alpha/beta evaluated on the scrambled full grid at trace time), inverse
FFT consuming scrambled input (transposed-pipeline stages). Savings = two
digit transposes + untangle/retangle passes; costs = full-grid response
eval (2x bins) + scrambled conj-reversal fixups.

This probe prices each term on hardware before any build.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_scrambled_fft.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SR = 44100
B, L = 64, SR * 10
IR_LEN = int(1.5 * SR)
FFT_LEN = 1 << (L + IR_LEN - 1).bit_length()  # 2^19 at bench shape
_RTT = [0.03]


def measure_rtt():
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"RTT {_RTT[0]*1e3:.1f} ms  fft_len={FFT_LEN}", flush=True)


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
    print(f"  {label:52s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    from freesound_classification_tpu.ops import mxu_fft
    from freesound_classification_tpu.ops.freeverb import (
        reverb_batch,
        wet_response_split,
    )

    measure_rtt()
    rng = np.random.RandomState(0)
    half = B // 2
    xr = jnp.asarray(rng.randn(half, FFT_LEN).astype(np.float32))
    xi = jnp.asarray(rng.randn(half, FFT_LEN).astype(np.float32))
    wave = jnp.asarray(rng.randn(B, L).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), L, jnp.int32)
    rev = jnp.full((B,), 40.0)
    room = jnp.full((B,), 40.0)

    radices = mxu_fft._factor(FFT_LEN)
    print(f"  radices={radices}")

    def core_only(ar, ai):
        """cfft_last_split minus the final digit-reversal transpose."""
        n = ar.shape[-1]
        p = len(radices)
        batch = ar.shape[:-1]
        ar = ar.reshape(*batch, *radices)
        ai = ai.reshape(*batch, *radices)
        letters = "abcdefgh"[:p]
        hi = jax.lax.Precision.HIGHEST
        for i in range(p):
            sub = (f"...{letters},{letters[i]}z"
                   f"->...{letters.replace(letters[i], 'z')}")
            dr, di = map(jnp.asarray, mxu_fft._dft_split(radices[i]))
            nr = (jnp.einsum(sub, ar, dr, precision=hi)
                  - jnp.einsum(sub, ai, di, precision=hi))
            ni = (jnp.einsum(sub, ar, di, precision=hi)
                  + jnp.einsum(sub, ai, dr, precision=hi))
            if i < p - 1:
                twr, twi = mxu_fft._stage_twiddle_split(radices, i)
                shape = twr.shape + (1,) * (p - i - 2)
                twr = jnp.asarray(twr).reshape(shape)
                twi = jnp.asarray(twi).reshape(shape)
                ar = nr * twr - ni * twi
                ai = nr * twi + ni * twr
            else:
                ar, ai = nr, ni
        return ar.reshape(*batch, n), ai.reshape(*batch, n)

    def conj_reverse(ar, ai):
        """flip+roll pair: conj(Z[(n-k) mod n]) in NATURAL order (the
        price the current untangle pays; scrambled pays ~this plus
        plane fixups)."""
        rr = jnp.roll(jnp.flip(ar, axis=-1), 1, axis=-1)
        ri = -jnp.roll(jnp.flip(ai, axis=-1), 1, axis=-1)
        return rr, ri

    timed(jax.jit(mxu_fft.cfft_last_split), xr, xi,
          label="cfft_last_split WITH digit transpose")
    timed(jax.jit(core_only), xr, xi,
          label="cfft core only (no final transpose)")
    timed(jax.jit(conj_reverse), xr, xi,
          label="conj-reverse (flip+roll both arrays)")
    timed(jax.jit(lambda a, b: wet_response_split(a, b, FFT_LEN, SR)),
          rev, room, label=f"wet_response_split half grid ({FFT_LEN//2})")

    def wet_full_grid(a, b):
        # full-grid eval cost model: two half-grid evals (the scrambled
        # design cannot share k and n-k trig)
        h1 = wet_response_split(a, b, FFT_LEN, SR)
        h2 = wet_response_split(a + 1.0, b, FFT_LEN, SR)
        return tuple(x + y for x, y in zip(h1, h2))

    timed(jax.jit(wet_full_grid), rev, room,
          label="wet response 2x (full-grid cost model)")
    timed(jax.jit(lambda w, ln: reverb_batch(w, ln, rev, room, SR,
                                             use_mxu_fft=True)),
          wave, lengths, label="reverb_batch current (whole op)")


if __name__ == "__main__":
    main()
