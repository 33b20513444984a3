"""Hardware A/B: complex64 vs hand-split re/im freeverb reverb path.

The round-2 MXU radix-split FFT landed at 25.5 ms for reverb_batch at
(64, 441k) — a jax.profiler trace showed ~45 HBM passes, dominated by
XLA's complex64 lowering materializing re/im copies around every op plus
the 5.6 ms per-bin-sincos comb evaluation. The split rework
(ops/mxu_fft.py *_split, ops/freeverb.py wet_response_split) carries every
complex value as paired f32 arrays and generates comb phases as exact
(Q, K) outer products (Q + K transcendentals per comb instead of F).

Measures, honest-tunnel style (scalar readback, RTT subtracted):
- wet_response(aligned=True) vs wet_response_split
- real_filter_pow2_pairs (complex) vs real_filter_pairs_split_native
- end-to-end reverb_batch old-complex composition vs production split
plus a numerics check (max abs diff) of the two reverb_batch outputs.

Usage: PYTHONPATH=/root/repo python scripts/probe_split_fft.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.ops import freeverb, mxu_fft

SR = 44100
_RTT = [0.03]


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    if jnp.iscomplexobj(leaf):
        return float(jnp.sum(jnp.abs(leaf)))
    return float(jnp.sum(leaf))


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
    _force(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    print(f"{label:52s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def reverb_complex(wave, lengths, rev, room):
    """The pre-split composition: complex wet_response + complex pairs
    filter (what reverb_batch ran before this round)."""
    b, l = wave.shape
    fft_len = 1 << (l + int(1.5 * SR) - 1).bit_length()
    h_main, h_nyq = freeverb.wet_response(rev, room, fft_len, SR,
                                          aligned=True)
    wet = mxu_fft.real_filter_pow2_pairs(wave, h_main, h_nyq, fft_len)
    return wave + wet[..., :l]


def main():
    measure_rtt()
    b, l = 64, SR * 10
    fft_len = 1 << (l + int(1.5 * SR) - 1).bit_length()
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    rev = jnp.asarray(rng.uniform(0, 50, b).astype(np.float32))
    room = jnp.asarray(rng.uniform(0, 50, b).astype(np.float32))

    wr = jax.jit(lambda r, m: freeverb.wet_response(
        r, m, fft_len, SR, aligned=True))
    wrs = jax.jit(lambda r, m: freeverb.wet_response_split(
        r, m, fft_len, SR))
    timed(wr, rev, room, label="wet_response complex (aligned)")
    timed(wrs, rev, room, label="wet_response_split")

    h_main, h_nyq = wr(rev, room)
    hmr, hmi, hnr = wrs(rev, room)
    pairs_c = jax.jit(lambda x, a, c: mxu_fft.real_filter_pow2_pairs(
        x, a, c, fft_len))
    pairs_s = jax.jit(
        lambda x, a, bb, c: mxu_fft.real_filter_pairs_split_native(
            x, a, bb, c, fft_len))
    timed(pairs_c, wave, h_main, h_nyq, label="pairs filter complex")
    timed(pairs_s, wave, hmr, hmi, hnr, label="pairs filter split")

    old = jax.jit(reverb_complex)
    new = jax.jit(lambda w, ln, r, m: freeverb.reverb_batch(
        w, ln, r, m, SR, use_mxu_fft=True)[0])
    t_old = timed(old, wave, lengths, rev, room,
                  label="reverb end-to-end complex (old)")
    t_new = timed(new, wave, lengths, rev, room,
                  label="reverb end-to-end split (production)")

    d = jnp.max(jnp.abs(old(wave, lengths, rev, room)
                        - new(wave, lengths, rev, room)))
    scale = float(jnp.max(jnp.abs(wave)))
    print(f"max abs diff old vs new: {float(d):.3e} (input scale {scale:.2f})",
          flush=True)
    print(f"speedup: {t_old / max(t_new, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()
