"""Dispatch-level breakdown of reverb_batch's FFT-filter pipeline.

probe_scrambled_fft.py priced the FIRST scrambled-order design out (it
paid a full-grid response eval, +2.3 ms, for ~3.1 ms of transposes), and
the tally exposed the untangle/filter/retangle MIDDLE (~9 ms vs a ~2 ms
traffic floor) as the bigger target. Round-3 history, all measured here:
middle half-flips 4.3 -> 2.9 ms, then the SECOND scrambled design (the
response evaluated directly on the scrambled HALF grid, so the transpose
saving comes free — mxu_fft.real_filter_pairs_split_scrambled) took the
whole op 18.9 -> 14.9 ms. Both paths stay timed below for regression A/Bs.

This probe times each pipeline stage as its own dispatch (per CLAUDE.md's
rule: trace rows lie over this backend, dispatch A/Bs don't):

    pad+pack | fwd cfft | middle (untangle+filter+rebuild) | inv cfft | out

Usage: PYTHONPATH=/root/repo python scripts/probe_reverb_middle.py
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
N = 1 << (L + IR_LEN - 1).bit_length()  # 2^19
_RTT = [0.03]


def measure_rtt():
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"RTT {_RTT[0]*1e3:.1f} ms  n={N}", flush=True)


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
    print(f"  {label:46s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def middle(fr, fi, hmr, hmi, hnr):
    """Exactly real_filter_pairs_split_native's untangle+filter+rebuild
    (mxu_fft.py:393-425), isolated."""
    h = N // 2
    rr = jnp.roll(jnp.flip(fr, axis=-1), 1, axis=-1)
    ri = jnp.roll(jnp.flip(fi, axis=-1), 1, axis=-1)
    ar = 0.5 * (fr[..., :h] + rr[..., :h])
    ai = 0.5 * (fi[..., :h] - ri[..., :h])
    br = 0.5 * (fi[..., :h] + ri[..., :h])
    bi = -0.5 * (fr[..., :h] - rr[..., :h])
    dc0 = jnp.zeros((hmi.shape[0] // 2, 1), jnp.float32)

    def _zero_dc(hi_arr):
        return jnp.concatenate([dc0, hi_arr[..., 1:]], axis=-1)

    her, hei = hmr[0::2], _zero_dc(hmi[0::2])
    hor, hoi = hmr[1::2], _zero_dc(hmi[1::2])
    y1r = ar * her - ai * hei
    y1i = ar * hei + ai * her
    y2r = br * hor - bi * hoi
    y2i = br * hoi + bi * hor
    y1n = fr[..., h:h + 1] * hnr[0::2]
    y2n = fi[..., h:h + 1] * hnr[1::2]
    ypr = y1r - y2i
    ypi = y1i + y2r
    ymr = y1r + y2i
    ymi = y2r - y1i
    qr = jnp.roll(jnp.flip(ymr, axis=-1), 1, axis=-1)
    qi = jnp.roll(jnp.flip(ymi, axis=-1), 1, axis=-1)
    yfr = jnp.concatenate([ypr, y1n, qr[..., 1:]], axis=-1)
    yfi = jnp.concatenate([ypi, y2n, qi[..., 1:]], axis=-1)
    return yfr, yfi


def middle_v2(fr, fi, hmr, hmi, hnr):
    """The half-flip/no-roll rewrite now in real_filter_pairs_split_native."""
    h = N // 2
    rr = jnp.concatenate(
        [fr[..., :1], jnp.flip(fr[..., h + 1:], axis=-1)], axis=-1)
    ri = jnp.concatenate(
        [fi[..., :1], jnp.flip(fi[..., h + 1:], axis=-1)], axis=-1)
    ar = 0.5 * (fr[..., :h] + rr)
    ai = 0.5 * (fi[..., :h] - ri)
    br = 0.5 * (fi[..., :h] + ri)
    bi = -0.5 * (fr[..., :h] - rr)
    dc0 = jnp.zeros((hmi.shape[0] // 2, 1), jnp.float32)

    def _zero_dc(hi_arr):
        return jnp.concatenate([dc0, hi_arr[..., 1:]], axis=-1)

    her, hei = hmr[0::2], _zero_dc(hmi[0::2])
    hor, hoi = hmr[1::2], _zero_dc(hmi[1::2])
    y1r = ar * her - ai * hei
    y1i = ar * hei + ai * her
    y2r = br * hor - bi * hoi
    y2i = br * hoi + bi * hor
    y1n = fr[..., h:h + 1] * hnr[0::2]
    y2n = fi[..., h:h + 1] * hnr[1::2]
    ypr = y1r - y2i
    ypi = y1i + y2r
    ymr = y1r + y2i
    ymi = y2r - y1i
    yfr = jnp.concatenate(
        [ypr, y1n, jnp.flip(ymr[..., 1:], axis=-1)], axis=-1)
    yfi = jnp.concatenate(
        [ypi, y2n, jnp.flip(ymi[..., 1:], axis=-1)], axis=-1)
    return yfr, yfi


def middle_sub(fr, fi):
    """Just the leading flip+roll + untangle (no filter/rebuild)."""
    h = N // 2
    rr = jnp.roll(jnp.flip(fr, axis=-1), 1, axis=-1)
    ri = jnp.roll(jnp.flip(fi, axis=-1), 1, axis=-1)
    ar = 0.5 * (fr[..., :h] + rr[..., :h])
    ai = 0.5 * (fi[..., :h] - ri[..., :h])
    br = 0.5 * (fi[..., :h] + ri[..., :h])
    bi = -0.5 * (fr[..., :h] - rr[..., :h])
    return ar, ai, br, bi


def main():
    from freesound_classification_tpu.ops import mxu_fft
    from freesound_classification_tpu.ops.freeverb import (
        reverb_batch, wet_response_split,
    )

    measure_rtt()
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, L).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), L, jnp.int32)
    rev = jnp.full((B,), 40.0)
    room = jnp.full((B,), 40.0)

    hmr, hmi, hnr = jax.jit(
        lambda a, b: wet_response_split(a, b, N, SR))(rev, room)
    hmr, hmi, hnr = map(jnp.asarray, (hmr, hmi, hnr))

    def pad_pack(x):
        x = jnp.pad(x, ((0, 0), (0, N - L)))
        return x[0::2], x[1::2]

    xe, xo = jax.jit(pad_pack)(wave)
    xe, xo = jnp.asarray(xe), jnp.asarray(xo)
    fr, fi = jax.jit(mxu_fft.cfft_last_split)(xe, xo)
    fr, fi = jnp.asarray(fr), jnp.asarray(fi)
    yfr, yfi = jax.jit(middle)(fr, fi, hmr, hmi, hnr)
    yfr, yfi = jnp.asarray(yfr), jnp.asarray(yfi)

    timed(jax.jit(pad_pack), wave, label="pad + pair pack")
    timed(jax.jit(mxu_fft.cfft_last_split), xe, xo, label="forward cfft")
    timed(jax.jit(middle), fr, fi, hmr, hmi, hnr,
          label="middle: untangle+filter+rebuild")
    timed(jax.jit(middle_v2), fr, fi, hmr, hmi, hnr,
          label="middle v2: half-flips, no rolls")
    timed(jax.jit(middle_sub), fr, fi, label="  sub: flip/roll + untangle")
    timed(jax.jit(lambda a, b: mxu_fft.cfft_last_split(a, jnp.negative(b))),
          yfr, yfi, label="inverse cfft (conj trick)")
    timed(jax.jit(lambda a, b: wet_response_split(a, b, N, SR)), rev, room,
          label="wet_response_split")
    timed(jax.jit(lambda w: mxu_fft.real_filter_pairs_split_native(
        w, hmr, hmi, hnr, N)), wave,
        label="real_filter_pairs_split_native (filter op)")

    # scrambled-order path (r3: filter evaluated on the digit grid; both
    # digit-reversal transposes elided — unlike probe_scrambled_fft's
    # full-grid-response design, the response stays a half-grid eval)
    from freesound_classification_tpu.ops.freeverb import (
        wet_response_split_scrambled,
    )

    smr, smi, snr = jax.jit(
        lambda a, b: wet_response_split_scrambled(a, b, N, SR))(rev, room)
    smr, smi, snr = map(jnp.asarray, (smr, smi, snr))
    timed(jax.jit(lambda a, b: wet_response_split_scrambled(a, b, N, SR)),
          rev, room, label="wet_response_split_scrambled")
    timed(jax.jit(lambda w: mxu_fft.real_filter_pairs_split_scrambled(
        w, smr, smi, snr, N)), wave,
        label="real_filter_pairs_split_scrambled")
    timed(jax.jit(lambda w, ln: reverb_batch(w, ln, rev, room, SR,
                                             use_mxu_fft=True)),
          wave, lengths, label="reverb_batch (whole, scrambled)")


if __name__ == "__main__":
    main()
