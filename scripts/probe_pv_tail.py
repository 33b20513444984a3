"""Isolate the PV OLA/normalize/crop tail: pad-add tree vs alternatives.

probe_pv_breakdown.py after the pad-add rewrite: full 28.7 ms = DFT 6.5 +
prologue 2.3 + kernel 10.3 + tail 9.6. The tail's traffic floor is ~0.8 ms
(read 226 MB bf16 syn once, write 113 MB f32) — what formulation gets
there?

Usage: PYTHONPATH=/root/repo python scripts/probe_pv_tail.py
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
N_FFT, HOP = 1024, 256
B, L = 64, SR * 10
R = N_FFT // HOP
T_OUT = (L + N_FFT // 2) // HOP + 2
OLA_FRAMES = T_OUT + R - 1
OLA_LEN = OLA_FRAMES * HOP
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


def wsum_recip():
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT)
         ).astype(np.float32)
    ws = np.zeros(OLA_LEN, np.float32)
    for k in range(T_OUT):
        ws[k * HOP:k * HOP + N_FFT] += w * w
    return jnp.asarray(1.0 / np.maximum(ws, 1e-8))


def main():
    measure_rtt()
    rng = np.random.RandomState(0)
    syn = jnp.asarray(rng.randn(B, T_OUT, N_FFT).astype(np.float32) * 0.1,
                      jnp.bfloat16)
    new_len = jnp.full((B,), L - 1000, jnp.int32)
    recip = wsum_recip()

    def tail_current(syn):
        chunks = syn.reshape(B, T_OUT, R, HOP)
        out = sum(
            jnp.pad(chunks[:, :, o].astype(jnp.float32),
                    ((0, 0), (o, R - 1 - o), (0, 0)))
            for o in range(R))
        out = out.reshape(B, OLA_LEN) * recip
        start = N_FFT // 2
        out = jax.lax.dynamic_slice_in_dim(
            out, start, min(L, OLA_LEN - start), axis=1)
        if out.shape[1] < L:
            out = jnp.pad(out, ((0, 0), (0, L - out.shape[1])))
        valid = jnp.arange(L)[None, :] < new_len[:, None]
        return jnp.where(valid, out, 0.0)

    def tail_slices(syn):
        # slice-shifted adds over the flat sample axis: out sample s gets
        # syn[t, s - t*HOP] for the <=R frames covering it. Work on the
        # flat (B, T_OUT*N_FFT) view? Equivalent trick: add R slices of the
        # (B, T_OUT, R, HOP) view shifted along frame axis WITHOUT pads —
        # overlap handled by slicing instead of padding.
        chunks = syn.reshape(B, T_OUT, R, HOP).astype(jnp.float32)
        out = jnp.zeros((B, OLA_FRAMES, HOP), jnp.float32)
        acc = chunks[:, :, 0]
        for o in range(1, R):
            acc = acc.at[:, o:].add(chunks[:, :T_OUT - o, o])  # interior
        # (edges beyond T_OUT rows dropped — cropped away by the slice
        # below anyway; exactness over the valid region only)
        out = acc
        out = out.reshape(B, T_OUT * HOP) * recip[:T_OUT * HOP]
        start = N_FFT // 2
        out = jax.lax.dynamic_slice_in_dim(
            out, start, min(L, T_OUT * HOP - start), axis=1)
        if out.shape[1] < L:
            out = jnp.pad(out, ((0, 0), (0, L - out.shape[1])))
        valid = jnp.arange(L)[None, :] < new_len[:, None]
        return jnp.where(valid, out, 0.0)

    def tail_matmul(syn):
        # OLA as an MXU contraction: out[b, k, h] = sum_o A[k, t] *
        # chunks[b, t, o, h] where A selects t = k - o. Equivalent:
        # einsum over a (R, OLA_FRAMES, T_OUT) one-hot — too big. Skip.
        return None

    def tail_noconv(syn):
        # keep everything bf16 until the final mask (accuracy: bf16 adds
        # of 4 terms — augmentation-grade)
        chunks = syn.reshape(B, T_OUT, R, HOP)
        out = sum(
            jnp.pad(chunks[:, :, o], ((0, 0), (o, R - 1 - o), (0, 0)))
            for o in range(R))
        out = out.reshape(B, OLA_LEN).astype(jnp.float32) * recip
        start = N_FFT // 2
        out = jax.lax.dynamic_slice_in_dim(
            out, start, min(L, OLA_LEN - start), axis=1)
        if out.shape[1] < L:
            out = jnp.pad(out, ((0, 0), (0, L - out.shape[1])))
        valid = jnp.arange(L)[None, :] < new_len[:, None]
        return jnp.where(valid, out, 0.0)

    print(f"tail shapes: syn (B={B}, T={T_OUT}, {N_FFT}) bf16 = "
          f"{B*T_OUT*N_FFT*2/1e6:.0f} MB", flush=True)
    timed(jax.jit(tail_current), syn, label="pad-add tree, f32 parts (current)")
    timed(jax.jit(tail_noconv), syn, label="pad-add tree, bf16 parts")
    timed(jax.jit(tail_slices), syn, label="at[].add interior slices")

    a = np.asarray(jax.jit(tail_current)(syn))
    c = np.asarray(jax.jit(tail_noconv)(syn))
    print(f"  bf16-parts max diff vs current: {np.max(np.abs(a-c)):.3e} "
          f"(scale {np.max(np.abs(a)):.3f})")


if __name__ == "__main__":
    main()
