"""Isolated hardware A/Bs for the 5-fold inference hot spots found by
probe_infer_profile.py (v5e-1, honest tunnel timing):

1. 2x2 maxpool: reduce-window vs strided-slice max, fold-dim vs fold-merged
   channel layouts (the trace shows compare_select fusions at ~107 GB/s).
2. PReLU elementwise pass: fold-dim (C=64 minor, 50% lane waste) vs
   fold-merged (C=320 minor).
3. Conv: vmapped-over-folds vs feature_group_count=5 grouped conv at the
   block0/block1 shapes.
4. Frontend DFT: current 4-dot f32 accumulation vs 2 fused cos|sin dots
   (concat basis, lane-aligned) vs bf16 output.

Isolated wins here are CANDIDATES ONLY — CLAUDE.md rule: judge at model
level (scripts/probe_fused_infer.py precedent) before changing defaults.

Usage: PYTHONPATH=/root/repo python scripts/probe_infer_levers.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    print(f"  {label:52s} {ms:8.3f} ms  (compile+1 {compile_s:4.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    rng = np.random.RandomState(0)

    # ---- 1. maxpool formulations -------------------------------------
    print("\n[1] 2x2/2 maxpool at block1 outer-conv shape", flush=True)
    x_fold = jnp.asarray(rng.randn(5, 64, 64, 215, 96).astype(np.float32),
                         jnp.bfloat16)
    x_merged = jnp.asarray(
        rng.randn(64, 64, 215, 5 * 96).astype(np.float32), jnp.bfloat16)

    def pool_rw(x):  # flax nn.max_pool == reduce_window
        import flax.linen as nn
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    def pool_slices_4d(x):  # (B, H, W, C): max of 4 strided slices
        h2, w2 = (x.shape[1] // 2) * 2, (x.shape[2] // 2) * 2
        a = x[:, 0:h2:2, 0:w2:2]
        b = x[:, 1:h2:2, 0:w2:2]
        c = x[:, 0:h2:2, 1:w2:2]
        d = x[:, 1:h2:2, 1:w2:2]
        return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))

    def pool_rw_5d(x):
        import flax.linen as nn
        return jax.vmap(lambda y: nn.max_pool(y, (2, 2), strides=(2, 2)))(x)

    def pool_slices_5d(x):
        h2, w2 = (x.shape[2] // 2) * 2, (x.shape[3] // 2) * 2
        a = x[:, :, 0:h2:2, 0:w2:2]
        b = x[:, :, 1:h2:2, 0:w2:2]
        c = x[:, :, 0:h2:2, 1:w2:2]
        d = x[:, :, 1:h2:2, 1:w2:2]
        return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))

    timed(jax.jit(pool_rw_5d), x_fold, label="reduce-window, fold dim (5,64,64,215,96)")
    timed(jax.jit(pool_slices_5d), x_fold, label="slice-max,     fold dim (5,64,64,215,96)")
    timed(jax.jit(pool_rw), x_merged, label="reduce-window, merged C (64,64,215,480)")
    timed(jax.jit(pool_slices_4d), x_merged, label="slice-max,     merged C (64,64,215,480)")

    # ---- 2. PReLU pass -------------------------------------------------
    print("\n[2] PReLU elementwise pass at block0 resnet shape", flush=True)
    y_fold = jnp.asarray(rng.randn(5, 64, 64, 215, 64).astype(np.float32),
                         jnp.bfloat16)
    y_merged = jnp.asarray(
        rng.randn(64, 64, 215, 5 * 64).astype(np.float32), jnp.bfloat16)
    a_fold = jnp.asarray(rng.rand(5, 64).astype(np.float32), jnp.bfloat16)
    a_merged = a_fold.reshape(-1)

    def prelu_fold(x, alpha):
        al = alpha[:, None, None, None, :]
        return jnp.where(x >= 0, x, al * x)

    def prelu_merged(x, alpha):
        return jnp.where(x >= 0, x, alpha * x)

    def prelu_minmax(x, alpha):
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)

    timed(jax.jit(prelu_fold), y_fold, a_fold,
          label="where,  fold dim (5,64,64,215,64)")
    timed(jax.jit(prelu_merged), y_merged, a_merged,
          label="where,  merged C (64,64,215,320)")
    timed(jax.jit(prelu_minmax), y_merged, a_merged,
          label="minmax, merged C (64,64,215,320)")

    # ---- 3. conv: vmapped folds vs grouped ----------------------------
    print("\n[3] 3x3 conv 64->96 at block1 pre-pool shape", flush=True)
    xin_fold = jnp.asarray(rng.randn(5, 64, 64, 215, 64).astype(np.float32),
                           jnp.bfloat16)
    xin_merged = jnp.asarray(
        rng.randn(64, 64, 215, 320).astype(np.float32), jnp.bfloat16)
    w_fold = jnp.asarray(
        rng.randn(5, 3, 3, 64, 96).astype(np.float32) * 0.05, jnp.bfloat16)
    # grouped filter: (3, 3, 64, 5*96) with feature_group_count=5
    w_grouped = jnp.moveaxis(w_fold, 0, 3).reshape(3, 3, 64, 5 * 96)

    def conv_vmap(x, w):
        return jax.vmap(
            lambda xi, wi: jax.lax.conv_general_dilated(
                xi, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))(x, w)

    def conv_grouped(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=5)

    timed(jax.jit(conv_vmap), xin_fold, w_fold,
          label="vmap over folds (5,64,64,215,64)")
    timed(jax.jit(conv_grouped), xin_merged, w_grouped,
          label="grouped fgc=5 (64,64,215,320)")

    # 1x1 convs (the resnet conv1/conv3): grouped 1x1 == block-diag dense?
    print("\n[3b] 1x1 conv 64->64 at block0 resnet shape", flush=True)
    w1_fold = jnp.asarray(
        rng.randn(5, 1, 1, 64, 64).astype(np.float32) * 0.05, jnp.bfloat16)
    w1_grouped = jnp.moveaxis(w1_fold, 0, 3).reshape(1, 1, 64, 5 * 64)
    timed(jax.jit(conv_vmap), xin_fold, w1_fold,
          label="vmap over folds 1x1")
    timed(jax.jit(conv_grouped), y_merged, w1_grouped,
          label="grouped fgc=5 1x1")

    # ---- 4. frontend DFT dots ------------------------------------------
    print("\n[4] block-DFT spectrum dots (B=64, 10 s, n_fft 2048 hop 1024)",
          flush=True)
    from freesound_classification_tpu.ops import dsp

    wave = jnp.asarray(rng.randn(64, 441000).astype(np.float32) * 0.1)

    def dft_current(w):
        re, im = dsp.stft_spectrum_dft(w, 2048, 1024, precision="default")
        return re + im  # force both

    cos_b, sin_b = dsp._dft_basis(2048, 1024)
    m, hop, n_bins = cos_b.shape
    pad_bins = -(-n_bins // 128) * 128  # 1025 -> 1152, lane-aligned halves

    def cat_basis():
        cat = np.zeros((m, hop, 2 * pad_bins), np.float32)
        cat[:, :, :n_bins] = cos_b
        cat[:, :, pad_bins:pad_bins + n_bins] = sin_b
        return jnp.asarray(cat, jnp.bfloat16)

    cat_b = cat_basis()

    def dft_cat(w, out_dtype):
        pad = 2048 // 2
        xp = jnp.pad(w.astype(jnp.float32), ((0, 0), (pad, pad)),
                     mode="reflect")
        n_frames = dsp.num_stft_frames(441000, 2048, 1024)
        total = xp.shape[-1]
        n_blocks = -(-total // 1024)
        xp = jnp.pad(xp, ((0, 0), (0, n_blocks * 1024 - total)))
        if n_blocks < n_frames + m - 1:
            xp = jnp.pad(
                xp, ((0, 0), (0, (n_frames + m - 1 - n_blocks) * 1024)))
        blocks = xp.reshape(xp.shape[0], -1, 1024).astype(jnp.bfloat16)
        acc = None
        for o in range(m):
            view = blocks[:, o:o + n_frames, :]
            d = jnp.einsum("bth,hf->btf", view, cat_b[o],
                           preferred_element_type=out_dtype)
            acc = d if acc is None else acc + d
        return acc  # (B, T, 2*pad_bins): re | im lane-aligned halves

    timed(jax.jit(dft_current), wave, label="current 4-dot f32 (re+im forced)")
    timed(jax.jit(lambda w: dft_cat(w, jnp.float32)), wave,
          label="cat cos|sin 2-dot f32 (1152-lane halves)")
    timed(jax.jit(lambda w: dft_cat(w, jnp.bfloat16)), wave,
          label="cat cos|sin 2-dot bf16 out")

    # numerics: cat vs current
    re, im = dsp.stft_spectrum_dft(wave, 2048, 1024, precision="default")
    cat = dft_cat(wave, jnp.float32)
    re2 = cat[..., :n_bins]
    im2 = cat[..., pad_bins:pad_bins + n_bins]
    err_r = float(jnp.max(jnp.abs(re2 - re)) / (jnp.max(jnp.abs(re)) + 1e-9))
    err_i = float(jnp.max(jnp.abs(im2 - im)) / (jnp.max(jnp.abs(im)) + 1e-9))
    print(f"  cat-basis rel err: re {err_r:.2e}  im {err_i:.2e}")


if __name__ == "__main__":
    main()
