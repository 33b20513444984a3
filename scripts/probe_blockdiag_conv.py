"""Hardware A/B: grouped (fgc=K) vs dense BLOCK-DIAGONAL convs for the
fold-merged ensemble (scripts/probe_infer_levers.py found grouped convs
don't beat vmapped ones; small per-fold C starves the MXU's K dimension
either way). A block-diagonal dense conv spends K^2/K = Kx the FLOPs —
nearly free at these shapes — to run with the full merged K=320-lane
contraction dimension. Zero off-diagonal blocks contribute exactly 0, so
numerics are unchanged.

Also: 1x1 conv as a flat (B*H*W, KC) @ (KC, KC) matmul (dot, not conv
emitter).

Usage: PYTHONPATH=/root/repo python scripts/probe_blockdiag_conv.py
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


def blockdiag(w_fold):
    """(K, kh, kw, Ci, Co) -> dense (kh, kw, K*Ci, K*Co) block-diagonal."""
    k, kh, kw, ci, co = w_fold.shape
    dense = np.zeros((kh, kw, k * ci, k * co), np.float32)
    wf = np.asarray(w_fold, np.float32)
    for g in range(k):
        dense[:, :, g * ci:(g + 1) * ci, g * co:(g + 1) * co] = wf[g]
    return jnp.asarray(dense, jnp.bfloat16)


def main():
    measure_rtt()
    rng = np.random.RandomState(0)
    K = 5

    x3 = jnp.asarray(rng.randn(64, 64, 215, K * 64).astype(np.float32),
                     jnp.bfloat16)
    w3_fold = rng.randn(K, 3, 3, 64, 96).astype(np.float32) * 0.05
    w3_grouped = jnp.asarray(
        np.moveaxis(w3_fold, 0, 3).reshape(3, 3, 64, K * 96), jnp.bfloat16)
    w3_dense = blockdiag(w3_fold)

    def conv(x, w, fgc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc, preferred_element_type=jnp.bfloat16)

    print("\n[3x3 conv 64->96 per fold, merged (64,64,215,320)]")
    timed(jax.jit(lambda x: conv(x, w3_grouped, K)), x3, label="grouped fgc=5")
    timed(jax.jit(lambda x: conv(x, w3_dense, 1)), x3, label="dense block-diag")

    # numerics
    a = conv(x3, w3_grouped, K)
    b = conv(x3, w3_dense, 1)
    print(f"  max abs diff grouped vs dense: "
          f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))):.3e}")

    print("\n[1x1 conv 64->64 per fold, merged (64,64,215,320)]")
    w1_fold = rng.randn(K, 1, 1, 64, 64).astype(np.float32) * 0.05
    w1_grouped = jnp.asarray(
        np.moveaxis(w1_fold, 0, 3).reshape(1, 1, 64, K * 64), jnp.bfloat16)
    w1_dense = blockdiag(w1_fold)
    timed(jax.jit(lambda x: conv(x, w1_grouped, K)), x3, label="grouped fgc=5 1x1")
    timed(jax.jit(lambda x: conv(x, w1_dense, 1)), x3, label="dense block-diag 1x1")

    w1_mat = w1_dense.reshape(K * 64, K * 64)

    def dot1x1(x):
        b_, h_, w_, c_ = x.shape
        return (x.reshape(-1, c_) @ w1_mat).reshape(b_, h_, w_, c_)

    timed(jax.jit(dot1x1), x3, label="dense block-diag 1x1 as flat dot")

    # later-block shape: C=216/fold at (64, 8, 26) — grouped should win there
    print("\n[3x3 conv 216->216 per fold, merged (64,8,26,1080)]")
    x5 = jnp.asarray(rng.randn(64, 8, 26, K * 216).astype(np.float32),
                     jnp.bfloat16)
    w5_fold = rng.randn(K, 3, 3, 216, 216).astype(np.float32) * 0.02
    w5_grouped = jnp.asarray(
        np.moveaxis(w5_fold, 0, 3).reshape(3, 3, 216, K * 216), jnp.bfloat16)
    w5_dense = blockdiag(w5_fold)
    timed(jax.jit(lambda x: conv(x, w5_grouped, K)), x5, label="grouped fgc=5")
    timed(jax.jit(lambda x: conv(x, w5_dense, 1)), x5, label="dense block-diag")


if __name__ == "__main__":
    main()
