"""MODEL-LEVEL hardware A/B: fold-merged vs vmapped 5-fold inference.

The CLAUDE.md rule (learned from the fused_infer regression): isolated
block wins mean nothing — judge at the whole-model level, composed with
the frontend, at the bench shape (B=64, 10 s, mel_2048_1024_128,
reference-scale 2d CNN). This is the gate for making
models/merged_ensemble.py the production ensemble path.

Measures, honest-tunnel style:
- vmapped 5-fold infer (training/ensemble.py formulation — the current
  bench program)
- merged 5-fold infer (models/merged_ensemble.merged_infer_logits)
- numerics: max |prob diff| and logit correlation between the two

Usage: PYTHONPATH=/root/repo python scripts/probe_merged_ensemble.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.models.merged_ensemble import (
    merged_infer_logits,
)

SR = 44100
N_CLASSES = 80
N_FOLDS = 5
FEATURES = "mel_2048_1024_128"
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
    print(f"  {label:46s} {ms:8.3f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    b, l = 64, SR * 10
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16, fused_infer=False)
    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    host_vars = jax.device_get(variables)
    folds = []
    for i in range(N_FOLDS):
        r = np.random.RandomState(100 + i)
        folds.append(jax.tree.map(
            lambda leaf: (leaf + (0.01 * r.randn(*leaf.shape)).astype(
                leaf.dtype) if np.issubdtype(leaf.dtype, np.floating)
                else leaf), host_vars))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *folds)
    stacked["batch_stats"] = jax.tree.map(
        lambda v: jnp.abs(v) + 0.05, stacked["batch_stats"])

    measure_rtt()

    @jax.jit
    def infer_vmapped(wave, lengths):
        x, f = frontend(wave, lengths)
        logits = jax.vmap(
            lambda v: model.apply(v, x, f, train=False)["class_logits"]
        )(stacked)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    @jax.jit
    def infer_merged(wave, lengths):
        x, f = frontend(wave, lengths)
        logits = merged_infer_logits(model, stacked, x, f)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    @jax.jit
    def infer_merged_dense(wave, lengths):
        x, f = frontend(wave, lengths)
        logits = merged_infer_logits(model, stacked, x, f, dense_below=128)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    print("5-fold ensemble inference, B=64 x 10 s:", flush=True)
    timed(infer_vmapped, wave, lengths, label="vmapped (current bench path)")
    timed(infer_merged, wave, lengths, label="merged channels (grouped convs)")
    timed(infer_merged_dense, wave, lengths,
          label="merged channels (block-diag convs, Ci<128)")

    pv = np.asarray(infer_vmapped(wave, lengths))
    pm = np.asarray(infer_merged(wave, lengths))
    diff = float(np.max(np.abs(pv - pm)))
    corr = float(np.corrcoef(pv.ravel(), pm.ravel())[0, 1])
    print(f"numerics: max |prob diff| {diff:.3e}, prob corr {corr:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
