"""Composed hardware A/B for the frontend-DFT context anomaly.

probe_infer_profile.py showed the block-DFT spectrum dots cost ~10 ms
inside the 5-fold inference program vs 2.5 ms isolated — a context
(layout/fusion) pessimization, not intrinsic cost. Candidate fixes, all
measured COMPOSED with the vmapped 5-fold model at the bench shape:

V1 composed baseline (current bench program)
V2 split dispatch: featurize as its own jit program + model program
   (device programs run serially back-to-back; the boundary forces
   default layouts instead of letting the model's layout choices poison
   the frontend)
V3 composed, fast featurize: ONE cat(cos|sin) bf16 dot per block offset
   (lane-aligned 1152-bin halves) feeding a Pallas kernel that splits
   re/im in VMEM — bf16 spectra never round-trip as f32
V4 split dispatch + fast featurize

Numerics: V3 logit corr vs V1 (the bf16-spectrum gate, like the
probe_dft_precision.py single-pass study).

Usage: PYTHONPATH=/root/repo python scripts/probe_dft_context.py
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.ops import dsp

SR = 44100
N_CLASSES = 80
N_FOLDS = 5
FEATURES = "mel_2048_1024_128"
N_FFT, HOP, N_MEL = 2048, 1024, 128
_RTT = [0.03]
_ROW_TILE = 256


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
    print(f"  {label:52s} {ms:8.3f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


# ---------------------------------------------------------------------------
# fast featurize: cat-basis bf16 DFT + split-in-VMEM mel kernel
# ---------------------------------------------------------------------------

PAD_BINS = 1152  # 1025 -> 9*128, lane-aligned halves


@functools.lru_cache(maxsize=2)
def _cat_basis():
    cos_b, sin_b = dsp._dft_basis(N_FFT, HOP)
    m, hop, n_bins = cos_b.shape
    cat = np.zeros((m, hop, 2 * PAD_BINS), np.float32)
    cat[:, :, :n_bins] = cos_b
    cat[:, :, PAD_BINS:PAD_BINS + n_bins] = sin_b
    return cat


def _mel_log_split_kernel(spec_ref, fb_ref, out_ref):
    re = spec_ref[:, :PAD_BINS]
    im = spec_ref[:, PAD_BINS:]
    mag = jnp.sqrt(re * re + im * im).astype(jnp.bfloat16)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + 1e-4)


def fast_featurize(wave, fb_t):
    """(B, L) -> (B, N_MEL, T) log-mel via one bf16 cat-DFT + split kernel."""
    b, length = wave.shape
    pad = N_FFT // 2
    xp = jnp.pad(wave.astype(jnp.float32), ((0, 0), (pad, pad)),
                 mode="reflect")
    n_frames = dsp.num_stft_frames(length, N_FFT, HOP)
    m = N_FFT // HOP
    total = xp.shape[-1]
    n_blocks = -(-total // HOP)
    xp = jnp.pad(xp, ((0, 0), (0, n_blocks * HOP - total)))
    if n_blocks < n_frames + m - 1:
        xp = jnp.pad(
            xp, ((0, 0), (0, (n_frames + m - 1 - n_blocks) * HOP)))
    blocks = xp.reshape(b, -1, HOP).astype(jnp.bfloat16)
    cat_b = jnp.asarray(_cat_basis(), jnp.bfloat16)
    acc = None
    for o in range(m):
        view = blocks[:, o:o + n_frames, :]
        d = jnp.einsum("bth,hf->btf", view, cat_b[o],
                       preferred_element_type=jnp.bfloat16)
        acc = d if acc is None else acc + d
    # (B, T, 2*PAD_BINS) bf16 -> pallas mel/log
    rows = b * n_frames
    rows_p = -(-rows // _ROW_TILE) * _ROW_TILE
    spec = acc.reshape(rows, 2 * PAD_BINS)
    spec = jnp.pad(spec, ((0, rows_p - rows), (0, 0)))
    fb_p = jnp.pad(fb_t.astype(jnp.bfloat16),
                   ((0, PAD_BINS - fb_t.shape[0]), (0, 0)))
    out = pl.pallas_call(
        _mel_log_split_kernel,
        grid=(rows_p // _ROW_TILE,),
        in_specs=[
            pl.BlockSpec((_ROW_TILE, 2 * PAD_BINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAD_BINS, N_MEL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, N_MEL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, N_MEL), jnp.float32),
    )(spec, fb_p)
    out = out[:rows].reshape(b, n_frames, N_MEL)
    return jnp.swapaxes(out, -1, -2)


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

    def model_5fold(x, f):
        logits = jax.vmap(
            lambda v: model.apply(v, x, f, train=False)["class_logits"]
        )(stacked)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    @jax.jit
    def v1_composed(wave, lengths):
        x, f = frontend(wave, lengths)
        return model_5fold(x, f)

    feat_jit = jax.jit(lambda w, ln: frontend(w, ln))
    model_jit = jax.jit(model_5fold)

    def v2_split(wave, lengths):
        x, f = feat_jit(wave, lengths)
        return model_jit(x, f)

    fb_t = frontend.filterbank.T

    def fast_inputs(wave, lengths):
        spec = fast_featurize(wave, fb_t)
        n_frames = spec.shape[-1]
        f = jnp.minimum(lengths // HOP + 1, n_frames).astype(jnp.int32)
        return spec[..., None], f

    @jax.jit
    def v3_composed_fast(wave, lengths):
        x, f = fast_inputs(wave, lengths)
        return model_5fold(x, f)

    fast_jit = jax.jit(fast_inputs)

    def v4_split_fast(wave, lengths):
        x, f = fast_jit(wave, lengths)
        return model_jit(x, f)

    print("5-fold ensemble inference, B=64 x 10 s:", flush=True)
    timed(v1_composed, wave, lengths, label="V1 composed baseline")
    timed(v2_split, wave, lengths, label="V2 split dispatch")
    timed(v3_composed_fast, wave, lengths, label="V3 composed + fast bf16 cat-DFT")
    timed(v4_split_fast, wave, lengths, label="V4 split + fast bf16 cat-DFT")

    p1 = np.asarray(v1_composed(wave, lengths))
    p3 = np.asarray(v3_composed_fast(wave, lengths))
    print(f"V3 vs V1: max |prob diff| {float(np.max(np.abs(p1-p3))):.3e}, "
          f"corr {float(np.corrcoef(p1.ravel(), p3.ravel())[0,1]):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
