"""Hardware A/B: block-DFT featurize at precision high (3-pass, the
torch-parity oracle) vs default (single bf16 MXU pass).

Every bf16 model quantizes its input to bf16 at entry, so the question is
whether single-pass DFT error survives the bf16 input cast in any way that
moves the logits. Measures featurize time both ways and the logit
correlation of the flagship model fed each variant.

Usage: PYTHONPATH=/root/repo python scripts/probe_dft_precision.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend

SR = 44100
_RTT = [0.03]


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


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
    print(f"{label:46s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    # realistic audio-ish signal: tones + noise at sane amplitude
    t = np.arange(l) / SR
    wave = np.stack([
        0.3 * np.sin(2 * np.pi * (100 + 37 * i) * t)
        + 0.05 * rng.randn(l) for i in range(b)
    ]).astype(np.float32)
    wave = jnp.asarray(wave)
    lengths = jnp.full((b,), l, jnp.int32)

    fe_hi = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                     dft_precision="high")
    fe_df = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                     dft_precision="default")

    x_hi, fl = jax.jit(fe_hi)(wave, lengths)
    x_df, _ = jax.jit(fe_df)(wave, lengths)
    a = np.asarray(x_hi, np.float32).ravel()
    d = np.asarray(x_df, np.float32).ravel()
    print(f"logmel corr hi-vs-default: {np.corrcoef(a, d)[0, 1]:.7f}  "
          f"max|diff| {np.max(np.abs(a - d)):.4f}  "
          f"(logmel range [{a.min():.1f}, {a.max():.1f}])", flush=True)
    # after the model's bf16 input cast
    abf = np.asarray(x_hi.astype(jnp.bfloat16), np.float32).ravel()
    dbf = np.asarray(x_df.astype(jnp.bfloat16), np.float32).ravel()
    frac_same = float(np.mean(abf == dbf))
    print(f"bf16-cast features identical fraction: {frac_same:.4f}",
          flush=True)

    timed(jax.jit(fe_hi), wave, lengths, label="featurize precision=high")
    timed(jax.jit(fe_df), wave, lengths, label="featurize precision=default")

    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=80,
        dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x_hi, fl,
                           train=False)
    fwd = jax.jit(lambda v, x, f: model.apply(v, x, f, train=False))
    lo_hi = np.asarray(fwd(variables, x_hi, fl)["class_logits"], np.float32)
    lo_df = np.asarray(fwd(variables, x_df, fl)["class_logits"], np.float32)
    print(f"logit corr hi-vs-default: "
          f"{np.corrcoef(lo_hi.ravel(), lo_df.ravel())[0, 1]:.7f}  "
          f"max|dlogit| {np.max(np.abs(lo_hi - lo_df)):.4f}", flush=True)


if __name__ == "__main__":
    main()
