"""Hardware A/B: PReLU as where(x>=0, x, a*x) vs max(x,0) + a*min(x,0).

Why: probe_infer_floor.py (round 4, phase-pool program) shows the 5-fold
predict's resnet PReLU stages as STANDALONE compare_select fusions
(~1.1 GB read+write each at block0 scale) — XLA did not fuse them into
the producing convolutions, while it demonstrably fuses `maximum`
epilogues (the phase-pool convolution_maximum_fusions). The max/min form
is bit-exact vs the where form for every input (x>=0: x + a*0; x<0:
0 + a*x; NaN propagates through lax.max/min/add identically) and might
be epilogue-fusable.

Sections:
  [1] numerics + isolated resnet-block timing at the merged block0 shape
  [2] model-level 5-fold predict A/B (the house gate)

Usage: PYTHONPATH=/root/repo python scripts/probe_prelu_form.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import flax.linen as nn  # noqa: E402

from freesound_classification_tpu.models import blocks  # noqa: E402

SR = 44100
_RTT = [0.03]


class PReLUMaxMin(nn.Module):
    """Drop-in PReLU twin: same param name/init, max/min formulation."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, 0.25, self.param_dtype),
            (self.channels,),
        )
        alpha = alpha.astype(x.dtype)
        zero = jnp.zeros((), x.dtype)
        return jnp.maximum(x, zero) + alpha * jnp.minimum(x, zero)


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
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    print(f"  {label:56s} {ms:8.3f} ms  (compile+1 {compile_s:4.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    rng = np.random.RandomState(0)

    print("[1] isolated ResnetBlock2d (merged block0 shape, bf16)",
          flush=True)
    x = jnp.asarray(rng.randn(320, 64, 215, 64).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    blk = blocks.ResnetBlock2d(64, jnp.bfloat16)
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(1).rand(*v.shape), v.dtype),
            variables["batch_stats"]),
    }
    f_where = jax.jit(lambda v, xx: blk.apply(v, xx, train=False))
    orig = blocks.PReLU
    try:
        blocks.PReLU = PReLUMaxMin
        blk_mm = blocks.ResnetBlock2d(64, jnp.bfloat16)
        f_maxmin = jax.jit(lambda v, xx: blk_mm.apply(v, xx, train=False))
        a = np.asarray(f_where(variables, x), np.float32)
        b = np.asarray(f_maxmin(variables, x), np.float32)
        mad = float(np.max(np.abs(a - b)))
        print(f"  max abs diff {mad:.2e} "
              f"({'bit-exact' if mad == 0 else 'NOT exact'})", flush=True)
        t0 = timed(f_where, variables, x, label="where-form PReLU block")
        t1 = timed(f_maxmin, variables, x, label="max/min-form PReLU block")
        print(f"  isolated: {t0:.2f} -> {t1:.2f} ms ({t0/t1:.2f}x)")
    finally:
        blocks.PReLU = orig

    print("\n[2] model-level 5-fold predict (B=64 x 10 s)", flush=True)
    from freesound_classification_tpu.models import classifiers
    from freesound_classification_tpu.models.frontend import Frontend

    b_, l = 64, SR * 10
    wave = jnp.asarray(rng.randn(b_, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b_,), l, jnp.int32)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)

    def build():
        return classifiers.TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, phase_pool=(True,))

    model = build()
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(2).rand(*v.shape), v.dtype),
            variables["batch_stats"]),
    }
    stacked = jax.tree.map(lambda v: jnp.stack([v] * 5), variables)

    def make_predict(model):
        def predict(sv, wave, lengths):
            xf, f = frontend(wave, lengths)

            def one_fold(v):
                return model.apply(v, xf, f, train=False)["class_logits"]

            logits = jax.vmap(one_fold)(sv)
            return jnp.mean(jax.nn.sigmoid(logits), axis=0)

        return jax.jit(predict)

    plain = make_predict(model)
    t_plain = timed(plain, stacked, wave, lengths, label="where-form PReLU")
    p_ref = np.asarray(plain(stacked, wave, lengths), np.float32)
    try:
        blocks.PReLU = PReLUMaxMin
        # classifiers.MLPHead/blocks reference blocks.PReLU by module
        # global, so rebuilding the model picks the patched class up
        mm = make_predict(build())
        t_mm = timed(mm, stacked, wave, lengths, label="max/min-form PReLU")
        p = np.asarray(mm(stacked, wave, lengths), np.float32)
        print(f"  max abs prob diff {np.max(np.abs(p - p_ref)):.2e}; "
              f"{t_plain:.2f} -> {t_mm:.2f} ms ({t_plain/t_mm:.2f}x)",
              flush=True)
    finally:
        blocks.PReLU = orig


if __name__ == "__main__":
    main()
