"""Hardware A/B for the phase-decomposed conv+pool lowering
(models/blocks.phase_conv_pool_2d) — the pure-XLA harvest of the ~10.7 ms
block0-traffic prize the retired Pallas head kernel could not collect
(custom-call integration boundary, docs/STUDIES.md).

Gate for flipping phase_pool on in the inference paths: it must win the
MODEL-LEVEL 5-fold predict A/B (the house rule — fused_infer and the head
kernel both won isolated microbenchmarks and lost at model level).
Sections:
  [1] numerics on chip: phase path vs unfused flax block head (block0 +
      block1 shapes, merged 5-fold batch) — must be bit-exact
  [2] isolated head timing at the merged block0/block1 shapes
  [3] model-level 5-fold predict (B=64 x 10 s): phase_pool False vs
      block0-only vs blocks 0-1 vs all blocks

Usage: PYTHONPATH=/root/repo python scripts/probe_phase_pool.py
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


class _Head(nn.Module):
    """bn_in -> conv3x3 -> pool(2,2) -> bn_out -> prelu, both lowerings."""

    depth: int
    phase: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = blocks._bn(False, self.dtype, name="bn_in")(x)
        if self.phase and not self.is_initializing():
            cp = self.variables["params"]["conv"]
            h = blocks.phase_conv_pool_2d(h, cp["kernel"], cp["bias"],
                                          (2, 2), self.dtype)
        else:
            h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(h)
            h = blocks._max_pool(h, (2, 2))
        h = blocks._bn(False, self.dtype, name="bn_out")(h)
        return blocks.PReLU(self.depth, name="prelu")(h)


def head_ab(label, b_, h_, w_, c_, depth):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b_, h_, w_, c_).astype(np.float32),
                    jnp.bfloat16)
    plain = _Head(depth)
    phased = _Head(depth, phase=True)
    variables = plain.init({"params": jax.random.PRNGKey(0)}, x)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(1).rand(*v.shape), v.dtype),
            variables["batch_stats"]),
    }
    f_plain = jax.jit(lambda v, xx: plain.apply(v, xx))
    f_phase = jax.jit(lambda v, xx: phased.apply(v, xx))
    a = np.asarray(f_plain(variables, x), np.float32)
    b = np.asarray(f_phase(variables, x), np.float32)
    mad = float(np.max(np.abs(a - b)))
    print(f"  [{label}] max abs diff {mad:.2e} "
          f"({'bit-exact' if mad == 0 else 'NOT EXACT'})", flush=True)
    t0 = timed(f_plain, variables, x, label=f"{label} reduce-window head")
    t1 = timed(f_phase, variables, x, label=f"{label} phase-pool head")
    print(f"  [{label}] isolated: {t0:.2f} -> {t1:.2f} ms ({t0/t1:.2f}x)")


def main():
    measure_rtt()

    print("\n[1]+[2] isolated heads (merged 5-fold batch shapes)",
          flush=True)
    head_ab("block0 320x128x431x2->64", 320, 128, 431, 2, 64)
    head_ab("block1 320x64x215x64->96", 320, 64, 215, 64, 96)

    print("\n[3] model-level 5-fold predict (B=64 x 10 s)", flush=True)
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    rng = np.random.RandomState(0)
    b_, l = 64, SR * 10
    wave = jnp.asarray(rng.randn(b_, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b_,), l, jnp.int32)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)

    def build(pp):
        return TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, phase_pool=pp)

    model0 = build(False)
    variables = model0.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                            train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(2).rand(*v.shape), v.dtype),
            variables["batch_stats"]),
    }
    stacked = jax.tree.map(lambda v: jnp.stack([v] * 5), variables)

    def make_predict(pp):
        model = build(pp)

        def predict(sv, wave, lengths):
            xf, f = frontend(wave, lengths)

            def one_fold(v):
                return model.apply(v, xf, f, train=False)["class_logits"]

            logits = jax.vmap(one_fold)(sv)
            return jnp.mean(jax.nn.sigmoid(logits), axis=0)

        return jax.jit(predict)

    plain = make_predict(False)
    t_plain = timed(plain, stacked, wave, lengths,
                    label="phase_pool=False (production)")
    p_ref = np.asarray(plain(stacked, wave, lengths), np.float32)
    results = {False: t_plain}
    for pp, label in [
        ((True, False, False, False, False, False), "block0 only"),
        ((True, True, False, False, False, False), "blocks 0-1"),
        (True, "all blocks"),
    ]:
        fn = make_predict(pp)
        t = timed(fn, stacked, wave, lengths,
                  label=f"phase_pool {label}")
        p = np.asarray(fn(stacked, wave, lengths), np.float32)
        mad = float(np.max(np.abs(p - p_ref)))
        print(f"    max abs prob diff {mad:.2e}; "
              f"{t_plain:.2f} -> {t:.2f} ms ({t_plain/t:.2f}x)",
              flush=True)
        results[label] = t


if __name__ == "__main__":
    main()
