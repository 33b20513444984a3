"""Hardware A/B for the fused ConvBlock2d head kernel (ops/pallas_head.py).

Gate for flipping fused_head on in the inference paths: the kernel must win
the MODEL-LEVEL 5-fold predict A/B (the house rule — fused_infer won every
isolated microbenchmark and lost 2.35x at model level). Sections:
  [1] numerics on chip: fused head vs unfused flax head at the block0 shape
  [2] isolated head timing (prep + kernel + transpose vs XLA section)
  [3] model-level 5-fold predict (B=64 x 10 s): fused_head False vs True

Usage: PYTHONPATH=/root/repo python scripts/probe_head_kernel.py
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
from freesound_classification_tpu.ops import pallas_head  # noqa: E402

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
    depth: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = blocks._bn(train, self.dtype, name="bn_in")(x)
        h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(h)
        h = blocks._max_pool(h, (2, 2))
        h = blocks._bn(train, self.dtype, name="bn_out")(h)
        return blocks.PReLU(self.depth, name="prelu")(h)


def main():
    measure_rtt()
    rng = np.random.RandomState(0)
    b_, h_, w_, c_, depth = 64, 128, 431, 2, 64

    print("\n[1] numerics on chip (block0 shape, bf16)", flush=True)
    x = jnp.asarray(rng.randn(b_, h_, w_, c_).astype(np.float32),
                    jnp.bfloat16)
    head = _Head(depth)
    variables = head.init({"params": jax.random.PRNGKey(0)},
                          x, train=False)
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.asarray(
            np.random.RandomState(1).rand(*v.shape), v.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    ref_fn = jax.jit(lambda xx: head.apply(variables, xx, train=False))
    fused_fn = jax.jit(lambda xx: pallas_head.conv_block_2d_head_infer(
        xx, variables))
    ref = np.asarray(ref_fn(x), np.float32)
    out = np.asarray(fused_fn(x), np.float32)
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    mad = float(np.max(np.abs(ref - out)))
    print(f"  corr {corr:.7f}  max abs diff {mad:.2e}")
    assert corr > 0.999, "kernel numerics broken on hardware"

    print("\n[2] isolated head timing (B=64, 128x431x2 -> 64x215x64)",
          flush=True)
    t_xla = timed(ref_fn, x, label="unfused flax head (bn+conv+pool+bn+prelu)")
    t_fused = timed(fused_fn, x, label="fused head kernel (incl prep + transpose)")
    print(f"  isolated: {t_xla:.2f} -> {t_fused:.2f} ms "
          f"({t_xla/t_fused:.2f}x)")

    print("\n[3] model-level 5-fold predict (B=64 x 10 s)", flush=True)
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    l = SR * 10
    wave = jnp.asarray(rng.randn(b_, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b_,), l, jnp.int32)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)

    def build(fused_head):
        model = TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, fused_head=fused_head)
        return model

    model0 = build(False)
    variables = model0.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                            train=False)
    # nudge batch_stats off init so the head's bn folding is non-degenerate
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(2).rand(*v.shape), v.dtype),
            variables["batch_stats"]),
    }
    stacked = jax.tree.map(lambda v: jnp.stack([v] * 5), variables)

    def make_predict(fused_head):
        model = build(fused_head)

        # stacked params are an explicit argument (never close a jit over
        # big device arrays — they embed as MLIR consts, CLAUDE.md)
        def predict(sv, wave, lengths):
            xf, f = frontend(wave, lengths)

            def one_fold(v):
                return model.apply(v, xf, f, train=False)["class_logits"]

            logits = jax.vmap(one_fold)(sv)
            return jnp.mean(jax.nn.sigmoid(logits), axis=0)

        return jax.jit(predict)

    plain = make_predict(False)
    fused = make_predict(True)
    t_plain = timed(plain, stacked, wave, lengths,
                    label="fused_head=False (production)")
    t_fused = timed(fused, stacked, wave, lengths, label="fused_head=True")
    p1 = np.asarray(plain(stacked, wave, lengths), np.float32)
    p2 = np.asarray(fused(stacked, wave, lengths), np.float32)
    print(f"  max abs prob diff: {np.max(np.abs(p1 - p2)):.2e}")
    print(f"  model-level: {t_plain:.2f} -> {t_fused:.2f} ms "
          f"({t_plain/t_fused:.2f}x)")


if __name__ == "__main__":
    main()
