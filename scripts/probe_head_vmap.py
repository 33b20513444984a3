"""Why does the fused block0-head kernel lose at MODEL level?

probe_head_kernel.py on chip (2026-08-20): isolated 3.54 -> 0.98 ms
(3.63x win), model-level 5-fold 49.73 -> 72.90 ms (0.68x LOSS). This
probe bisects: single-fold full-model A/B (no vmap) and 5-fold A/B with
the folds vmapped, same shapes as the bench. If the single-fold fused
path wins while the vmapped one loses, the regression is vmap-of-pallas
(grid-dim lowering / per-fold operand materialization); if single-fold
loses too, the kernel's win is eaten by integration (layout of its
output into the following ResnetBlock2d conv) and it retires.

Usage: PYTHONPATH=/root/repo python scripts/probe_head_vmap.py
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


def main():
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    measure_rtt()
    rng = np.random.RandomState(0)
    b_, l = 64, SR * 10
    wave = jnp.asarray(rng.randn(b_, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b_,), l, jnp.int32)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)

    def build(fused_head):
        return TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, fused_head=fused_head)

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

    print("\n[1] single-fold full model (B=64 x 10 s, no vmap)", flush=True)

    def make_single(fused_head):
        model = build(fused_head)

        def fwd(v, wave, lengths):
            x, f = frontend(wave, lengths)
            return model.apply(v, x, f, train=False)["class_logits"]

        return jax.jit(fwd)

    t_plain1 = timed(make_single(False), variables, wave, lengths,
                     label="fused_head=False single fold")
    t_fused1 = timed(make_single(True), variables, wave, lengths,
                     label="fused_head=True  single fold")
    print(f"  single-fold: {t_plain1:.2f} -> {t_fused1:.2f} ms "
          f"({t_plain1/t_fused1:.2f}x)")

    print("\n[2] head-only, vmapped over 5 folds (the model-level context)",
          flush=True)
    import flax.linen as nn

    from freesound_classification_tpu.models import blocks
    from freesound_classification_tpu.ops import pallas_head

    class _Head(nn.Module):
        depth: int = 64
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = blocks._bn(train, self.dtype, name="bn_in")(x)
            h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(h)
            h = blocks._max_pool(h, (2, 2))
            h = blocks._bn(train, self.dtype, name="bn_out")(h)
            return blocks.PReLU(self.depth, name="prelu")(h)

    x = jnp.asarray(rng.randn(b_, 128, 431, 2).astype(np.float32),
                    jnp.bfloat16)
    head = _Head()
    hv = head.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    hv = {"params": hv["params"],
          "batch_stats": jax.tree.map(
              lambda v: v + 0.3 * jnp.asarray(
                  np.random.RandomState(1).rand(*v.shape), v.dtype),
              hv["batch_stats"])}
    hv5 = jax.tree.map(lambda v: jnp.stack([v] * 5), hv)

    ref5 = jax.jit(lambda sv, xx: jax.vmap(
        lambda v: head.apply(v, xx, train=False))(sv))
    fused5 = jax.jit(lambda sv, xx: jax.vmap(
        lambda v: pallas_head.conv_block_2d_head_infer(xx, v))(sv))
    t_r5 = timed(ref5, hv5, x, label="unfused head x5 folds (vmap)")
    t_f5 = timed(fused5, hv5, x, label="fused head kernel x5 folds (vmap)")
    print(f"  vmapped x5: {t_r5:.2f} -> {t_f5:.2f} ms "
          f"({t_r5/t_f5:.2f}x)")


if __name__ == "__main__":
    main()
