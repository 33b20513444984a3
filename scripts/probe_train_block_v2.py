"""Hardware A/B: flax resnet blocks vs the tap-split train formulation.

The round-3 ablation (ROADMAP.md) put the flax ResnetBlock2d train fwd+bwd
at 10.28 ms at the block0 bench shape (B=64, 64x215x64 bf16), with XLA's
native conv lowering running the conv core at ~16% MXU. The tap-split
formulation (ops/resnet_train.py) re-expresses the 3x3 conv as nine
statically-shifted minor-dim einsums whose backward is again shifted
einsums — no conv / conv_transpose lowering anywhere.

Measures, honest-tunnel style (scalar readback, RTT subtracted):
- single block0-shape fwd+bwd: flax vs tap-split (f32 grads kept)
- flagship 2d CNN full train fwd+bwd (pre-featurized input): fused_train
  off vs on
plus numerics: max rel grad diff between the two paths on device.

Usage: PYTHONPATH=/root/repo python scripts/probe_train_block_v2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models.blocks import ResnetBlock2d
from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.ops.losses import make_loss
from freesound_classification_tpu.ops.resnet_train import (
    resnet_block_2d_train,
)

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
    print(f"{label:52s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def block_ab():
    c, h, w, b = 64, 64, 215, 64
    block = ResnetBlock2d(depth=c, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)).astype(
        jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    bs = variables["batch_stats"]

    def loss_flax(p, xx):
        y, _ = block.apply({"params": p, "batch_stats": bs}, xx,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_tap(p, xx):
        y, _ = resnet_block_2d_train(xx, {"params": p, "batch_stats": bs})
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_flax = jax.jit(jax.grad(loss_flax, argnums=(0, 1)))
    g_tap = jax.jit(jax.grad(loss_tap, argnums=(0, 1)))
    timed(g_flax, params, x, label="block0 fwd+bwd flax")
    timed(g_tap, params, x, label="block0 fwd+bwd tap-split")

    a = jax.tree.leaves(g_flax(params, x))
    bb = jax.tree.leaves(g_tap(params, x))
    worst = 0.0
    for ga, gb in zip(a, bb):
        scale = float(jnp.max(jnp.abs(ga))) + 1e-9
        if scale < 1e-3:  # zero conv-bias grads: noise only
            continue
        worst = max(worst,
                    float(jnp.max(jnp.abs(ga - gb))) / scale)
    print(f"block grad max rel diff (non-zero leaves): {worst:.3e}",
          flush=True)


def model_ab():
    b, l = 64, SR * 10
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    rng = np.random.RandomState(1)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    spec, fl = jax.jit(frontend)(wave, lengths)
    labels = jnp.asarray(
        (rng.rand(b, 80) < 0.05).astype(np.float32))
    loss_fn = make_loss("lsep_naive")

    for fused in (False, True):
        model = TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, fused_train=fused)
        variables = model.init(jax.random.PRNGKey(0), spec, fl, train=True)
        params = variables["params"]
        bs = variables["batch_stats"]

        def loss(p, s, f, y):
            out, _ = model.apply(
                {"params": p, "batch_stats": bs}, s, f, train=True,
                mutable=["batch_stats"])
            return jnp.mean(loss_fn(out["class_logits"], y))

        g = jax.jit(jax.grad(loss))
        timed(g, params, spec, fl, labels,
              label=f"2d CNN fwd+bwd fused_train={fused}")


def main():
    measure_rtt()
    block_ab()
    model_ab()


if __name__ == "__main__":
    main()
