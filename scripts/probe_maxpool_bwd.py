"""A/B the maxpool backward: select-and-scatter vs elementwise masked VJP.

probe_traffic_floor.py showed select-and-scatter (the VJP XLA derives for
reduce_window-max) is the single largest traffic instruction of the no-aug
train step (1.0 GB for block0 alone). ops/pooling.py replaces it with a
first-max-priority equality mask for the towers' non-overlapping windows.

House rule: judged at WHOLE-MODEL level (full no-aug train step), with the
isolated block0-shape measurement for attribution only. Also asserts the
tie routing matches select-and-scatter ON THE CHIP (the CPU test already
passes; TPU could in principle break ties differently).

Usage: PYTHONPATH=/root/repo python scripts/probe_maxpool_bwd.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SR = 44100
N_CLASSES = 80
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
    print(f"  {label:46s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def tie_check_on_chip():
    from freesound_classification_tpu.ops.pooling import max_pool_nonoverlap

    rng = np.random.RandomState(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.randint(0, 3, size=(4, 8, 10, 7))
                        .astype(np.float32)).astype(dtype)
        dy = jnp.asarray(rng.randn(4, 4, 5, 7).astype(np.float32)) \
            .astype(dtype)
        g_ref = jax.jit(jax.grad(lambda v: jnp.sum(
            nn.max_pool(v, (2, 2), strides=(2, 2)).astype(jnp.float32)
            * dy.astype(jnp.float32))))(x)
        g_new = jax.jit(jax.grad(lambda v: jnp.sum(
            max_pool_nonoverlap(v, (2, 2)).astype(jnp.float32)
            * dy.astype(jnp.float32))))(x)
        same = bool(jnp.all(g_ref == g_new))
        print(f"  tie routing identical on chip ({dtype.__name__}): {same}",
              flush=True)
        assert same, "TPU select-and-scatter tie order differs!"


def main():
    from freesound_classification_tpu.models import blocks
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.ops.losses import make_loss
    from freesound_classification_tpu.ops.pooling import max_pool_nonoverlap
    from freesound_classification_tpu.training.optimizers import (
        make_optimizer,
    )
    from freesound_classification_tpu.training.state import create_train_state

    measure_rtt()
    tie_check_on_chip()

    # isolated pool fwd+bwd at the block0 shape (attribution only)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(64, 128, 431, 64).astype(np.float32)) \
        .astype(jnp.bfloat16)
    dy0 = jnp.asarray(rng.randn(64, 64, 215, 64).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def vjp_xla(v):
        return jax.grad(lambda u: jnp.sum(
            nn.max_pool(u, (2, 2), strides=(2, 2)).astype(jnp.float32)
            * dy0.astype(jnp.float32)))(v)

    def vjp_masked(v):
        return jax.grad(lambda u: jnp.sum(
            max_pool_nonoverlap(u, (2, 2)).astype(jnp.float32)
            * dy0.astype(jnp.float32)))(v)

    timed(jax.jit(vjp_xla), x0, label="block0 pool fwd+bwd select-and-scatter")
    timed(jax.jit(vjp_masked), x0, label="block0 pool fwd+bwd masked VJP")

    # whole-model A/B: full no-aug train step
    b, l = 64, SR * 10
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    labels = jnp.asarray((rng.rand(b, N_CLASSES) < 0.05).astype(np.float32))
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    loss_fn = make_loss("lsep")
    tx = make_optimizer("adam", lambda s: 1e-3, 0.0)

    def build_step(impl):
        blocks.POOL_BWD_IMPL = impl
        model = TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=N_CLASSES, dtype=jnp.bfloat16)
        inputs, fl = frontend(wave, lengths)
        state = create_train_state(model, inputs, fl, tx, seed=0)

        def train_step(state, w, ln, y):
            rng_, step_rng, drop = jax.random.split(state.rng, 3)
            x, f = frontend(w, ln)

            def loss_of(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, f, mutable=["batch_stats"], rngs={"dropout": drop},
                    train=True)
                return jnp.mean(loss_fn(out["class_logits"], y,
                                        average=False)), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=new_stats,
                                          rng=rng_)
            return state, loss

        return jax.jit(train_step), state

    for impl in ("xla", "masked"):
        step, state = build_step(impl)
        timed(lambda s: step(s, wave, lengths, labels)[1], state,
              label=f"no-aug train step POOL_BWD_IMPL={impl}")
    blocks.POOL_BWD_IMPL = "masked"


if __name__ == "__main__":
    main()
