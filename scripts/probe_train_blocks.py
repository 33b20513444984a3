"""Hardware breakdown: where the ~41 ms model fwd+bwd goes, per block.

Measures value_and_grad of the flagship 2d CNN at bench scale with
num_conv_blocks = 1..6 — the marginal cost of each tower stage — plus the
eval forward for reference. Inputs are pre-featurized so this isolates the
model (featurize has no trainable params; its backward never runs in the
real step either).

Usage: PYTHONPATH=/root/repo python scripts/probe_train_blocks.py
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
from freesound_classification_tpu.ops.losses import make_loss

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


def timed(fn, *args, n=15, label=""):
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
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    labels = jnp.asarray((rng.rand(b, 80) < 0.05).astype(np.float32))
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True)
    inputs, fl = frontend(wave, lengths)
    _force(inputs)
    loss_fn = make_loss("lsep")

    prev = 0.0
    for nb in range(1, 7):
        model = TwoDimensionalCNN(
            num_conv_blocks=nb,
            start_deep_supervision_on=min(2, nb - 1),
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16)
        variables = model.init({"params": jax.random.PRNGKey(0)}, inputs,
                               fl, train=False)
        params, stats = variables["params"], variables["batch_stats"]

        def loss_of(p, st, x, f, y):
            out, mut = model.apply(
                {"params": p, "batch_stats": st}, x, f,
                mutable=["batch_stats"], train=True)
            return jnp.mean(loss_fn(out["class_logits"], y,
                                    average=False)), mut["batch_stats"]

        step = jax.jit(lambda p, st, x, f, y: jax.value_and_grad(
            loss_of, has_aux=True)(p, st, x, f, y))
        ms = timed(step, params, stats, inputs, fl, labels,
                   label=f"fwd+bwd nb={nb}")
        print(f"    marginal block{nb-1}: {ms - prev:+.2f} ms", flush=True)
        prev = ms

    # eval fwd of the full model for reference
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=80,
        dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    timed(jax.jit(lambda v, x, f: model.apply(v, x, f, train=False)),
          variables, inputs, fl, label="eval fwd nb=6 (unfused)")


if __name__ == "__main__":
    main()
