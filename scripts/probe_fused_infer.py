"""Hardware A/B: model fwd + 5-fold vmapped fwd, fused_infer on vs off.

bench.py regressed 1847 -> 665 clips/s between round-1 (model default,
fused_infer absent) and the round-2 bench (fused_infer=True). probe_v2_model
measured the fused XLA twin at 19.78 ms where profile_train_step's unfused
forward is 8.5 ms — this isolates the flag.

Usage: PYTHONPATH=/root/repo python scripts/probe_fused_infer.py
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
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)
    _force(inputs)

    results = {}
    for fused in (False, True):
        model = TwoDimensionalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=80, dtype=jnp.bfloat16, fused_infer=fused)
        variables = model.init({"params": jax.random.PRNGKey(0)}, inputs,
                               fl, train=False)

        t1 = timed(jax.jit(lambda v, x, f, m=model: m.apply(
            v, x, f, train=False)), variables, inputs, fl,
            label=f"model fwd fused_infer={fused}")

        stacked = jax.tree.map(lambda v: jnp.stack([v] * 5), variables)

        def five_fold(sv, x, f, m=model):
            return jax.vmap(
                lambda v: m.apply(v, x, f, train=False)["class_logits"]
            )(sv)

        t5 = timed(jax.jit(five_fold), stacked, inputs, fl, n=8,
                   label=f"5-fold vmapped fused_infer={fused}")
        results[fused] = (t1, t5)
    print(f"fused/unfused ratio: single {results[True][0]/results[False][0]:.2f}x"
          f"  5-fold {results[True][1]/results[False][1]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
