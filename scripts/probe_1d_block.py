"""Hardware A/B: fused 1d resnet block (lane-roll kernel) vs XLA twin vs
unfused flax, at HierarchicalCNN shapes (reference networks/classifiers.py
:107-217 tower: T halves and C grows per block).

Usage: PYTHONPATH=/root/repo python scripts/probe_1d_block.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models import blocks
from freesound_classification_tpu.ops import pallas_resnet1d as pr1

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


def timed(fn, *args, n=30, label=""):
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


def probe_shape(b, t, c):
    print(f"--- B={b} T={t} C={c} " + "-" * 30, flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.5,
                    dtype=jnp.bfloat16)
    block = blocks.ResnetBlock1d(c, jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    fp = pr1.fold_block_params_1d(variables)

    ref = np.asarray(jax.jit(
        lambda v, xx: block.apply(v, xx, train=False))(variables, x),
        dtype=np.float32)
    timed(jax.jit(lambda v, xx: block.apply(v, xx, train=False)),
          variables, x, label="unfused flax eval")

    xla = jax.jit(lambda xx, f: pr1.resnet_block_1d_infer_xla(xx, f))
    out_x = np.asarray(xla(x, fp), dtype=np.float32)
    print(f"  xla-twin corr vs flax: "
          f"{np.corrcoef(out_x.ravel(), ref.ravel())[0, 1]:.6f}", flush=True)
    timed(xla, x, fp, label="XLA folded twin")

    kern = jax.jit(lambda xx, f: pr1.resnet_block_1d_infer_pallas(xx, f))
    out_k = np.asarray(kern(x, fp), dtype=np.float32)
    print(f"  kernel corr vs flax:   "
          f"{np.corrcoef(out_k.ravel(), ref.ravel())[0, 1]:.6f}", flush=True)
    timed(kern, x, fp, label="fused lane-roll kernel")


def main():
    measure_rtt()
    # hierarchical tower shapes at B=64, 10 s, mel_2048_1024_128 features:
    # block0 T=430->215 after pool, C=64; growth 2.0 -> 128, 256, ...
    probe_shape(64, 215, 64)
    probe_shape(64, 107, 128)
    probe_shape(64, 53, 256)
    probe_shape(64, 26, 512)


if __name__ == "__main__":
    main()
