"""Hardware A/B: depth-6 fused-infer model forward, XLA twin vs v2 kernel,
plus the 5-fold vmapped ensemble program (the bench path).

Usage: PYTHONPATH=/root/repo python scripts/probe_v2_model.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models.classifiers import (
    TwoDimensionalCNN,
)
from freesound_classification_tpu.models.frontend import Frontend
from freesound_classification_tpu.ops import pallas_resnet

SR = 44100
_RTT = [0.03]
_ORIG_INFER = pallas_resnet.resnet_block_2d_infer


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
    print(f"{label:44s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def route(use_v2: bool):
    pallas_resnet.resnet_block_2d_infer = functools.partial(
        _ORIG_INFER, use_pallas_kernel=use_v2)


def main():
    measure_rtt()
    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True)
    inputs, fl = frontend(wave, lengths)
    _force(inputs)

    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=80,
        dtype=jnp.bfloat16, fused_infer=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)

    def fwd(v, x, f):
        return model.apply(v, x, f, train=False)

    route(False)
    r_xla = np.asarray(jax.jit(fwd)(variables, inputs, fl)["class_logits"],
                       np.float32)
    t_xla = timed(jax.jit(fwd), variables, inputs, fl,
                  label="fused model fwd depth=6 (XLA twin)")

    route(True)
    r_v2 = np.asarray(
        jax.jit(lambda v, x, f: model.apply(v, x, f, train=False))(
            variables, inputs, fl)["class_logits"], np.float32)
    corr = np.corrcoef(r_v2.ravel(), r_xla.ravel())[0, 1]
    print(f"v2 model logits corr vs XLA twin: {corr:.6f}", flush=True)
    t_v2 = timed(jax.jit(lambda v, x, f: model.apply(v, x, f, train=False)),
                 variables, inputs, fl,
                 label="fused model fwd depth=6 (v2 kernel)")

    # 5-fold vmapped ensemble program (bench path: shared batch, stacked
    # params -> custom_vmap unroll)
    stacked = jax.tree.map(
        lambda v: jnp.stack([v] * 5), variables)

    def five_fold(sv, x, f):
        return jax.vmap(
            lambda v: model.apply(v, x, f, train=False)["class_logits"]
        )(sv)

    route(False)
    t5_xla = timed(jax.jit(five_fold), stacked, inputs, fl, n=8,
                   label="5-fold vmapped fwd (XLA twin)")
    route(True)
    out5 = jax.jit(five_fold)(stacked, inputs, fl)
    c5 = np.corrcoef(np.asarray(out5[0], np.float32).ravel(),
                     r_xla.ravel())[0, 1]
    print(f"5-fold v2 fold0 corr vs XLA: {c5:.6f}", flush=True)
    t5_v2 = timed(jax.jit(five_fold), stacked, inputs, fl, n=8,
                  label="5-fold vmapped fwd (v2 kernel)")
    print(f"speedups: single {t_xla/t_v2:.2f}x, 5-fold {t5_xla/t5_v2:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
