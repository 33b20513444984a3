"""Hardware probe: v2 transposed-layout fused block vs XLA folded twin.

Block0 bench shape (B=64, 64x215x64 bf16). Honest tunnel timing (see
CLAUDE.md): dispatch N, force ONE scalar readback, subtract RTT.
Usage: PYTHONPATH=/root/repo python scripts/probe_v2_block.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.models import blocks
from freesound_classification_tpu.ops import pallas_resnet as pr

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
    print(f"{label:40s} {ms:8.2f} ms  (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    b, h, w, c = 64, 64, 215, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5,
                    dtype=jnp.bfloat16)
    block = blocks.ResnetBlock2d(c, jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False)
    fp = pr.fold_block_params(variables)

    flax_eval = jax.jit(lambda v, xx: block.apply(v, xx, train=False))
    xla_fused = jax.jit(pr.resnet_block_2d_infer_xla)
    v2 = jax.jit(lambda xx, f: pr.resnet_block_2d_infer_pallas_t(xx, f))

    # numerics first
    ref = np.asarray(flax_eval(variables, x), np.float32)
    out = np.asarray(v2(x, fp), np.float32)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    print(f"v2 corr vs flax eval: {corr:.7f}", flush=True)
    assert corr > 0.999, corr

    timed(flax_eval, variables, x, label="flax block eval")
    timed(xla_fused, x, fp, label="XLA folded twin")
    timed(v2, x, fp, label="v2 pallas (incl. boundary transpose)")

    # kernel alone (inputs pre-transposed): what the fused-layout model
    # (transpose amortized across blocks) would see
    cp = -(-c // 16) * 16
    wp = -(-(w + 1) // 128) * 128
    xt = jnp.pad(jnp.transpose(x, (0, 1, 3, 2)),
                 ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))
    w2r = fp["w2"].reshape(3, 3, c, -1)

    def seg(dh, dw):
        m = w2r[dh, dw].T
        return jnp.pad(m, ((0, cp - m.shape[0]), (0, cp - m.shape[1])))

    k2 = jnp.stack([
        jnp.concatenate([seg(dh, dw) for dh in range(3)], axis=1)
        for dw in range(3)])
    padw = lambda m: jnp.pad(m, ((0, cp - m.shape[0]),
                                 (0, cp - m.shape[1])))
    padc = lambda v: jnp.pad(v, (0, cp - v.shape[0]))[:, None]
    lmask = (jnp.arange(wp) < w).astype(jnp.float32)[None, :]
    args = (xt, padw(fp["w1"].T), k2, padw(fp["w3"].T),
            padc(fp["b1"]), padc(fp["b2"]), padc(fp["b3"]),
            padc(fp["a1"]), padc(fp["a2"]), padc(fp["a3"]), lmask)
    kern = jax.jit(pr._fused_pallas_t)
    timed(kern, *args, label="v2 kernel alone (pre-transposed)")

    # HBM floor for reference: 2 passes over (64,64,64,256) bf16 = 2*268MB
    gb = 2 * b * h * cp * wp * 2 / 1e9
    print(f"kernel HBM traffic {gb*1e3:.0f} MB; floor @ 800 GB/s = "
          f"{gb / 800 * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
