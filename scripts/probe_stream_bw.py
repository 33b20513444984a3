"""Measure the chip's SUSTAINABLE HBM bandwidth with streaming kernels.

The 819 GB/s v5e figure is a datasheet peak; real programs top out below
it. The floor claim in probe_traffic_floor.py ("the no-aug step moves
~X GB at Y GB/s") is only meaningful against what a pure streaming
workload achieves on this chip through this software stack — measured
here via scale (y = a*x, 2 passes/elem) and triad (y = a*x + z,
3 passes/elem) at a working set far beyond VMEM.

Usage: PYTHONPATH=/root/repo python scripts/probe_stream_bw.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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


def timed_bw(fn, args, bytes_moved, n=30, label=""):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][0]))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][0]))
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    gbps = bytes_moved / (ms * 1e-3) / 1e9
    print(f"  {label:40s} {ms:8.2f} ms  -> {gbps:6.0f} GB/s", flush=True)
    return gbps


def main():
    measure_rtt()
    # 1 GB working set per f32 array (well past the 128 MB VMEM),
    # generated ON DEVICE — host->device uploads crawl over the tunnel
    shape = (2048, 131072)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, shape))(key)
    z = jax.jit(lambda k: jax.random.normal(k, shape))(
        jax.random.PRNGKey(1))
    float(jnp.sum(x[0]))
    float(jnp.sum(z[0]))
    nbytes = x.size * 4

    scale = jax.jit(lambda a: a * 1.000001)
    triad = jax.jit(lambda a, b: a * 1.000001 + b)
    copy2 = jax.jit(lambda a: a + 0.0)

    best = 0.0
    best = max(best, timed_bw(scale, (x,), 2 * nbytes,
                              label="scale y = a*x (2 passes)"))
    best = max(best, timed_bw(copy2, (x,), 2 * nbytes,
                              label="copy  y = x + 0 (2 passes)"))
    best = max(best, timed_bw(triad, (x, z), 3 * nbytes,
                              label="triad y = a*x + z (3 passes)"))
    print(f"sustainable HBM bandwidth ~= {best:.0f} GB/s "
          f"({best/819*100:.0f}% of the 819 datasheet peak)")


if __name__ == "__main__":
    main()
