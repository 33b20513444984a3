"""Layout-matched bandwidth closure for the 5-fold inference program.

probe_infer_floor.py (round 4, phase-pool program) reports 47.3 ms /
16.93 GB = 358 GB/s = 50.6% of the 708 GB/s sustainable stream figure.
But 708 GB/s was measured on full-lane f32 (2048, 131072) arrays
(probe_stream_bw.py); the predict program's tensors are fold-merged
rank-5 bf16 maps whose minor dim is the tower depth (64/96/144...) —
half-lane (or worse) tiles. This probe measures what a PURE STREAMING
kernel (y = a*x, 2 passes/elem) achieves at exactly those shapes/dtypes,
plus full-lane controls, so the program's utilization is judged against
an apples-to-apples ceiling (same closure methodology as the train
step's probe_traffic_floor.py, which had the luxury of f32/near-full-
lane tensors).

Usage: PYTHONPATH=/root/repo python scripts/probe_infer_closure.py
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

# round-4 probe_infer_floor.py numbers for the production program
PROGRAM_WALL_MS = 47.29
PROGRAM_GB = 16.93


def measure_rtt():
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"RTT {_RTT[0]*1e3:.1f} ms", flush=True)


def scale_bw(shape, dtype, label, n=30):
    nelem = int(np.prod(shape))
    x = jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.float32).astype(dtype)
    )(jax.random.PRNGKey(0))
    float(jnp.sum(x.reshape(-1)[:8].astype(jnp.float32)))
    f = jax.jit(lambda a, xx: (a * xx).astype(dtype))
    a = jnp.asarray(1.0001, dtype)
    out = f(a, x)
    float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = f(a, out)
    float(jnp.sum(out.reshape(-1)[:8].astype(jnp.float32)))
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    bytes_moved = 2 * nelem * np.dtype(dtype).itemsize
    gbps = bytes_moved / (ms * 1e-3) / 1e9
    print(f"  {label:52s} {ms:7.3f} ms -> {gbps:6.0f} GB/s", flush=True)
    return gbps


def main():
    measure_rtt()
    print("layout-matched streaming (y = a*x) at the program's shapes:",
          flush=True)
    results = {}
    # the program's dominant activation maps (fold-merged rank-5 bf16)
    results["block0 map (5,64,64,215,64) bf16"] = scale_bw(
        (5, 64, 64, 215, 64), jnp.bfloat16,
        "block0 map (5,64,64,215,64) bf16 [C=64 minor]")
    results["block1 conv (5,64,64,215,96) bf16"] = scale_bw(
        (5, 64, 64, 215, 96), jnp.bfloat16,
        "block1 conv (5,64,64,215,96) bf16 [C=96 minor]")
    results["block1 map (5,64,32,107,96) bf16"] = scale_bw(
        (5, 64, 32, 107, 96), jnp.bfloat16,
        "block1 map (5,64,32,107,96) bf16")
    # controls: same byte count, friendlier layouts
    results["control (5,64,32,215,128) bf16 full-lane"] = scale_bw(
        (5, 64, 32, 215, 128), jnp.bfloat16,
        "control same-bytes (5,64,32,215,128) bf16 [C=128]")
    results["control (5,64,32,215,64) f32"] = scale_bw(
        (5, 64, 32, 215, 64), jnp.float32,
        "control same-bytes f32 [C=64 minor]")
    results["control big f32 full-lane"] = scale_bw(
        (2048, 65536), jnp.float32,
        "control (2048,65536) f32 [probe_stream_bw-like]")
    results["control big bf16 full-lane"] = scale_bw(
        (2048, 131072), jnp.bfloat16,
        "control (2048,131072) bf16 full-lane")

    s64 = results["block0 map (5,64,64,215,64) bf16"]
    implied = PROGRAM_GB / (PROGRAM_WALL_MS * 1e-3) / 1e9 * 1e9
    implied_gbps = PROGRAM_GB * 1e9 / (PROGRAM_WALL_MS * 1e-3) / 1e9
    print(f"\nprogram: {PROGRAM_GB} GB / {PROGRAM_WALL_MS} ms = "
          f"{implied_gbps:.0f} GB/s")
    print(f"vs layout-matched stream ceiling ({s64:.0f} GB/s): "
          f"{implied_gbps/s64*100:.1f}%")
    print(f"vs full-lane f32 sustainable (708 GB/s): "
          f"{implied_gbps/708*100:.1f}%")
    _ = implied


if __name__ == "__main__":
    main()
