"""Profile the bench 5-fold inference program on hardware: where do the
45.6 ms go? Captures a jax.profiler trace of the production (plain-flax,
fused_infer=False) infer_5fold program at the model-A/B shape (B=64, 10 s)
and prints the top device ops by total duration.

The round-5 question: forward eval is ~12% MXU by FLOP count (~390
GFLOP/batch vs 8.5 ms measured), so either XLA's conv lowering stalls or
the step is HBM-bound (block0's outer conv materializes a 452 MB pre-pool
activation the 2x2 maxpool immediately decimates). The trace decides which
lever matters: fused conv+pool front kernel vs conv-layout work.

Usage: PYTHONPATH=/root/repo python scripts/probe_infer_profile.py
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
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
N_CLASSES = 80
N_FOLDS = 5
FEATURES = "mel_2048_1024_128"
TRACE_DIR = "/tmp/infer_trace"


def main():
    b, l = 64, SR * 10
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16, fused_infer=False)
    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    host_vars = jax.device_get(variables)
    folds = [jax.tree.map(
        lambda leaf: (leaf + (0.01 * np.random.RandomState(i).randn(
            *leaf.shape)).astype(leaf.dtype)
            if np.issubdtype(leaf.dtype, np.floating) else leaf),
        host_vars) for i in range(N_FOLDS)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *folds)

    @jax.jit
    def infer_5fold(wave, lengths):
        x, f = frontend(wave, lengths)

        def one_fold(v):
            return model.apply(v, x, f, train=False)["class_logits"]

        logits = jax.vmap(one_fold)(stacked)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    out = infer_5fold(wave, lengths)
    float(jnp.sum(out))
    print("compiled; tracing...", flush=True)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = infer_5fold(wave, lengths)
        float(jnp.sum(out))

    # parse the perfetto trace: sum device-track event durations by op name
    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("NO TRACE FILES — device tracing unsupported over tunnel?")
        for p in glob.glob(os.path.join(TRACE_DIR, "**", "*"),
                           recursive=True):
            print("  ", p)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device process ids (TPU tracks)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "tpu" in name or "/device" in name}
    print("processes:", sorted(pid_names.items())[:20])
    by_op = collections.Counter()
    count = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[name] += dur
        count[name] += 1
        total += dur
    print(f"\ndevice total {total:.2f} ms over 3 iters "
          f"({total/3:.2f} ms/iter)")
    print(f"{'op':68s} {'ms/iter':>8s} {'n':>5s}")
    for name, ms in by_op.most_common(45):
        print(f"{name[:68]:68s} {ms/3:8.3f} {count[name]:5d}")


if __name__ == "__main__":
    main()
