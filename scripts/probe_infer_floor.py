"""HBM-traffic / MXU utilization analysis of the 5-fold inference program
(the bench.py headline path), using probe_traffic_floor's post-fusion
entry-traffic walk.

Answers: is the 106x-baseline inference number near a hardware roofline
(bandwidth or MXU), or is generic headroom left on the table?

Usage: PYTHONPATH=/root/repo python scripts/probe_infer_floor.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from freesound_classification_tpu.utils.hlo_traffic import (  # noqa: E402
    entry_traffic,
)

SR = 44100
SECONDS = 10
N_CLASSES = 80
N_FOLDS = 5
PEAK_GBPS = 819.0
SUSTAINED_GBPS = 708.0  # probe_stream_bw.py (full-lane f32 streams)
# what a pure y=a*x stream achieves at the program's OWN dominant shape
# (fold-merged rank-5 bf16, C=64-minor half-lane tiles) — the honest
# apples-to-apples ceiling for this program (probe_infer_closure.py)
LAYOUT_GBPS = 517.0
PEAK_BF16 = 197e12


def main():
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    b, l = 64, SR * SECONDS
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)

    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16,
        # production inference lowering (scripts/probe_phase_pool.py)
        phase_pool=(True,))
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    stacked = jax.tree.map(
        lambda x: jnp.stack([x] * N_FOLDS), variables)

    # stacked params are an explicit argument (never close a jit over big
    # device arrays — they embed as MLIR consts and compiles crawl,
    # CLAUDE.md; the r3 version of this probe paid ~45 min of compile
    # for exactly that)
    def predict(sv, wave, lengths):
        x, f = frontend(wave, lengths)

        def one_fold(v):
            return model.apply(v, x, f, train=False)["class_logits"]

        logits = jax.vmap(one_fold)(sv)
        return jnp.mean(jax.nn.sigmoid(logits), axis=0)

    fn = jax.jit(predict)
    compiled = fn.lower(stacked, wave, lengths).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    ca_bytes = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))
    top_bytes, offenders, by_op = entry_traffic(hlo)

    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    rtt = float(np.median(vals))
    out = fn(stacked, wave, lengths)
    float(jnp.sum(out))
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fn(stacked, wave, lengths)
    float(jnp.sum(out))
    wall_ms = (time.time() - t0 - rtt) / n * 1e3

    gbps = top_bytes / (wall_ms * 1e6)
    print(f"wall (5-fold predict, B=64 x 10 s): {wall_ms:8.2f} ms")
    print(f"cost-analysis bytes (UB)   : {ca_bytes/1e9:8.2f} GB "
          f"-> {ca_bytes/(wall_ms*1e6):6.0f} GB/s")
    print(f"post-fusion entry traffic  : {top_bytes/1e9:8.2f} GB "
          f"-> {gbps:6.0f} GB/s = {gbps/SUSTAINED_GBPS*100:5.1f}% of "
          f"sustainable ({gbps/PEAK_GBPS*100:5.1f}% of peak)")
    print(f"vs layout-matched ceiling  : {gbps/LAYOUT_GBPS*100:5.1f}% "
          f"of {LAYOUT_GBPS:.0f} GB/s (C=64-minor bf16 stream, "
          f"probe_infer_closure.py)")
    print(f"mfu (bf16 peak)            : "
          f"{flops/(wall_ms*1e-3)/PEAK_BF16:8.3f}")
    print("\ntraffic by op type:")
    for op, byts in sorted(by_op.items(), key=lambda t: -t[1])[:10]:
        print(f"  {byts/1e6:9.1f} MB  {op}")
    print("\ntop traffic instructions (out+operands):")
    for byts, desc in offenders[:10]:
        print(f"  {byts/1e6:9.1f} MB  {desc}")


if __name__ == "__main__":
    main()
