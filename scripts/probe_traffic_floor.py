"""HBM-traffic floor analysis of the no-aug train step (VERDICT r2 #6).

Question: is the remaining ~46 ms no-aug train step near its memory floor,
or is the ROADMAP #1 "~3x headroom" still harvestable?

Three numbers, tightest to loosest:

1. ``bytes accessed`` from XLA's cost analysis — an UPPER bound on traffic
   (it counts fusion-internal reads/writes that never leave VMEM).
2. **Post-fusion top-level traffic** (this probe's contribution): walk the
   optimized HLO entry computation and sum, for every non-free instruction,
   its output buffer bytes plus its operand buffer bytes. After fusion,
   each top-level instruction is one kernel launch whose operands/results
   live in HBM, so this approximates the traffic the program REALLY pays
   (it still over-counts operands that stay resident in VMEM across
   consumers, and under-counts DMA inefficiency/padding).
3. An analytic floor: parameters + optimizer state (read+write once) plus
   conv/dot activations (each conv reads input + writes output in fwd,
   and the bwd reads/writes the same buffers twice more for dgrad/wgrad)
   assuming every elementwise/BN/PReLU op fuses for free.

achieved GB/s = (2) / wall.  If that lands at >= ~80% of the 819 GB/s v5e
peak, the step is executing at the hardware's sustainable bandwidth and
the only remaining lever is algorithmic traffic reduction, closing
ROADMAP #1 with a floor proof instead of a fused train kernel.

Usage: PYTHONPATH=/root/repo python scripts/probe_traffic_floor.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SR = 44100
SECONDS = 10
N_CLASSES = 80
FEATURES = "mel_2048_1024_128"
PEAK_GBPS = 819.0

from freesound_classification_tpu.utils.hlo_traffic import (  # noqa: E402
    entry_traffic,
)


def main():
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.ops.losses import make_loss
    from freesound_classification_tpu.training.optimizers import (
        make_optimizer,
    )
    from freesound_classification_tpu.training.state import create_train_state

    b, l = 64, SR * SECONDS
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    labels = jnp.asarray((rng.rand(b, N_CLASSES) < 0.05).astype(np.float32))

    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16)
    inputs, fl = frontend(wave, lengths)
    tx = make_optimizer("adam", lambda s: 1e-3, 0.0)
    state = create_train_state(model, inputs, fl, tx, seed=0)
    loss_fn = make_loss("lsep")

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

    step = jax.jit(train_step, donate_argnums=(0,))
    compiled = step.lower(state, wave, lengths, labels).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    ca_bytes = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))

    top_bytes, offenders, by_op = entry_traffic(hlo)

    # analytic floor: params/opt-state once, conv activations 3x (fwd,
    # dgrad, wgrad) in bf16, inputs once
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    opt_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(state.opt_state))
    param_bytes = n_params * 4

    # timed run (scalar-readback methodology, CLAUDE.md)
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    rtt = float(np.median(vals))
    state2, loss = step(state, wave, lengths, labels)
    float(loss)
    n = 20
    t0 = time.time()
    s = state2
    for _ in range(n):
        s, loss = step(s, wave, lengths, labels)
    float(loss)
    wall_ms = (time.time() - t0 - rtt) / n * 1e3

    print(f"wall (no-aug step)         : {wall_ms:8.2f} ms")
    print(f"cost-analysis bytes (UB)   : {ca_bytes/1e9:8.2f} GB "
          f"-> {ca_bytes/(wall_ms*1e6):6.0f} GB/s")
    print(f"post-fusion entry traffic  : {top_bytes/1e9:8.2f} GB "
          f"-> {top_bytes/(wall_ms*1e6):6.0f} GB/s "
          f"= {top_bytes/(wall_ms*1e6)/PEAK_GBPS*100:5.1f}% of 819 peak")
    print(f"mfu                        : "
          f"{flops/(wall_ms*1e-3)/197e12:8.3f}")
    print(f"params {param_bytes/1e6:.0f} MB f32, opt state "
          f"{opt_bytes/1e6:.0f} MB")
    print("\ntraffic by op type:")
    for op, byts in sorted(by_op.items(), key=lambda t: -t[1])[:12]:
        print(f"  {byts/1e6:9.1f} MB  {op}")
    print("\ntop traffic instructions (out+operands):")
    for byts, desc in offenders:
        print(f"  {byts/1e6:9.1f} MB  {desc}")


if __name__ == "__main__":
    main()
