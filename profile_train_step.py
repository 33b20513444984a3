"""On-chip breakdown of the augmented train step (VERDICT round-1 item #3).

Times each pipeline stage at the canonical training shape (B=64, 10 s clips
@ 44.1 kHz, mel_2048_1024_128, reference-scale 2d CNN).

Measurement methodology (IMPORTANT): over the axon TPU tunnel,
``jax.block_until_ready`` returns without waiting for execution — only a
value readback forces completion. Every timing here therefore dispatches N
iterations and then reads ONE scalar back, subtracting the separately
measured readback round-trip (~35 ms) and dividing by N.

Usage: PYTHONPATH=/root/repo python profile_train_step.py [--batch 64]
"""

from __future__ import annotations

import argparse
import functools
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

_RTT = [0.035]


def measure_rtt(probe) -> float:
    """Median scalar-readback round trip (seconds)."""
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    rtt = float(np.median(vals))
    _RTT[0] = rtt
    print(f"scalar-readback RTT: {rtt*1e3:.1f} ms", flush=True)
    return rtt


def _force(out) -> float:
    """Force completion of everything enqueued by reading one scalar."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf) if leaf.ndim else leaf)


def timed(fn, *args, n=20, label=""):
    t0 = time.time()
    out = fn(*args)
    _force(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    print(f"{label:34s} {ms:9.2f} ms   (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.ops import augment
    from freesound_classification_tpu.ops.freeverb import reverb_batch
    from freesound_classification_tpu.ops.losses import make_loss
    from freesound_classification_tpu.ops.pv import phase_vocoder_stretch
    from freesound_classification_tpu.training.optimizers import make_optimizer
    from freesound_classification_tpu.training.state import create_train_state

    b, l = args.batch, SR * SECONDS
    dev = jax.devices()[0]
    print(f"device={dev}  batch={b}  clip={SECONDS}s  features={FEATURES}",
          flush=True)

    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    labels = jnp.asarray((rng.rand(b, N_CLASSES) < 0.05).astype(np.float32))
    key = jax.random.PRNGKey(0)
    measure_rtt(lengths)

    frontend = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16)

    inputs, fl = frontend(wave, lengths)
    _force(inputs)

    n = args.n
    # ---- augmentation components --------------------------------------
    timed(jax.jit(lambda w, ln, k: augment.shuffle_chunks(w, ln, k, 1.0)),
          wave, lengths, key, n=n, label="shuffle_chunks")
    timed(jax.jit(lambda w, ln, y, k: augment.mixup_or(w, ln, y, k, 1.0)),
          wave, lengths, labels, key, n=n, label="mixup_or")
    rev = jnp.full((b,), 40.0)
    room = jnp.full((b,), 40.0)
    timed(jax.jit(lambda w, ln: reverb_batch(w, ln, rev, room, SR)),
          wave, lengths, n=n, label="freeverb reverb_batch")
    rate = jnp.linspace(0.85, 1.18, b)
    timed(jax.jit(functools.partial(
        phase_vocoder_stretch, n_fft=1024, hop=256)),
        wave, lengths, rate, n=n, label="phase_vocoder_stretch")
    timed(jax.jit(lambda w, ln, f: augment.resample_rate(w, ln, f)),
          wave, lengths, rate, n=n, label="resample_rate (pallas)")
    timed(jax.jit(lambda w, ln, k: augment.effects_chain(w, ln, k, 1.0)),
          wave, lengths, key, n=n, label="effects_chain (all)")

    cfg = augment.AugmentConfig(p_mixup=0.5, p_aug=0.75, p_shuffle=0.5)
    augmenter = augment.make_augmenter(cfg)
    timed(jax.jit(lambda w, ln, y, k: augmenter(w, ln, y, k, 1.0)),
          wave, lengths, labels, key, n=n, label="full augmenter")

    # ---- featurize + model --------------------------------------------
    timed(jax.jit(frontend), wave, lengths, n=n, label="frontend featurize")

    tx = make_optimizer("adam", lambda s: 1e-3, 0.0)
    state = create_train_state(model, inputs, fl, tx, seed=0)
    loss_fn = make_loss("lsep")

    fwd = jax.jit(lambda s, x, f: model.apply(
        {"params": s.params, "batch_stats": s.batch_stats}, x, f,
        train=False))
    timed(fwd, state, inputs, fl, n=n, label="forward (eval)")

    def make_train_step(use_augment):
        def train_step(state, w, ln, y):
            rng_, step_rng, drop = jax.random.split(state.rng, 3)
            if use_augment:
                w, ln, y = augmenter(w, ln, y, step_rng, 1.0)
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

        return train_step

    step_noaug = jax.jit(make_train_step(False), donate_argnums=(0,))
    step_aug = jax.jit(make_train_step(True), donate_argnums=(0,))

    def timed_step(step, state, label):
        # flops from XLA cost analysis (each MAC counts 2); traffic via the
        # repo's single utilization semantics — post-fusion top-level HLO
        # traffic (utils/hlo_traffic.py, the floor-probe measure), NOT
        # XLA "bytes accessed" which upper-bounds by counting
        # fusion-internal reads. v5e-1 peaks: 197 TFLOP/s bf16 MXU,
        # 819 GB/s HBM (708 sustainable, scripts/probe_stream_bw.py).
        from freesound_classification_tpu.utils.hlo_traffic import (
            compiled_traffic_bytes,
        )
        try:
            compiled = step.lower(state, wave, lengths, labels).compile()
            ca = compiled.cost_analysis()
            flops = float(ca.get("flops", 0.0))
            bts = float(compiled_traffic_bytes(compiled))
        except Exception:
            flops = bts = 0.0
        t0 = time.time()
        state, loss = step(state, wave, lengths, labels)
        _force(loss)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            state, loss = step(state, wave, lengths, labels)
        _force(loss)
        ms = (time.time() - t0 - _RTT[0]) / n * 1e3
        util = ""
        if flops > 0 and ms > 0:
            mfu = flops / (ms * 1e-3) / 197e12
            gbps = bts / (ms * 1e-3) / 1e9
            util = f"   mfu={mfu:.3f}  hbm={gbps:.0f} GB/s (post-fusion)"
        print(f"{label:34s} {ms:9.2f} ms   (compile+1 {compile_s:5.1f}s)"
              f"{util}", flush=True)
        return state

    state = timed_step(step_noaug, state, "train step (no aug)")
    state = timed_step(step_aug, state, "train step (full aug)")


if __name__ == "__main__":
    main()
