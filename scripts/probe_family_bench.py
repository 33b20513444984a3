"""Bench-scale numbers for the non-2d families (VERDICT r4 next #3/#4).

Measures, honest-timing (dispatch n, read ONE scalar, subtract RTT):
- HierarchicalCNN (1d) 5-fold vmapped inference at reference scale,
  A/B over 1d phase_pool () / (True,) / (True, True) — the probe gate for
  the 1d production default (the 2d study: block0-only wins, deeper loses);
- CNNBackbone resnet18 5-fold vmapped inference;
- APC and CPC train steps at bench shapes (B=64 x 10 s mel frames),
  VERDICT r4 weak #5: the 3-layer LSTM scan over ~430 frames is exactly
  the pattern that can be slow on TPU — measure it.

Usage: PYTHONPATH=/root/repo python scripts/probe_family_bench.py
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
N_CLASSES = 80
N_FOLDS = 5
B = 64
FEATURES = "mel_2048_1024_128"

_RTT = [0.035]


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf) if leaf.ndim else leaf)


def measure_rtt(probe):
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"scalar-readback RTT: {_RTT[0]*1e3:.1f} ms", flush=True)


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
    clips = B / ms * 1e3
    print(f"{label:46s} {ms:9.2f} ms   ({clips:7.1f} clips/s at B={B})"
          f"   (compile+1 {compile_s:5.1f}s)", flush=True)
    return ms


def stacked_folds(model, inputs, fl):
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    host = jax.device_get(variables)
    rng = np.random.RandomState(1)

    def perturb():
        return jax.tree.map(
            lambda leaf: (
                leaf + (0.01 * rng.randn(*leaf.shape)).astype(leaf.dtype)
                if np.issubdtype(leaf.dtype, np.floating) else leaf
            ), host)

    return jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[perturb() for _ in range(N_FOLDS)])


def main():
    from freesound_classification_tpu.models.backbone import CNNBackbone
    from freesound_classification_tpu.models.classifiers import (
        HierarchicalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.models.apc import APCModel
    from freesound_classification_tpu.models.cpc import CPCModel
    from freesound_classification_tpu.training.optimizers import (
        make_optimizer,
    )
    from freesound_classification_tpu.training.state import (
        create_train_state,
    )

    l = SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(B, l).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), l, jnp.int32)
    print(f"device={jax.devices()[0]}  B={B} x 10 s  {FEATURES}", flush=True)
    measure_rtt(lengths)

    # ---- hierarchical 1d: 5-fold inference, phase_pool A/B -------------
    fe1d = Frontend(FEATURES, "1d", sr=SR, use_pallas=True,
                    dft_precision="default")
    inputs1, fl1 = fe1d(wave, lengths)
    _force(inputs1)
    for pp in ((), (True,), (True, True)):
        model = HierarchicalCNN(
            num_conv_blocks=6, start_deep_supervision_on=2,
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=N_CLASSES, dtype=jnp.bfloat16, phase_pool=pp)
        sv = stacked_folds(model, inputs1, fl1)

        def infer(sv, w, ln, m=model):
            x, f = fe1d(w, ln)

            def one(v):
                return m.apply(v, x, f, train=False)["class_logits"]

            return jnp.mean(jax.nn.sigmoid(jax.vmap(one)(sv)), axis=0)

        timed(jax.jit(infer), sv, wave, lengths,
              label=f"hierarchical 5-fold infer phase_pool={pp}")

    # ---- backbone resnet18: 5-fold inference ---------------------------
    fe2d = Frontend(FEATURES, "2d", sr=SR, use_pallas=True,
                    dft_precision="default")
    inputs2, fl2 = fe2d(wave, lengths)
    _force(inputs2)
    bb = CNNBackbone(arch="resnet18", n_classes=N_CLASSES,
                     dtype=jnp.bfloat16)
    svb = stacked_folds(bb, inputs2, fl2)

    def infer_bb(sv, w, ln):
        x, f = fe2d(w, ln)

        def one(v):
            return bb.apply(v, x, f, train=False)["class_logits"]

        return jnp.mean(jax.nn.sigmoid(jax.vmap(one)(sv)), axis=0)

    timed(jax.jit(infer_bb), svb, wave, lengths,
          label="backbone resnet18 5-fold infer")

    # ---- SSL train steps ------------------------------------------------
    # reference-scale APC (apc.py:124 hot loop) / CPC (cpc.py:153); the
    # frontend runs in-step as in the engine. f32 as the engine trains SSL.
    for name, model, fam in (
            ("apc", APCModel(rnn_size=256, rnn_layers=3,
                             prediction_steps=3), "1d"),
            ("cpc", CPCModel(), "1d"),
    ):
        fe = fe1d
        x, f = fe(wave, lengths)
        tx = make_optimizer("adam", lambda s: 1e-3, 0.0)
        state = create_train_state(model, x, f, tx, seed=0)

        def train_step(state, w, ln, m=model):
            rng_, drop = jax.random.split(state.rng)
            xx, ff = fe(w, ln)

            def loss_of(params):
                out, mut = m.apply(
                    {"params": params,
                     "batch_stats": state.batch_stats},
                    xx, ff, mutable=["batch_stats"],
                    rngs={"dropout": drop}, train=True)
                return sum(out["loss_terms"]), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            state = state.apply_gradients(
                grads=grads, batch_stats=new_stats, rng=rng_)
            return state, loss

        step = jax.jit(train_step)
        t0 = time.time()
        state2, loss = step(state, wave, lengths)
        _force(loss)
        compile_s = time.time() - t0
        n = 10
        t0 = time.time()
        for _ in range(n):
            state2, loss = step(state, wave, lengths)
        _force(loss)
        ms = (time.time() - t0 - _RTT[0]) / n * 1e3
        print(f"{name + ' train step':46s} {ms:9.2f} ms   "
              f"({B / ms * 1e3:7.1f} clips/s at B={B})"
              f"   (compile+1 {compile_s:5.1f}s)", flush=True)


if __name__ == "__main__":
    main()
