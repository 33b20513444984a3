"""On-chip ablation of featurization + model forward cost.

Times (a) featurize variants (Pallas vs XLA tail, block-DFT precision),
(b) model forward at increasing depth, (c) train=True vs eval forward —
to locate the gap between the measured step time and the MXU speed of
light. Run on the real chip.

Timing methodology: over the axon tunnel ``jax.block_until_ready`` returns
without waiting — each measurement dispatches N iterations and forces
completion with ONE scalar readback, subtracting the measured round trip
(see CLAUDE.md).

Usage: PYTHONPATH=/root/repo python profile_model.py
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

_RTT = [0.03]


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf) if leaf.ndim else leaf)


def measure_rtt() -> None:
    probe = jnp.zeros((8,), jnp.int32)
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
    print(f"{label:44s} {ms:9.2f} ms   (compile+1 {compile_s:5.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.ops import dsp

    b, l = 64, SR * 10
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)

    # ---- featurize variants -------------------------------------------
    fb = jnp.asarray(dsp.make_mel_filterbanks("mel_2048_1024_128"))
    fb_t = fb.T

    timed(jax.jit(lambda x: dsp.log_mel_spectrogram(x, fb, 2048, 1024,
                                                    use_pallas=True)),
          wave, label="log_mel pallas (block-DFT high)")
    timed(jax.jit(lambda x: dsp.log_mel_spectrogram(x, fb, 2048, 1024,
                                                    use_pallas=False)),
          wave, label="log_mel xla (block-DFT high)")

    def dft_only(x):
        re, im = dsp.stft_spectrum_dft(x, 2048, 1024)
        return re + im

    timed(jax.jit(dft_only), wave, label="stft_spectrum_dft (high)")

    def dft_default(x):
        import functools
        from freesound_classification_tpu.ops.dsp import (
            _dft_basis, num_stft_frames)
        n_fft, hop = 2048, 1024
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = num_stft_frames(x.shape[-1], n_fft, hop)
        m = n_fft // hop
        total = xp.shape[-1]
        n_blocks = -(-total // hop)
        if n_blocks * hop > total:
            xp = jnp.pad(xp, ((0, 0), (0, n_blocks * hop - total)))
        if n_blocks < n_frames + m - 1:
            xp = jnp.pad(
                xp, ((0, 0), (0, (n_frames + m - 1 - n_blocks) * hop)))
            n_blocks = n_frames + m - 1
        blocks = xp.reshape(*xp.shape[:-1], n_blocks, hop)
        cos_b, sin_b = _dft_basis(n_fft, hop)
        re = im = None
        for o in range(m):
            view = blocks[..., o : o + n_frames, :]
            c = jnp.einsum("...th,hf->...tf", view, jnp.asarray(cos_b[o]))
            s = jnp.einsum("...th,hf->...tf", view, jnp.asarray(sin_b[o]))
            re = c if re is None else re + c
            im = s if im is None else im + s
        return re + im

    timed(jax.jit(dft_default), wave, label="stft_spectrum_dft (default prec)")

    def rfft_mag(x):
        frames = dsp.frame_signal(x, 2048, 1024)
        frames = frames * dsp.hann_window(2048, dtype=frames.dtype)
        spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        return jnp.abs(spec)

    timed(jax.jit(rfft_mag), wave, label="frame+rfft magnitude")

    # ---- model depth ablation -----------------------------------------
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR,
                    use_pallas=True, dft_precision="default")
    inputs, fl = frontend(wave, lengths)
    jax.block_until_ready(inputs)
    print(f"inputs {inputs.shape}", flush=True)

    for depth in (1, 2, 3, 4, 5, 6):
        model = TwoDimensionalCNN(
            num_conv_blocks=depth,
            start_deep_supervision_on=min(2, depth - 1),
            conv_base_depth=64, growth_rate=1.5, aggregation_type="max",
            n_classes=N_CLASSES, dtype=jnp.bfloat16)
        variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                               train=False)
        fwd = jax.jit(lambda v, x, f, m=model: m.apply(v, x, f, train=False))
        timed(fwd, variables, inputs, fl, n=10, label=f"forward depth={depth}")

    # train-mode forward (BN batch stats) at full depth
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)

    def fwd_train(v, x, f):
        out, mut = model.apply(
            v, x, f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return out["class_logits"]

    timed(jax.jit(fwd_train), variables, inputs, fl, n=10,
          label="forward train=True depth=6")

    # f32 model for comparison
    model32 = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.float32)
    v32 = model32.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                       train=False)
    timed(jax.jit(lambda v, x, f: model32.apply(v, x, f, train=False)),
          v32, inputs, fl, n=10, label="forward f32 depth=6")

    # fused-inference blocks (ops/pallas_resnet.py, eval only)
    model_fused = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=N_CLASSES,
        dtype=jnp.bfloat16, fused_infer=True)
    timed(jax.jit(lambda v, x, f: model_fused.apply(v, x, f, train=False)),
          variables, inputs, fl, n=10, label="forward fused blocks depth=6")

    # rnn (biGRU) aggregation — round-1 VERDICT weak #7: every published
    # number used aggregation_type="max"; the reference's rnn mode scans
    # ~2.5k frames/block and was never measured on hardware
    model_rnn = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="rnn", n_classes=N_CLASSES,
        dtype=jnp.bfloat16)
    v_rnn = model_rnn.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    timed(jax.jit(lambda v, x, f: model_rnn.apply(v, x, f, train=False)),
          v_rnn, inputs, fl, n=10, label="forward rnn-agg depth=6")

    def fwd_train_rnn(v, x, f):
        out, _ = model_rnn.apply(
            v, x, f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return out["class_logits"]

    timed(jax.jit(fwd_train_rnn), v_rnn, inputs, fl, n=10,
          label="forward train=True rnn-agg depth=6")


if __name__ == "__main__":
    main()
