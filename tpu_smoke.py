"""Real-hardware smoke test: run before every end-of-round commit.

Exercises the paths that CPU-interpret tests structurally cannot validate
(round-1 shipped a HEAD that failed UNIMPLEMENTED on the chip while the
whole suite was green): the Pallas mel kernel fed from the block-DFT
producer at bench shapes, the Pallas resample kernel, a jitted flagship
forward, and a device_get that forces materialization.

Usage:  python tpu_smoke.py            (~2-3 min, mostly compiles)
Exit 0 = safe to ship; any exception = the chip rejects HEAD.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same as bench.py): re-runs skip the ~6 min of
# XLA compiles that otherwise dominate the smoke's wall time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> int:
    t0 = time.time()
    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"SMOKE: refusing to run on {dev.platform} — need the real chip")
        return 2
    print(f"SMOKE: device={dev}")

    from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
    from freesound_classification_tpu.models.frontend import Frontend
    from freesound_classification_tpu.ops import pallas_kernels

    # 1. Pallas mel kernel from the block-DFT producer at the bench shape
    frontend = Frontend("mel_2048_1024_128", "2d", sr=44100, use_pallas=True)
    wave = jnp.asarray(
        np.random.RandomState(0).randn(4, 65536).astype(np.float32) * 0.1)
    lengths = jnp.full((4,), 65536, jnp.int32)
    feats, fl = frontend(wave, lengths)
    np.asarray(feats)  # force execution on chip
    assert np.isfinite(np.asarray(feats)).all(), "non-finite log-mel"
    print(f"SMOKE: pallas mel ok {feats.shape}  [{time.time()-t0:.0f}s]")

    # 1b. Single-bf16-pass block-DFT (the bf16-model production path,
    # dft_precision="default") vs the 3-pass oracle — a hardware-only
    # difference (precision is a no-op on CPU), so gate it here
    fe_fast = Frontend("mel_2048_1024_128", "2d", sr=44100, use_pallas=True,
                       dft_precision="default")
    feats_fast, _ = fe_fast(wave, lengths)
    a1 = np.asarray(feats, np.float32).ravel()
    a2 = np.asarray(feats_fast, np.float32).ravel()
    assert np.isfinite(a2).all(), "non-finite fast-DFT log-mel"
    corr_dft = float(np.corrcoef(a1, a2)[0, 1])
    assert corr_dft > 0.999, f"fast-DFT logmel corr {corr_dft} vs oracle"
    print(f"SMOKE: single-pass DFT ok (corr {corr_dft:.5f})  "
          f"[{time.time()-t0:.0f}s]")

    # 2. Flagship model init + jit forward + device_get (bench init path)
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=80,
        dtype=jnp.bfloat16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, feats, fl,
                           train=False)
    host_vars = jax.device_get(variables)  # round-1 failure surfaced here
    n_leaves = len(jax.tree.leaves(host_vars))
    fwd = jax.jit(lambda v, x, l: model.apply(v, x, l, train=False))
    out = fwd(variables, feats, fl)
    logits = np.asarray(out["class_logits"])
    assert logits.shape == (4, 80) and np.isfinite(logits).all()
    print(f"SMOKE: forward ok, {n_leaves} param leaves  [{time.time()-t0:.0f}s]")

    # 3. Pallas resample kernel on chip
    res = pallas_kernels.resample_linear_pallas(
        wave, jnp.asarray([0.9, 1.0, 1.1, 1.3], jnp.float32))
    r = np.asarray(res)
    assert r.shape == wave.shape and np.isfinite(r).all()
    # factor 1.0 row must reproduce the input (linear interp at integers);
    # the kernel's MXU dot is bf16-rounded -> ~1e-3 abs at 0.1-scale input
    np.testing.assert_allclose(r[1], np.asarray(wave)[1], atol=3e-3)
    print(f"SMOKE: pallas resample ok  [{time.time()-t0:.0f}s]")

    # 4. Full augmented train-step program (the training hot path) on chip.
    # p_aug=0.75 exercises the PRODUCTION fixed-count compaction: row
    # gather -> Pallas kernels on the k=3 sub-batch -> row scatter (the
    # masked full-B kernel path is covered by sections 3/5 and 4b).
    from freesound_classification_tpu.ops import augment

    key = jax.random.PRNGKey(1)
    cfg = augment.AugmentConfig(p_mixup=1.0, p_aug=0.75, p_shuffle=1.0)
    augmenter = augment.make_augmenter(cfg)
    aug = jax.jit(lambda w, ln, y, k: augmenter(w, ln, y, k, 1.0))
    aug_w, _, _ = aug(wave, lengths, jnp.zeros((4, 80)), key)
    a = np.asarray(aug_w)
    assert np.isfinite(a).all(), "non-finite augmented audio"
    print(f"SMOKE: augment chain ok (fixed-count k=3/4)  "
          f"[{time.time()-t0:.0f}s]")

    # 4b. Fold-vmapped augmenter (the multifold train path). JAX's automatic
    # pallas batching breaks on the kernels' 1-D SMEM operands under Mosaic;
    # the wrappers carry custom_vmap rules (ops/pallas_kernels.py) whose
    # LOWERING only this hardware run can validate — CPU interpret mode was
    # green while the chip raised "block shape ... divisible by 8 and 128".
    wave2 = wave.reshape(2, 2, -1)
    len2 = lengths.reshape(2, 2)
    lab2 = jnp.zeros((2, 2, 80))
    keys2 = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    vaug = jax.jit(jax.vmap(lambda w, ln, y, k: augmenter(w, ln, y, k, 1.0)))
    vw, _, _ = vaug(wave2, len2, lab2, keys2)
    assert np.isfinite(np.asarray(vw)).all(), "non-finite vmapped augment"
    print(f"SMOKE: fold-vmapped augment ok  [{time.time()-t0:.0f}s]")

    # 5. Fused PV resynthesis numerics on HARDWARE vs the XLA middle
    # (interpret-mode CPU tests cannot catch Mosaic-lowering numeric bugs)
    import functools

    from freesound_classification_tpu.ops import pallas_kernels as pk
    from freesound_classification_tpu.ops import pv

    t = np.arange(65536) / 44100.0
    tone = jnp.asarray(np.stack([
        np.sin(2 * np.pi * 440.0 * t),
        np.sin(2 * np.pi * 220.0 * t) + 0.3 * np.sin(2 * np.pi * 900.0 * t),
    ]).astype(np.float32))
    tl = jnp.full((2,), 65536, jnp.int32)
    rates = jnp.asarray([0.9, 1.12], jnp.float32)
    stretch = functools.partial(pv.phase_vocoder_stretch, n_fft=1024,
                                hop=256)
    out_k, len_k = jax.jit(stretch)(tone, tl, rates)  # kernel path (on TPU)
    out_k, len_k = np.asarray(out_k), np.asarray(len_k)
    orig_on_tpu = pk._on_tpu
    pk._on_tpu = lambda: False  # force the XLA middle, still on the chip
    # phase_vocoder_stretch is itself @jax.jit-cached: without clearing, the
    # kernel-path jaxpr traced above is reused verbatim and this gate would
    # compare a program against itself (round-1 ADVICE finding).
    jax.clear_caches()
    try:
        out_x, len_x = jax.jit(lambda w, ln, r: stretch(w, ln, r))(
            tone, tl, rates)
        out_x, len_x = np.asarray(out_x), np.asarray(len_x)
    finally:
        pk._on_tpu = orig_on_tpu
        jax.clear_caches()  # don't leak XLA-middle traces to later sections
    # prove the retrace actually happened: the kernel and XLA middles are
    # different numerics (bf16 interp vs fused carry) and never bit-match
    assert float(np.max(np.abs(out_k - out_x))) > 0.0, (
        "PV gate is vacuous: kernel and XLA outputs are bit-identical, the "
        "XLA middle never retraced")
    assert (len_k == len_x).all()
    for i in range(2):
        n = int(len_k[i])
        a = out_k[i, : n - 2048]
        c = out_x[i, : n - 2048]
        corr = float(np.corrcoef(a, c)[0, 1])
        assert corr > 0.98, f"PV kernel-vs-XLA corr {corr} at row {i}"
    print(f"SMOKE: pv fused-kernel numerics ok  [{time.time()-t0:.0f}s]")

    # 6. Perf tripwire: the augmenter at B=4 x 65536 must stay far under a
    # loose bound (catches catastrophic kernel regressions — e.g. an
    # accidental element-gather formulation is ~100x — while surviving the
    # ~±10% compile-luck variance). Honest timing: block_until_ready does
    # NOT wait over the axon tunnel; force with a scalar readback.
    # Re-warm first: section 5's clear_caches evicted the compiled chain,
    # and a recompile inside the timed loop reads as a 10x regression.
    aug_w, _, _ = aug(wave, lengths, jnp.zeros((4, 80)), key)
    float(jnp.sum(aug_w))
    n = 10
    t1 = time.time()
    for _ in range(n):
        aug_w, _, _ = aug(wave, lengths, jnp.zeros((4, 80)), key)
    float(jnp.sum(aug_w))
    ms = (time.time() - t1) / n * 1e3
    assert ms < 150.0, f"augmenter {ms:.1f} ms at B=4x65536 — kernel regression?"
    print(f"SMOKE: augmenter {ms:.1f} ms/call at B=4 (bound 150)  "
          f"[{time.time()-t0:.0f}s]")

    # 7. biGRU aggregation path (round-1 VERDICT weak #7: the rnn mode was
    # perf-unmeasured on hardware). Finite logits + a loose per-call bound
    # at B=4 x 65536 (the lax.scan over ~2.5k frames is the risk).
    model_rnn = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="rnn", n_classes=80,
        dtype=jnp.bfloat16)
    v_rnn = model_rnn.init({"params": jax.random.PRNGKey(2)}, feats, fl,
                           train=False)
    fwd_rnn = jax.jit(lambda v, x, l: model_rnn.apply(v, x, l, train=False))
    out_rnn = fwd_rnn(v_rnn, feats, fl)
    logits_rnn = np.asarray(out_rnn["class_logits"])
    assert np.isfinite(logits_rnn).all(), "non-finite rnn-agg logits"
    t1 = time.time()
    for _ in range(n):
        out_rnn = fwd_rnn(v_rnn, feats, fl)
    float(jnp.sum(out_rnn["class_logits"]))
    ms = (time.time() - t1) / n * 1e3
    assert ms < 400.0, f"rnn-agg forward {ms:.1f} ms at B=4 — scan blowup?"
    print(f"SMOKE: rnn-agg forward {ms:.1f} ms/call at B=4 (bound 400)  "
          f"[{time.time()-t0:.0f}s]")

    # 7b. APC grad step tripwire (VERDICT r4 #4): the 3-layer LSTM scan
    # over the frame axis is the one sequential-scan risk in the repo.
    # Bench-scale verdict (scripts/probe_family_bench.py, r5): 17.5 ms
    # full train step at B=64 x 431 frames — NOT a bottleneck. This keeps
    # a loose fwd+bwd bound at B=4 so a scan-lowering regression trips.
    from freesound_classification_tpu.models.apc import APCModel

    fe1d = Frontend("mel_2048_1024_128", "1d", sr=44100, use_pallas=True)
    f1, fl1 = fe1d(wave, lengths)
    apc = APCModel(rnn_size=256, rnn_layers=3, prediction_steps=3)
    v_apc = apc.init({"params": jax.random.PRNGKey(4)}, f1, fl1,
                     train=False)

    def apc_loss(params, x, l):
        out = apc.apply({"params": params["params"]}, x, l, train=False)
        return sum(out["loss_terms"])

    apc_grad = jax.jit(jax.grad(lambda v, x, l: apc_loss(v, x, l)))
    g = apc_grad(v_apc, f1, fl1)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g)), "non-finite APC grads"
    t1 = time.time()
    for _ in range(n):
        g = apc_grad(v_apc, f1, fl1)
    float(jnp.sum(jax.tree.leaves(g)[0]))
    ms = (time.time() - t1) / n * 1e3
    assert ms < 300.0, f"APC fwd+bwd {ms:.1f} ms at B=4 — LSTM scan blowup?"
    print(f"SMOKE: apc fwd+bwd {ms:.1f} ms/call at B=4 (bound 300)  "
          f"[{time.time()-t0:.0f}s]")

    # 8. Fused inference resnet block vs the unfused flax block on chip
    # (Mosaic numerics gate, same rationale as the PV gate above)
    from freesound_classification_tpu.models.blocks import ResnetBlock2d

    rngx = np.random.RandomState(3)
    xblk = jnp.asarray(rngx.randn(4, 64, 215, 64).astype(np.float32) * 0.5
                       ).astype(jnp.bfloat16)
    blk = ResnetBlock2d(64, jnp.bfloat16)
    vblk = blk.init({"params": jax.random.PRNGKey(3)}, xblk, train=False)
    blk_fused = ResnetBlock2d(64, jnp.bfloat16, fused_infer=True)
    ref_b = np.asarray(jax.jit(
        lambda v, x: blk.apply(v, x, train=False))(vblk, xblk),
        dtype=np.float32)
    out_b = np.asarray(jax.jit(
        lambda v, x: blk_fused.apply(v, x, train=False))(vblk, xblk),
        dtype=np.float32)
    corr_b = float(np.corrcoef(ref_b.ravel(), out_b.ravel())[0, 1])
    assert corr_b > 0.999, f"fused resnet block corr {corr_b} vs flax"
    print(f"SMOKE: fused resnet block ok (corr {corr_b:.5f})  "
          f"[{time.time()-t0:.0f}s]")

    # 8b. Fused 1d resnet block (lane-roll taps, ops/pallas_resnet1d.py)
    # vs the unfused flax block on chip — same Mosaic numerics rationale
    from freesound_classification_tpu.models.blocks import ResnetBlock1d

    x1d = jnp.asarray(rngx.randn(4, 430, 64).astype(np.float32) * 0.5
                      ).astype(jnp.bfloat16)
    blk1 = ResnetBlock1d(64, jnp.bfloat16)
    vblk1 = blk1.init({"params": jax.random.PRNGKey(4)}, x1d, train=False)
    blk1_fused = ResnetBlock1d(64, jnp.bfloat16, fused_infer=True)
    ref_1 = np.asarray(jax.jit(
        lambda v, x: blk1.apply(v, x, train=False))(vblk1, x1d),
        dtype=np.float32)
    out_1 = np.asarray(jax.jit(
        lambda v, x: blk1_fused.apply(v, x, train=False))(vblk1, x1d),
        dtype=np.float32)
    corr_1 = float(np.corrcoef(ref_1.ravel(), out_1.ravel())[0, 1])
    assert corr_1 > 0.999, f"fused 1d resnet block corr {corr_1} vs flax"
    print(f"SMOKE: fused 1d resnet block ok (corr {corr_1:.5f})  "
          f"[{time.time()-t0:.0f}s]")

    # 8c. Fused backbone BasicBlock (two-ring pipeline,
    # ops/pallas_backbone.py) vs the unfused flax block on chip
    from freesound_classification_tpu.models.backbone import BasicBlock

    xbb = jnp.asarray(rngx.randn(4, 32, 108, 64).astype(np.float32) * 0.5
                      ).astype(jnp.bfloat16)
    bbk = BasicBlock(64, dtype=jnp.bfloat16)
    vbb = bbk.init({"params": jax.random.PRNGKey(5)}, xbb, train=False)
    bbk_fused = BasicBlock(64, dtype=jnp.bfloat16, fused_infer=True)
    ref_bb = np.asarray(jax.jit(
        lambda v, x: bbk.apply(v, x, train=False))(vbb, xbb),
        dtype=np.float32)
    out_bb = np.asarray(jax.jit(
        lambda v, x: bbk_fused.apply(v, x, train=False))(vbb, xbb),
        dtype=np.float32)
    corr_bb = float(np.corrcoef(ref_bb.ravel(), out_bb.ravel())[0, 1])
    assert corr_bb > 0.999, f"fused BasicBlock corr {corr_bb} vs flax"
    print(f"SMOKE: fused backbone BasicBlock ok (corr {corr_bb:.5f})  "
          f"[{time.time()-t0:.0f}s]")

    # 8d. Fused ConvBlock2d head (conv+pool+bn+prelu one-pass,
    # ops/pallas_head.py) vs the unfused flax block at the block0 shape —
    # polyphase lane-roll taps + pooled write are Mosaic-lowering-only risks
    from freesound_classification_tpu.models.blocks import ConvBlock2d

    xh = jnp.asarray(rngx.randn(4, 128, 431, 2).astype(np.float32)
                     ).astype(jnp.bfloat16)
    cb = ConvBlock2d(64, jnp.bfloat16)
    vcb = cb.init({"params": jax.random.PRNGKey(6)}, xh, train=False)
    # nudge batch_stats off init (mean=0, var=1) so the bn folding
    # arithmetic in fold_head_params is non-degenerate on the chip
    vcb = {
        "params": vcb["params"],
        "batch_stats": jax.tree.map(
            lambda v: v + 0.3 * jnp.asarray(
                np.random.RandomState(7).rand(*v.shape), v.dtype),
            vcb["batch_stats"]),
    }
    cb_fused = ConvBlock2d(64, jnp.bfloat16, fused_head=True)
    ref_h = np.asarray(jax.jit(
        lambda v, x: cb.apply(v, x, train=False))(vcb, xh),
        dtype=np.float32)
    out_h = np.asarray(jax.jit(
        lambda v, x: cb_fused.apply(v, x, train=False))(vcb, xh),
        dtype=np.float32)
    corr_h = float(np.corrcoef(ref_h.ravel(), out_h.ravel())[0, 1])
    assert corr_h > 0.999, f"fused head corr {corr_h} vs flax"
    print(f"SMOKE: fused conv-block head ok (corr {corr_h:.5f})  "
          f"[{time.time()-t0:.0f}s]")

    # 8e. Phase-decomposed conv+pool head (PRODUCTION inference default,
    # block0) vs the reduce-window head. Pure XLA — but the bf16 conv
    # lowering differs by stride on TPU (MXU pass structure), so gate the
    # chip-side tolerance here (CPU tests pin f32 bit-exactness).
    cb_phase = ConvBlock2d(64, jnp.bfloat16, phase_pool=True)
    out_p = np.asarray(jax.jit(
        lambda v, x: cb_phase.apply(v, x, train=False))(vcb, xh),
        dtype=np.float32)
    corr_p = float(np.corrcoef(ref_h.ravel(), out_p.ravel())[0, 1])
    mad_p = float(np.max(np.abs(ref_h - out_p)))
    assert corr_p > 0.9999, f"phase-pool head corr {corr_p} vs flax"
    assert mad_p < 0.1, f"phase-pool head max abs diff {mad_p}"
    print(f"SMOKE: phase-pool head ok (corr {corr_p:.6f}, "
          f"mad {mad_p:.2e})  [{time.time()-t0:.0f}s]")

    print(f"SMOKE PASS  [{time.time()-t0:.0f}s total]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
