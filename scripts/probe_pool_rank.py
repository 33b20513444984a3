"""Pool-lowering study for the 5-fold inference program.

Findings so far (v5e-1, honest tunnel timing, B=64 x 10 s):
- probe_infer_levers.py: at the block1 shape, the vmapped rank-5
  reduce-window ran 2.9x below a rank-4 merged layout (5.11 vs 1.79 ms).
- Round A (custom_vmap merged-batch pools): NEGATIVE at model level —
  56.58 -> 56.76 ms, and even isolated at the block0 pool shape
  (5,64,128,431,64 bf16) both forms run 19.5 ms = ~145 GB/s effective.
  The window-RANK hypothesis is dead; the block1 isolated win did not
  transfer. custom_vmap also breaks reverse-mode AD on the plain path and
  under vmap(grad(...)), so it was dropped from blocks.py.
- Round B: alternate lowerings of the same layout all LOSE to
  reduce-window at the merged block0 shape (320,128,431,64 bf16):
  rw 19.7 ms (~145 GB/s), pair-split reshape 22.4, 4-slice 24.0,
  two-stage strided maximum 45.7; f32 rw 30.9 (~183 GB/s per 2x bytes).
  The cost is LANE OCCUPANCY: C=64 minor fills half a 128-lane tile
  (block1's merged-C=480 run hit 592 GB/s).
- Round C: the paired-lane trick — (W, C) -> (W//2, 2C) is logically a
  trailing-contiguous reshape making every row a full 128-lane tile —
  is ALSO negative: 47.7 ms isolated (0.41x), 92.8 ms model level
  (0.61x). Trailing reshapes are physical relayouts under TPU tiled
  layouts. Conclusion: reduce-window IS the lowering floor; the pool's
  ~145 GB/s is intrinsic to half-lane C=64-minor bf16 tiles.
- Round D (this file, [3]): bound probes for a fused conv0+pool Pallas
  kernel — pools-as-strided-slices (max-window cost in context) and
  block0 stride-2-conv-no-pool (the full fused-kernel prize).

Usage: PYTHONPATH=/root/repo python scripts/probe_pool_rank.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import flax.linen as nn  # noqa: E402

from freesound_classification_tpu.models import blocks  # noqa: E402

SR = 44100
_RTT = [0.03]


def _paired_lane_pool(h, window):
    """2x2/2 maxpool via the logically-free (W, C) -> (W//2, 2C) view.

    NEGATIVE RESULT on v5e: 47.7 ms vs reduce-window's 19.6 isolated,
    model-level 92.8 vs 56.5 — trailing-dim reshapes are PHYSICAL
    relayouts under TPU tiled layouts, not views; the trick pays a full
    (8,128)-tile shuffle of the 2.26 GB map. Kept for re-measurement."""
    c = h.shape[-1]
    hh, ww = h.shape[-3], h.shape[-2]
    h2, w2 = (hh // 2) * 2, (ww // 2) * 2
    y = h[..., :h2, :w2, :].reshape(h.shape[:-3] + (h2, w2 // 2, 2 * c))
    a = jnp.maximum(y[..., 0:h2:2, :, :], y[..., 1:h2:2, :, :])
    return jnp.maximum(a[..., :c], a[..., c:])


def measure_rtt():
    probe = jnp.zeros((8,), jnp.int32)
    vals = []
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(probe))
        vals.append(time.time() - t0)
    _RTT[0] = float(np.median(vals))
    print(f"RTT {_RTT[0]*1e3:.1f} ms", flush=True)


def timed(fn, *args, n=20, label=""):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ms = (time.time() - t0 - _RTT[0]) / n * 1e3
    print(f"  {label:56s} {ms:8.3f} ms  (compile+1 {compile_s:4.1f}s)",
          flush=True)
    return ms


def main():
    measure_rtt()
    rng = np.random.RandomState(0)

    print("\n[1] isolated pool at merged block0 pool shape "
          "(320,128,431,64) bf16 (2.26 GB in, 0.56 GB out)", flush=True)
    x4 = jnp.asarray(rng.randn(320, 128, 431, 64).astype(np.float32),
                     jnp.bfloat16)

    def pool_rw(x):
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    def pool_paired(x):
        return _paired_lane_pool(x, (2, 2))

    t_rw = timed(jax.jit(pool_rw), x4, label="reduce-window")
    t_pr = timed(jax.jit(pool_paired), x4, label="paired-lane (free (W,C)->(W/2,2C) view)")
    y1 = jax.jit(pool_rw)(x4)
    y2 = jax.jit(pool_paired)(x4)
    print(f"  paired parity: {bool(jnp.all(y1 == y2))}   "
          f"isolated speedup {t_rw/t_pr:.2f}x")

    print("\n[2] model-level 5-fold predict (B=64 x 10 s)", flush=True)
    from freesound_classification_tpu.models.classifiers import (
        TwoDimensionalCNN,
    )
    from freesound_classification_tpu.models.frontend import Frontend

    b_, l = 64, SR * 10
    wave = jnp.asarray(rng.randn(b_, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b_,), l, jnp.int32)
    model = TwoDimensionalCNN(
        num_conv_blocks=6, start_deep_supervision_on=2, conv_base_depth=64,
        growth_rate=1.5, aggregation_type="max", n_classes=80,
        dtype=jnp.bfloat16)
    frontend = Frontend("mel_2048_1024_128", "2d", sr=SR, use_pallas=True,
                        dft_precision="default")
    inputs, fl = frontend(wave, lengths)
    variables = model.init({"params": jax.random.PRNGKey(0)}, inputs, fl,
                           train=False)
    stacked = jax.tree.map(lambda x: jnp.stack([x] * 5), variables)

    def make_predict():
        def predict(wave, lengths):
            x, f = frontend(wave, lengths)

            def one_fold(v):
                return model.apply(v, x, f, train=False)["class_logits"]

            logits = jax.vmap(one_fold)(stacked)
            return jnp.mean(jax.nn.sigmoid(logits), axis=0)

        return jax.jit(predict)

    orig_max_pool_prod = blocks._max_pool
    plain = make_predict()
    t_plain = timed(plain, wave, lengths, label="pools reduce-window")
    try:
        blocks._max_pool = lambda h, w: (
            _paired_lane_pool(h, tuple(w)) if (tuple(w) == (2, 2)
            and h.ndim >= 4 and 2 * h.shape[-1] <= 128)
            else orig_max_pool_prod(h, w))
        paired = make_predict()
        t_paired = timed(paired, wave, lengths,
                         label="pools paired-lane (block0 only)")
        p2 = np.asarray(paired(wave, lengths), np.float32)
    finally:
        blocks._max_pool = orig_max_pool_prod
    p1 = np.asarray(plain(wave, lengths), np.float32)
    print(f"  max abs prob diff: {np.max(np.abs(p1 - p2)):.2e}")
    print(f"  model-level: {t_plain:.2f} -> {t_paired:.2f} ms "
          f"({t_plain/t_paired:.2f}x)")

    # ---- 3. BOUND probes (wrong numerics, wall-clock only) -------------
    # What would a fused conv0+pool kernel be worth? Two hacked variants:
    #  a. "slice-pool": every maxpool replaced by a strided slice (the
    #     window max disappears; conv still writes full-res) — bounds the
    #     in-context cost of the max windows themselves.
    #  b. "stride2-conv0": block0's conv runs at stride 2 with no pool
    #     (the full-res block0 map never exists) — bounds the prize of a
    #     fused conv0+pool kernel that writes pooled output directly.
    print("\n[3] bound probes (WRONG NUMERICS, wall-clock only)", flush=True)
    orig_max_pool = blocks._max_pool
    def slice_pool(h, window):
        idx = tuple(slice(None) for _ in range(h.ndim - len(window) - 1))
        for w, size in zip(window,
                           h.shape[h.ndim - len(window) - 1:-1]):
            idx += (slice(0, (size // w) * w, w),)
        return h[idx]

    try:
        blocks._max_pool = slice_pool
        sliced = make_predict()
        t_slice = timed(sliced, wave, lengths,
                        label="[bound a] pools as strided slices")
    finally:
        blocks._max_pool = orig_max_pool

    import flax.linen as fnn

    from freesound_classification_tpu.models import classifiers as clf

    class ConvBlock2d(blocks.ConvBlock2d):  # same name -> same param paths
        @fnn.compact
        def __call__(self, x, train=False):
            h = blocks._bn(train, self.dtype, name="bn_in")(x)
            if x.shape[-1] == 2:  # block0 only
                h = fnn.Conv(self.depth, (3, 3), strides=(2, 2), padding=1,
                             dtype=self.dtype, name="conv")(h)
                h = h[:, :x.shape[1] // 2, :x.shape[2] // 2]
            else:
                h = fnn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                             name="conv")(h)
                wh = 2 if h.shape[1] >= 2 else 1
                ww = 2 if h.shape[2] >= 2 else 1
                h = blocks._max_pool(h, (wh, ww))
            h = blocks._bn(train, self.dtype, name="bn_out")(h)
            h = blocks.PReLU(self.depth, name="prelu")(h)
            return blocks.ResnetBlock2d(self.depth, self.dtype,
                                        fused_infer=self.fused_infer,
                                        name="resnet")(h, train)

    orig_clf_convblock = clf.ConvBlock2d
    try:
        clf.ConvBlock2d = ConvBlock2d
        s2 = make_predict()
        t_s2 = timed(s2, wave, lengths,
                     label="[bound b] block0 stride-2 conv, no pool")
    finally:
        clf.ConvBlock2d = orig_clf_convblock

    print(f"  in-context max-window cost <= {t_plain - t_slice:.2f} ms; "
          f"fused conv0+pool prize ~= {t_plain - t_s2:.2f} ms")


if __name__ == "__main__":
    main()
