"""Fold-axis vmap over the Pallas kernel wrappers.

The fold-parallel trainer (training/multifold.py) vmaps the whole train
step — including the on-device augmenter — over a leading fold axis. JAX's
automatic pallas batching rule prepends a dimension to every operand,
which Mosaic rejects for the kernels' 1-D SMEM scalar arrays (a (K, B)
block fails the last-two-dims tiling rule); the wrappers therefore carry
custom_vmap rules that fold the mapped axis into the row dimension
(ops/pallas_kernels.py). These tests pin the rules' semantics: vmap must
equal the per-fold python loop. (The Mosaic lowering itself is guarded on
hardware by tpu_smoke.py section 4b.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from freesound_classification_tpu.ops import augment
from freesound_classification_tpu.ops.pallas_kernels import (
    resample_linear_pallas,
)
from freesound_classification_tpu.ops.pv import phase_vocoder_stretch

SR = 44100


def test_resample_vmap_matches_loop():
    rng = np.random.RandomState(0)
    k, b, l = 3, 2, 16384
    wave = jnp.asarray(rng.randn(k, b, l).astype(np.float32))
    factor = jnp.asarray(
        rng.uniform(0.9, 1.2, (k, b)).astype(np.float32))
    out_v = jax.vmap(resample_linear_pallas)(wave, factor)
    for i in range(k):
        out_i = resample_linear_pallas(wave[i], factor[i])
        np.testing.assert_allclose(
            np.asarray(out_v[i]), np.asarray(out_i), atol=1e-5)


def test_resample_vmap_unbatched_factor():
    rng = np.random.RandomState(1)
    k, b, l = 2, 2, 8192
    wave = jnp.asarray(rng.randn(k, b, l).astype(np.float32))
    factor = jnp.asarray(np.full(b, 1.1, np.float32))  # shared across folds
    out_v = jax.vmap(resample_linear_pallas, in_axes=(0, None))(wave, factor)
    for i in range(k):
        out_i = resample_linear_pallas(wave[i], factor)
        np.testing.assert_allclose(
            np.asarray(out_v[i]), np.asarray(out_i), atol=1e-5)


def test_pv_stretch_vmap_matches_loop():
    rng = np.random.RandomState(2)
    k, b, l = 2, 2, 32768
    wave = jnp.asarray(rng.randn(k, b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((k, b), l, jnp.int32)
    rate = jnp.asarray(rng.uniform(0.9, 1.15, (k, b)).astype(np.float32))
    out_v, len_v = jax.vmap(
        lambda w, ln, r: phase_vocoder_stretch(w, ln, r, n_fft=1024,
                                               hop=256))(wave, lengths, rate)
    for i in range(k):
        out_i, len_i = phase_vocoder_stretch(
            wave[i], lengths[i], rate[i], n_fft=1024, hop=256)
        np.testing.assert_array_equal(np.asarray(len_v[i]),
                                      np.asarray(len_i))
        np.testing.assert_allclose(
            np.asarray(out_v[i]), np.asarray(out_i), atol=1e-4)


def test_full_augmenter_vmap_matches_loop():
    """The multifold train path: vmap(augmenter) over folds == loop."""
    cfg = augment.AugmentConfig(p_mixup=0.5, p_aug=1.0, p_shuffle=0.5)
    augmenter = augment.make_augmenter(cfg)
    rng = np.random.RandomState(3)
    k, b, l = 2, 2, SR  # 1 s clips
    wave = jnp.asarray(rng.randn(k, b, l).astype(np.float32) * 0.1)
    lengths = jnp.asarray(
        rng.randint(l // 2, l + 1, (k, b)).astype(np.int32))
    labels = jnp.asarray((rng.rand(k, b, 80) < 0.05).astype(np.float32))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(k, dtype=jnp.uint32))

    out_v = jax.vmap(
        lambda w, ln, y, kk: augmenter(w, ln, y, kk, 1.0))(
            wave, lengths, labels, keys)
    for i in range(k):
        w_i, ln_i, y_i = augmenter(
            wave[i], lengths[i], labels[i], keys[i], 1.0)
        np.testing.assert_allclose(np.asarray(out_v[0][i]),
                                   np.asarray(w_i), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_v[1][i]),
                                      np.asarray(ln_i))
        np.testing.assert_allclose(np.asarray(out_v[2][i]),
                                   np.asarray(y_i), atol=1e-6)
