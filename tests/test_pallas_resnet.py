"""Fused inference resnet block vs the unfused Flax block.

The fused path (ops/pallas_resnet.py) folds eval-mode BN into conv weights
and runs one VMEM pass; off-TPU the Pallas kernel runs interpreted, so
these tests exercise the EXACT code path that ships (minus Mosaic
lowering, which tpu_smoke.py gates on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.blocks import ResnetBlock2d
from freesound_classification_tpu.ops import pallas_resnet


def _init_block(c, h, w, b=2, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c).astype("f4"))
    block = ResnetBlock2d(c, dtype)
    variables = block.init({"params": jax.random.PRNGKey(seed)}, x,
                           train=False)
    # nudge batch_stats off the init values so BN folding is non-trivial
    variables = jax.tree.map(lambda v: v, variables)
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.asarray(
            np.random.RandomState(1).rand(*v.shape), v.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    return x, block, variables


class TestFoldedXLATwin:
    @pytest.mark.parametrize("c,h,w", [(8, 6, 11), (16, 4, 4), (8, 1, 5)])
    def test_matches_flax_eval(self, c, h, w):
        x, block, variables = _init_block(c, h, w)
        ref = block.apply(variables, x, train=False)
        fp = pallas_resnet.fold_block_params(variables)
        out = pallas_resnet.resnet_block_2d_infer_xla(x, fp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)


class TestFusedKernel:
    @pytest.mark.parametrize("c,h,w", [(8, 6, 11), (16, 5, 7)])
    def test_interpret_matches_flax_eval(self, c, h, w):
        x, block, variables = _init_block(c, h, w, seed=3)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_resnet.fold_block_params(variables)
        xp = jnp.pad(x.astype(jnp.bfloat16),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        b = x.shape[0]
        r = (h + 2) * (w + 2)
        r_pad = -(-r // 16) * 16
        c_pad = 128
        x_flat = jnp.pad(xp.reshape(b, r, c), ((0, 0), (0, r_pad - r),
                                               (0, c_pad - c)))
        idx = np.arange(r_pad)
        hh, ww = idx // (w + 2), idx % (w + 2)
        mask = (((hh >= 1) & (hh <= h) & (ww >= 1) & (ww <= w) & (idx < r))
                .astype(np.float32))[:, None]
        padw = lambda m: jnp.pad(  # noqa: E731
            m, ((0, c_pad - m.shape[0]), (0, c_pad - m.shape[1])))
        padv = lambda v: jnp.pad(v, (0, c_pad - v.shape[0]))  # noqa: E731
        w2p = jnp.pad(fp["w2"], ((0, 0), (0, c_pad - c), (0, c_pad - c)))
        out = pallas_resnet._fused_pallas(
            x_flat, jnp.asarray(mask), padw(fp["w1"]), w2p, padw(fp["w3"]),
            padv(fp["b1"]), padv(fp["b2"]), padv(fp["b3"]),
            padv(fp["a1"]), padv(fp["a2"]), padv(fp["a3"]),
            h=h, w=w, interpret=True)
        out = np.asarray(out).reshape(b, h, w + 2, c_pad)[:, :, :w, :c]
        # bf16 activations in the kernel: compare at bf16 tolerance
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr

    @pytest.mark.parametrize("c,h,w", [(8, 6, 11), (16, 5, 7), (24, 3, 130)])
    def test_v2_interpret_matches_flax_eval(self, c, h, w):
        """v2 transposed-layout kernel (lane-roll taps) vs the flax block.
        w=130 exercises the two-lane-tile roll carry path."""
        x, block, variables = _init_block(c, h, w, seed=11)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_resnet.fold_block_params(variables)
        out = np.asarray(
            pallas_resnet.resnet_block_2d_infer_pallas_t(
                x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr

    def test_v2_single_row_and_image(self):
        """H=1 (both SAME halos zero) and B=1 (DMA drain edge)."""
        c, h, w = 8, 1, 9
        x, block, variables = _init_block(c, h, w, b=1, seed=13)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_resnet.fold_block_params(variables)
        out = np.asarray(
            pallas_resnet.resnet_block_2d_infer_pallas_t(
                x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)

    def test_v2_vmap_over_stacked_fold_params(self):
        """The ensemble-inference path (training/ensemble.py) vmaps the
        eval forward over stacked per-fold params with a shared batch;
        the v2 kernel's custom_vmap rule must unroll to per-fold calls."""
        c, h, w = 8, 4, 9
        folds = []
        for seed in (21, 22, 23):
            x, block, variables = _init_block(c, h, w, seed=seed)
            folds.append(pallas_resnet.fold_block_params(variables))
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *folds)
        out_v = jax.vmap(
            lambda fp: pallas_resnet.resnet_block_2d_infer_pallas_t(
                x, fp, interpret=True))(stacked)
        for i, fp in enumerate(folds):
            ref = pallas_resnet.resnet_block_2d_infer_pallas_t(
                x, fp, interpret=True)
            np.testing.assert_allclose(np.asarray(out_v[i]),
                                       np.asarray(ref), atol=1e-5)

    def test_v2_vmap_over_images_folds_into_batch(self):
        c, h, w = 8, 4, 9
        x, block, variables = _init_block(c, h, w, b=4, seed=31)
        fp = pallas_resnet.fold_block_params(variables)
        x2 = x.reshape(2, 2, h, w, c)
        out_v = jax.vmap(
            lambda xx: pallas_resnet.resnet_block_2d_infer_pallas_t(
                xx, fp, interpret=True))(x2)
        ref = pallas_resnet.resnet_block_2d_infer_pallas_t(
            x, fp, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_v).reshape(4, h, w, c), np.asarray(ref),
            atol=1e-5)

    def test_flax_fused_flag_routes_and_matches(self):
        c, h, w = 8, 6, 11
        x, _, variables = _init_block(c, h, w, seed=5)
        plain = ResnetBlock2d(c)
        fused = ResnetBlock2d(c, fused_infer=True)
        ref = np.asarray(plain.apply(variables, x, train=False))
        out = np.asarray(fused.apply(variables, x, train=False))
        # off-TPU the fused flag routes to the folded XLA twin
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_train_mode_ignores_fused_flag(self):
        c, h, w = 8, 6, 11
        x, _, variables = _init_block(c, h, w, seed=7)
        plain = ResnetBlock2d(c)
        fused = ResnetBlock2d(c, fused_infer=True)
        r1, m1 = plain.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        r2, m2 = fused.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6),
            m1, m2)
