"""Fused 1d inference resnet block vs the unfused Flax block.

The fused path (ops/pallas_resnet1d.py) folds eval-mode BN into conv
weights and runs one VMEM pass per clip in the transposed (C, T) layout;
off-TPU the Pallas kernel runs interpreted, so these tests exercise the
exact shipping code path (minus Mosaic lowering, which tpu_smoke.py gates
on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.blocks import ResnetBlock1d
from freesound_classification_tpu.ops import pallas_resnet1d


def _init_block(c, t, b=2, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, c).astype("f4"))
    block = ResnetBlock1d(c, dtype)
    variables = block.init({"params": jax.random.PRNGKey(seed)}, x,
                           train=False)
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.asarray(
            np.random.RandomState(1).rand(*v.shape), v.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    return x, block, variables


class TestFoldedXLATwin:
    @pytest.mark.parametrize("c,t", [(8, 11), (16, 4), (8, 1)])
    def test_matches_flax_eval(self, c, t):
        x, block, variables = _init_block(c, t)
        ref = block.apply(variables, x, train=False)
        fp = pallas_resnet1d.fold_block_params_1d(variables)
        out = pallas_resnet1d.resnet_block_1d_infer_xla(x, fp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)


class TestFusedKernel1d:
    @pytest.mark.parametrize("c,t", [(8, 11), (16, 7), (24, 130)])
    def test_interpret_matches_flax_eval(self, c, t):
        """t=130 exercises the two-lane-tile roll carry path."""
        x, block, variables = _init_block(c, t, seed=3)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_resnet1d.fold_block_params_1d(variables)
        out = np.asarray(
            pallas_resnet1d.resnet_block_1d_infer_pallas(
                x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr

    def test_single_frame_and_clip(self):
        """T=1 (both SAME halos zero) and B=1 (DMA drain edge)."""
        c, t = 8, 1
        x, block, variables = _init_block(c, t, b=1, seed=13)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_resnet1d.fold_block_params_1d(variables)
        out = np.asarray(
            pallas_resnet1d.resnet_block_1d_infer_pallas(
                x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)

    def test_vmap_over_stacked_fold_params(self):
        """Ensemble inference vmaps the eval forward over stacked per-fold
        params with a shared batch; the custom_vmap rule must unroll."""
        c, t = 8, 9
        folds = []
        for seed in (21, 22, 23):
            x, block, variables = _init_block(c, t, seed=seed)
            folds.append(pallas_resnet1d.fold_block_params_1d(variables))
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *folds)
        out_v = jax.vmap(
            lambda fp: pallas_resnet1d.resnet_block_1d_infer_pallas(
                x, fp, interpret=True))(stacked)
        for i, fp in enumerate(folds):
            ref = pallas_resnet1d.resnet_block_1d_infer_pallas(
                x, fp, interpret=True)
            np.testing.assert_allclose(np.asarray(out_v[i]),
                                       np.asarray(ref), atol=1e-5)

    def test_vmap_over_images_folds_into_batch(self):
        c, t = 8, 9
        x, block, variables = _init_block(c, t, b=4, seed=31)
        fp = pallas_resnet1d.fold_block_params_1d(variables)
        x2 = x.reshape(2, 2, t, c)
        out_v = jax.vmap(
            lambda xx: pallas_resnet1d.resnet_block_1d_infer_pallas(
                xx, fp, interpret=True))(x2)
        ref = pallas_resnet1d.resnet_block_1d_infer_pallas(
            x, fp, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_v).reshape(4, t, c), np.asarray(ref), atol=1e-5)


class TestRouting:
    def test_flax_fused_flag_routes_and_matches(self):
        c, t = 8, 11
        x, _, variables = _init_block(c, t, seed=5)
        block = ResnetBlock1d(c, fused_infer=True)
        ref = ResnetBlock1d(c).apply(variables, x, train=False)
        out = block.apply(variables, x, train=False)  # off-TPU -> XLA twin
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    def test_train_mode_ignores_fused_flag(self):
        c, t = 8, 11
        x, _, variables = _init_block(c, t, seed=7)
        block = ResnetBlock1d(c, fused_infer=True)
        out, mut = block.apply(variables, x, train=True,
                               mutable=["batch_stats"])
        ref, mut_ref = ResnetBlock1d(c).apply(variables, x, train=True,
                                              mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_hierarchical_cnn_fused_infer_matches(self):
        from freesound_classification_tpu.models.classifiers import (
            HierarchicalCNN,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 32, 16).astype("f4"))
        fl = jnp.asarray([32, 20], jnp.int32)
        kw = dict(num_conv_blocks=3, start_deep_supervision_on=1,
                  conv_base_depth=8, growth_rate=2.0,
                  aggregation_type="max", n_classes=5)
        m0 = HierarchicalCNN(**kw)
        m1 = HierarchicalCNN(fused_infer=True, **kw)
        variables = m0.init({"params": jax.random.PRNGKey(0)}, x, fl,
                            train=False)
        ref = m0.apply(variables, x, fl, train=False)["class_logits"]
        out = m1.apply(variables, x, fl, train=False)["class_logits"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-2)
