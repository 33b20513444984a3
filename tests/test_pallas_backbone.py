"""Fused backbone BasicBlock vs the unfused Flax block.

The fused path (ops/pallas_backbone.py) folds eval-mode BN into the two
3x3 convs and runs a two-ring pipelined VMEM pass; off-TPU the kernel runs
interpreted, so these tests exercise the exact shipping code path (minus
Mosaic lowering, which tpu_smoke.py gates on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.backbone import BasicBlock
from freesound_classification_tpu.ops import pallas_backbone


def _init_block(c, h, w, features=None, strides=1, b=2, seed=0):
    features = features or c
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c).astype("f4"))
    block = BasicBlock(features, strides)
    variables = block.init({"params": jax.random.PRNGKey(seed)}, x,
                           train=False)
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.asarray(
            np.random.RandomState(1).rand(*v.shape), v.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    return x, block, variables


class TestFoldedXLATwin:
    @pytest.mark.parametrize("c,h,w,strides", [
        (8, 6, 11, 1),   # identity shortcut
        (8, 6, 10, 2),   # stride-2 + projection (channels double)
    ])
    def test_matches_flax_eval(self, c, h, w, strides):
        features = c if strides == 1 else 2 * c
        x, block, variables = _init_block(c, h, w, features, strides)
        ref = block.apply(variables, x, train=False)
        fp = pallas_backbone.fold_basic_params(variables)
        out = pallas_backbone.basic_block_infer_xla(x, fp, strides)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    def test_projection_same_stride(self):
        """Channel-change block at stride 1 (stage transition variant)."""
        x, block, variables = _init_block(8, 5, 7, features=16, strides=1,
                                          seed=2)
        ref = block.apply(variables, x, train=False)
        fp = pallas_backbone.fold_basic_params(variables)
        out = pallas_backbone.basic_block_infer_xla(x, fp, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)


class TestFusedKernel:
    @pytest.mark.parametrize("c,h,w", [(8, 6, 11), (16, 5, 7), (24, 3, 130)])
    def test_interpret_matches_flax_eval(self, c, h, w):
        """w=130 exercises the two-lane-tile roll carry path."""
        x, block, variables = _init_block(c, h, w, seed=3)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_backbone.fold_basic_params(variables)
        out = np.asarray(
            pallas_backbone.basic_block_infer_pallas(x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr

    def test_single_row_and_image(self):
        """H=1 (both SAME halos zero) and B=1 (DMA drain edge)."""
        c, h, w = 8, 1, 9
        x, block, variables = _init_block(c, h, w, b=1, seed=13)
        ref = np.asarray(block.apply(variables, x, train=False))
        fp = pallas_backbone.fold_basic_params(variables)
        out = np.asarray(
            pallas_backbone.basic_block_infer_pallas(x, fp, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.06, rtol=0.05)

    def test_vmap_over_stacked_fold_params(self):
        c, h, w = 8, 4, 9
        folds = []
        for seed in (21, 22, 23):
            x, block, variables = _init_block(c, h, w, seed=seed)
            folds.append(pallas_backbone.fold_basic_params(variables))
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *folds)
        out_v = jax.vmap(
            lambda fp: pallas_backbone.basic_block_infer_pallas(
                x, fp, interpret=True))(stacked)
        for i, fp in enumerate(folds):
            ref = pallas_backbone.basic_block_infer_pallas(
                x, fp, interpret=True)
            np.testing.assert_allclose(np.asarray(out_v[i]),
                                       np.asarray(ref), atol=1e-5)


class TestRouting:
    def test_fused_flag_routes_and_matches(self):
        c, h, w = 8, 6, 11
        x, _, variables = _init_block(c, h, w, seed=5)
        block = BasicBlock(c, fused_infer=True)
        ref = BasicBlock(c).apply(variables, x, train=False)
        out = block.apply(variables, x, train=False)  # off-TPU -> XLA twin
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    def test_stride2_block_routes_to_xla(self):
        x, _, variables = _init_block(8, 6, 10, features=16, strides=2,
                                      seed=6)
        block = BasicBlock(16, 2, fused_infer=True)
        ref = BasicBlock(16, 2).apply(variables, x, train=False)
        out = block.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-3)

    def test_backbone_fused_infer_matches(self):
        from freesound_classification_tpu.models.backbone import CNNBackbone

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 64, 48, 1).astype("f4"))
        fl = jnp.asarray([48, 30], jnp.int32)
        m0 = CNNBackbone(arch="resnet18", n_classes=5)
        m1 = CNNBackbone(arch="resnet18", n_classes=5, fused_infer=True)
        variables = m0.init({"params": jax.random.PRNGKey(0)}, x, fl,
                            train=False)
        ref = m0.apply(variables, x, fl, train=False)["class_logits"]
        out = m1.apply(variables, x, fl, train=False)["class_logits"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=1e-2)

    def test_train_mode_ignores_fused_flag(self):
        c, h, w = 8, 6, 11
        x, _, variables = _init_block(c, h, w, seed=7)
        block = BasicBlock(c, fused_infer=True)
        out, _ = block.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        ref, _ = BasicBlock(c).apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
