"""Fused ConvBlock2d head kernel (ops/pallas_head.py) vs the unfused flax
head: bn_in -> conv3x3(SAME) -> maxpool(2,2) -> bn_out -> PReLU.

Off-TPU the Pallas kernel runs interpreted, so these tests exercise the
exact shipped code path minus Mosaic lowering (tpu_smoke.py gates that on
hardware)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models import blocks
from freesound_classification_tpu.ops import pallas_head


class _Head(nn.Module):
    """The unfused head alone (ConvBlock2d minus its resnet tail)."""

    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = blocks._bn(train, self.dtype, name="bn_in")(x)
        h = nn.Conv(self.depth, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(h)
        h = blocks._max_pool(h, (2, 2))
        h = blocks._bn(train, self.dtype, name="bn_out")(h)
        return blocks.PReLU(self.depth, name="prelu")(h)


def _init_head(c, h, w, depth, b=2, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c).astype("f4"))
    head = _Head(depth, dtype)
    variables = head.init({"params": jax.random.PRNGKey(seed)}, x,
                          train=False)
    # nudge batch_stats off init values so the BN folding is non-trivial
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.asarray(
            np.random.RandomState(1).rand(*v.shape), v.dtype),
        variables["batch_stats"])
    return x, head, {"params": variables["params"], "batch_stats": bs}


class TestFusedHead:
    @pytest.mark.parametrize("c,h,w,depth", [
        (2, 8, 11, 16),    # odd W (bench block0 parity: W=431 is odd)
        (2, 8, 12, 16),    # even W (needs the zero xe tail for roll(-1))
        (1, 6, 9, 32),     # single channel
        (3, 7, 10, 16),    # odd H (flax pool drops the leftover row)
        (4, 4, 256, 16),   # full first lane tile, max supported C_in
    ])
    def test_interpret_matches_flax_eval(self, c, h, w, depth):
        x, head, variables = _init_head(c, h, w, depth, seed=c + h)
        ref = np.asarray(head.apply(variables, x, train=False))
        out = np.asarray(pallas_head.conv_block_2d_head_infer(
            x, variables, interpret=True))
        assert out.shape == ref.shape
        # the kernel's conv dot is bf16 (MXU) even for f32 inputs — the
        # production model is bf16; compare at bf16 tolerance
        np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.9999, corr

    def test_bf16_model_dtype(self):
        x, head, variables = _init_head(2, 10, 21, 16, dtype=jnp.bfloat16)
        ref = np.asarray(
            head.apply(variables, x, train=False), np.float32)
        out = np.asarray(pallas_head.conv_block_2d_head_infer(
            x.astype(jnp.bfloat16), variables, interpret=True), np.float32)
        # bf16 activations / different accumulation order: bf16 tolerance
        np.testing.assert_allclose(out, ref, atol=0.08, rtol=0.06)
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr

    def test_fold_vmap_unrolls(self):
        """The 5-fold ensemble path: weights AND packed input fold-mapped."""
        n_folds, depth = 3, 16
        x, head, variables = _init_head(2, 8, 13, depth, seed=7)
        folds = []
        for i in range(n_folds):
            rng = np.random.RandomState(10 + i)
            folds.append(jax.tree.map(
                lambda v: v + 0.05 * jnp.asarray(rng.rand(*v.shape),
                                                 v.dtype), variables))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *folds)

        out = jax.vmap(
            lambda v: pallas_head.conv_block_2d_head_infer(
                x, v, interpret=True))(stacked)
        for i in range(n_folds):
            ref = head.apply(folds[i], x, train=False)
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                       atol=0.05, rtol=0.05)

    def test_head_supported_guards(self):
        assert pallas_head.head_supported((4, 128, 431, 2), 64)
        assert not pallas_head.head_supported((4, 128, 431, 8), 64)   # C_in
        assert not pallas_head.head_supported((4, 1, 431, 2), 64)    # H < 2
        assert not pallas_head.head_supported((4, 128, 431, 2), 24)  # depth
        # a 60 s clip's frame count blows the per-image VMEM budget
        assert not pallas_head.head_supported((4, 128, 2584 * 4, 2), 64)

    def test_convblock_fused_head_cpu_fallback(self):
        """fused_head=True off-TPU must silently take the unfused path."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 11, 2).astype("f4"))
        block = blocks.ConvBlock2d(16, fused_head=True)
        variables = block.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False)
        ref_block = blocks.ConvBlock2d(16, fused_head=False)
        out = block.apply(variables, x, train=False)
        ref = ref_block.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
