"""Fold-merged ensemble inference == vmapped stacked-fold inference.

The merged path (models/merged_ensemble.py) packs K folds into the channel
dimension (grouped convs, concatenated BN/PReLU params, slice-max pooling);
it must reproduce the vmapped ``model.apply`` logits exactly (f32) for any
fold count, supervision start, and bucket shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.classifiers import TwoDimensionalCNN
from freesound_classification_tpu.models.merged_ensemble import (
    merged_infer_logits,
)

N_CLASSES = 7
K = 3


def _stacked_model(num_blocks=3, start_sup=1, base=8, growth=1.5,
                   agg="max", dtype=jnp.float32, h=16, w=21, b=4, seed=0):
    model = TwoDimensionalCNN(
        num_conv_blocks=num_blocks, start_deep_supervision_on=start_sup,
        conv_base_depth=base, growth_rate=growth, aggregation_type=agg,
        n_classes=N_CLASSES, dtype=dtype)
    rng = np.random.RandomState(seed)
    inputs = jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32))
    fl = jnp.asarray(rng.randint(max(2, w // 2), w + 1, size=(b,))
                     .astype(np.int32))
    variables = model.init({"params": jax.random.PRNGKey(seed)}, inputs, fl,
                           train=False)

    def perturb(i):
        r = np.random.RandomState(100 + i)
        return jax.tree.map(
            lambda leaf: (leaf + 0.05 * r.randn(*leaf.shape).astype(
                leaf.dtype) if np.issubdtype(leaf.dtype, np.floating)
                else leaf),
            jax.device_get(variables))

    folds = [perturb(i) for i in range(K)]
    # make running stats positive-var and distinct per fold
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *folds)
    stacked["batch_stats"] = jax.tree.map(
        lambda v: jnp.abs(v) + 0.1, stacked["batch_stats"])
    return model, stacked, inputs, fl


def _vmapped_logits(model, stacked, inputs, fl):
    return jax.vmap(
        lambda v: model.apply(v, inputs, fl, train=False)["class_logits"]
    )(stacked)


class TestMergedEnsemble:
    def test_matches_vmapped_f32(self):
        model, stacked, inputs, fl = _stacked_model()
        ref = _vmapped_logits(model, stacked, inputs, fl)
        got = merged_infer_logits(model, stacked, inputs, fl)
        assert got.shape == (K, inputs.shape[0], N_CLASSES)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_vmapped_bf16(self):
        model, stacked, inputs, fl = _stacked_model(dtype=jnp.bfloat16)
        ref = _vmapped_logits(model, stacked, inputs, fl)
        got = merged_infer_logits(model, stacked, inputs, fl)
        # bf16 compute: grouped vs per-fold convs may round differently;
        # require tight agreement, not bit equality
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        corr = np.corrcoef(np.asarray(got).ravel(),
                           np.asarray(ref).ravel())[0, 1]
        assert corr > 0.9999

    def test_odd_shapes_and_supervision(self):
        # odd W exercises the floor-pooling slice semantics; supervision
        # from block 0 exercises every feature tap
        model, stacked, inputs, fl = _stacked_model(
            num_blocks=4, start_sup=0, h=15, w=33, b=3, seed=3)
        ref = _vmapped_logits(model, stacked, inputs, fl)
        got = merged_infer_logits(model, stacked, inputs, fl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bucket_parity_with_flax(self):
        # the merged path must track the flax path exactly on EVERY bucket
        # width (the flax model itself is only invariant up to odd-width
        # pool-floor effects — ~2.5e-3 at this config — so the contract is
        # per-bucket parity, not absolute invariance)
        model, stacked, inputs, fl = _stacked_model(w=24, seed=5)
        wide = jnp.pad(inputs, ((0, 0), (0, 0), (0, 8), (0, 0)))
        for x in (inputs, wide):
            ref = _vmapped_logits(model, stacked, x, fl)
            got = merged_infer_logits(model, stacked, x, fl)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)

    def test_rnn_aggregation_raises(self):
        model, stacked, inputs, fl = _stacked_model(agg="rnn")
        with pytest.raises(NotImplementedError):
            merged_infer_logits(model, stacked, inputs, fl)
