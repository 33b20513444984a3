"""Tap-split train-mode resnet blocks vs the unfused flax chains
(ops/resnet_train.py): values, batch-stat updates, and grads must match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.blocks import (
    ResnetBlock1d,
    ResnetBlock2d,
)
from freesound_classification_tpu.ops.resnet_train import (
    resnet_block_1d_train,
    resnet_block_2d_train,
)


@pytest.fixture(scope="module")
def block_setup():
    c = 12
    block = ResnetBlock2d(depth=c)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 7, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x, train=True)
    # perturb batch_stats away from init so running-stat updates are visible
    variables = jax.tree.map(lambda v: v, variables)
    return block, variables, x


def _flax_fwd(block, variables, x):
    y, mut = block.apply(variables, x, train=True,
                         mutable=["batch_stats"])
    return y, mut["batch_stats"]


def test_forward_and_stats_match_flax(block_setup):
    block, variables, x = block_setup
    y_ref, bs_ref = _flax_fwd(block, variables, x)
    y, bs = resnet_block_2d_train(x, variables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    flat_ref = jax.tree.leaves(bs_ref)
    flat = jax.tree.leaves(bs)
    assert len(flat) == len(flat_ref) == 6
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grads_match_flax(block_setup):
    block, variables, x = block_setup
    params = variables["params"]
    bs = variables["batch_stats"]

    def loss_ref(p, xx):
        y, _ = block.apply({"params": p, "batch_stats": bs}, xx,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    def loss_new(p, xx):
        y, _ = resnet_block_2d_train(xx, {"params": p, "batch_stats": bs})
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_new = jax.grad(loss_new, argnums=(0, 1))(params, x)
    ref_leaves, ref_tree = jax.tree.flatten(g_ref)
    new_leaves, new_tree = jax.tree.flatten(g_new)
    assert ref_tree == new_tree
    # conv-bias grads are mathematically ZERO (BN bwd zero-sums every
    # pre-BN channel grad); both sides produce only rounding noise there,
    # so those leaves are asserted near-zero rather than equal
    global_scale = max(float(jnp.max(jnp.abs(b))) for b in ref_leaves)
    for a, b in zip(new_leaves, ref_leaves):
        leaf_scale = float(jnp.max(jnp.abs(b)))
        if leaf_scale < 1e-4 * global_scale:  # mathematically-zero leaf
            assert float(jnp.max(jnp.abs(a))) < 1e-4 * global_scale
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5 * leaf_scale)


def test_module_fused_train_matches_unfused(block_setup):
    """ResnetBlock2d(fused_train=True) routes train calls through the
    tap-split path with identical variable trees (checkpoint compatible)."""
    _, variables, x = block_setup
    fused = ResnetBlock2d(depth=x.shape[-1], fused_train=True)
    y_ref, bs_ref = _flax_fwd(ResnetBlock2d(depth=x.shape[-1]),
                              variables, x)
    y, mut = fused.apply(variables, x, train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    ref_leaves, ref_tree = jax.tree.flatten(bs_ref)
    new_leaves, new_tree = jax.tree.flatten(mut["batch_stats"])
    assert ref_tree == new_tree
    for a, b in zip(new_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # eval-mode calls keep working (fused_infer-style XLA twin not engaged
    # here; just the unfused eval path with the same variables)
    y_eval = fused.apply(variables, x, train=False)
    assert y_eval.shape == x.shape


def test_convblock_fused_train_matches_unfused():
    """ConvBlock2d(fused_train=True) — outer tap-split conv + fused resnet
    — matches the plain chain, including when C_in != depth."""
    from freesound_classification_tpu.models.blocks import ConvBlock2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    variables = ConvBlock2d(depth=9).init(
        jax.random.PRNGKey(3), x, train=True)
    y_ref, mut_ref = ConvBlock2d(depth=9).apply(
        variables, x, train=True, mutable=["batch_stats"])
    y, mut = ConvBlock2d(depth=9, fused_train=True).apply(
        variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    assert (jax.tree.structure(mut["batch_stats"])
            == jax.tree.structure(mut_ref["batch_stats"]))
    for a, b in zip(jax.tree.leaves(mut["batch_stats"]),
                    jax.tree.leaves(mut_ref["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_backbone_basic_block_fused_train_matches_unfused():
    """BasicBlock(fused_train=True) for stride-1 identity blocks; stride-2
    / projection blocks must silently keep the flax path."""
    from freesound_classification_tpu.models.backbone import BasicBlock

    rng = np.random.RandomState(4)
    c = 8
    x = jnp.asarray(rng.randn(2, 10, 14, c).astype(np.float32))
    variables = BasicBlock(features=c).init(
        jax.random.PRNGKey(4), x, train=True)
    y_ref, mut_ref = BasicBlock(features=c).apply(
        variables, x, train=True, mutable=["batch_stats"])
    y, mut = BasicBlock(features=c, fused_train=True).apply(
        variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut["batch_stats"]),
                    jax.tree.leaves(mut_ref["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # stride-2 projection block: fused_train must be a no-op
    vs = BasicBlock(features=2 * c, strides=2).init(
        jax.random.PRNGKey(5), x, train=True)
    y2_ref, _ = BasicBlock(features=2 * c, strides=2).apply(
        vs, x, train=True, mutable=["batch_stats"])
    y2, _ = BasicBlock(features=2 * c, strides=2, fused_train=True).apply(
        vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y2_ref))


def test_1d_forward_stats_and_grads_match_flax():
    c = 10
    block = ResnetBlock1d(depth=c)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 9, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(1), x, train=True)
    y_ref, mut = block.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    y, bs = resnet_block_1d_train(x, variables)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(bs),
                    jax.tree.leaves(mut["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    bs0 = variables["batch_stats"]

    def loss_ref(p, xx):
        yy, _ = block.apply({"params": p, "batch_stats": bs0}, xx,
                            train=True, mutable=["batch_stats"])
        return jnp.sum(yy * jnp.sin(jnp.arange(yy.size).reshape(yy.shape)))

    def loss_new(p, xx):
        yy, _ = resnet_block_1d_train(xx, {"params": p, "batch_stats": bs0})
        return jnp.sum(yy * jnp.sin(jnp.arange(yy.size).reshape(yy.shape)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(variables["params"], x)
    g_new = jax.grad(loss_new, argnums=(0, 1))(variables["params"], x)
    ref_leaves = jax.tree.leaves(g_ref)
    new_leaves = jax.tree.leaves(g_new)
    global_scale = max(float(jnp.max(jnp.abs(b))) for b in ref_leaves)
    for a, b in zip(new_leaves, ref_leaves):
        leaf_scale = float(jnp.max(jnp.abs(b)))
        if leaf_scale < 1e-4 * global_scale:  # zero conv-bias grads
            assert float(jnp.max(jnp.abs(a))) < 1e-4 * global_scale
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5 * leaf_scale)


def test_1d_module_fused_train_matches_unfused():
    c = 10
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 11, c).astype(np.float32))
    variables = ResnetBlock1d(depth=c).init(
        jax.random.PRNGKey(2), x, train=True)
    y_ref, mut_ref = ResnetBlock1d(depth=c).apply(
        variables, x, train=True, mutable=["batch_stats"])
    y, mut = ResnetBlock1d(depth=c, fused_train=True).apply(
        variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    assert (jax.tree.structure(mut["batch_stats"])
            == jax.tree.structure(mut_ref["batch_stats"]))
