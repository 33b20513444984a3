"""APC / CPC self-supervised model tests."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.models.apc import APCModel
from freesound_classification_tpu.models.cpc import CPCModel


def _feats(b=2, t=40, f=16, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(b, t, f).astype("f4")),
            jnp.asarray([t, t // 2]))


class TestAPC:
    def test_shapes_and_losses(self):
        feats, lengths = _feats()
        model = APCModel(rnn_size=8, rnn_layers=2, prediction_steps=3)
        v = model.init({"params": jax.random.PRNGKey(0)}, feats, lengths)
        out = model.apply(v, feats, lengths)
        assert len(out["loss_terms"]) == 3
        for lt in out["loss_terms"]:
            assert np.isfinite(float(lt)) and float(lt) > 0
        assert out["output"].shape == (2, 40, 8)

    def test_loss_masked_against_padding(self):
        feats, _ = _feats(b=1, t=30, f=8, seed=1)
        model = APCModel(rnn_size=8, rnn_layers=1, prediction_steps=1)
        lengths = jnp.asarray([20])
        v = model.init({"params": jax.random.PRNGKey(0)}, feats, lengths)
        out_a = model.apply(v, feats, lengths)
        # garbage in the padding must not change the loss
        feats_b = feats.at[:, 20:, :].set(99.0)
        out_b = model.apply(v, feats_b, lengths)
        np.testing.assert_allclose(
            float(out_a["loss_terms"][0]), float(out_b["loss_terms"][0]),
            rtol=1e-5)

    def test_trains_with_engine(self):
        from freesound_classification_tpu.models.frontend import Frontend
        from freesound_classification_tpu.training.engine import Engine

        model = APCModel(rnn_size=8, rnn_layers=1, prediction_steps=2)
        frontend = Frontend("stft_256_128", "1d", sr=8000)
        cfg = types.SimpleNamespace(
            optimizer="adam", learning_rate=1e-3,
            scheduler="1cycle_0.0001_0.001", weight_decay=0.0,
            accumulation_steps=1, epochs=1,
            switch_off_augmentations_on=100, _save_every=1000)
        engine = Engine(model, frontend, cfg, self_supervised=True)
        rng = np.random.RandomState(0)
        batch = {
            "signal": rng.randn(8, 4096).astype("f4") * 0.1,
            "lengths": np.full(8, 4096, "i4"),
            "labels": np.eye(8, 4, dtype="f4"),
            "is_noisy": np.zeros(8, "f4"),
        }
        scores = engine.fit_validate([batch, batch], [batch], epochs=2, fold=0)
        assert np.isfinite(scores[-1])
        # score = -loss; training should not diverge
        assert scores[-1] >= scores[0] - 1.0


class TestCPC:
    def test_shapes_and_losses(self):
        feats, lengths = _feats(t=64)
        model = CPCModel(n_encoder_layers=2, conv_base_depth=8,
                         context_size=8, prediction_steps=2)
        v = model.init({"params": jax.random.PRNGKey(0)}, feats, lengths)
        out = model.apply(v, feats, lengths)
        assert len(out["loss_terms"]) == 2
        for lt in out["loss_terms"]:
            assert np.isfinite(float(lt)) and float(lt) > 0
        assert out["z"].shape[0] == 2
        assert out["output"].shape[-1] == 8

    def test_causal_conv_is_causal(self):
        from freesound_classification_tpu.models.cpc import CausalConv1d

        x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 4).astype("f4"))
        m = CausalConv1d(8, kernel_size=3, stride=2)
        v = m.init(jax.random.PRNGKey(0), x)
        base = m.apply(v, x)
        # perturbing the future must not change earlier outputs
        x2 = x.at[:, 20:, :].set(5.0)
        pert = m.apply(v, x2)
        # output step s consumes inputs up to index 2s; steps with 2s < 20
        # are untouched
        safe = 20 // 2 - 1
        np.testing.assert_allclose(base[:, :safe], pert[:, :safe], atol=1e-6)

    def test_loss_decreases_on_fixed_batch(self):
        import optax

        feats, lengths = _feats(b=4, t=64, f=8, seed=2)
        lengths = jnp.asarray([64, 64, 64, 64])
        model = CPCModel(n_encoder_layers=2, conv_base_depth=8,
                         context_size=8, prediction_steps=1)
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats,
                               lengths, train=False)
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, feats, lengths,
                    train=True, mutable=["batch_stats"])
                return sum(out["loss_terms"]), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, \
                opt_state, loss

        losses = []
        for _ in range(20):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses
