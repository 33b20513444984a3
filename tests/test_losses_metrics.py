"""Losses vs torch reference formulas; lwlrap vs sklearn."""

import jax.numpy as jnp
import numpy as np
import pytest

from freesound_classification_tpu.ops import losses, metrics


def _rand_batch(seed=0, b=16, c=80):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, c).astype(np.float32) * 2
    targets = (rng.rand(b, c) < 0.05).astype(np.float32)
    targets[0] = 0  # a zero-label row
    targets[1] = 1  # an all-label row
    return logits, targets


class TestLsep:
    def test_naive_matches_torch_formula(self):
        torch = pytest.importorskip("torch")
        logits, targets = _rand_batch(0)
        lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
        differences = lt.unsqueeze(1) - lt.unsqueeze(2)
        where_different = (tt.unsqueeze(1) < tt.unsqueeze(2)).float()
        exps = differences.exp() * where_different
        expected = torch.log(1 + exps.sum(2).sum(1))
        ours = losses.lsep_loss(jnp.asarray(logits), jnp.asarray(targets),
                                average=False)
        np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_stable_equals_naive_in_range(self):
        logits, targets = _rand_batch(1)
        a = np.asarray(losses.lsep_loss(jnp.asarray(logits), jnp.asarray(targets)))
        b = np.asarray(
            losses.lsep_loss_stable(jnp.asarray(logits), jnp.asarray(targets)))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_stable_survives_large_logits(self):
        logits = jnp.asarray([[100.0, -100.0, 50.0]])
        targets = jnp.asarray([[0.0, 1.0, 0.0]])
        v = losses.lsep_loss_stable(logits, targets)
        assert np.isfinite(np.asarray(v))
        # exp(s_neg - s_pos) = exp(200) overflows the naive form
        assert np.asarray(v) == pytest.approx(200.0, rel=1e-3)

    def test_zero_when_perfectly_ranked(self):
        logits = jnp.asarray([[10.0, -10.0]])
        targets = jnp.asarray([[1.0, 0.0]])
        v = np.asarray(losses.lsep_loss_stable(logits, targets))
        assert v == pytest.approx(np.log1p(np.exp(-20.0)), abs=1e-6)

    def test_grad_finite(self):
        import jax

        logits, targets = _rand_batch(2)
        g = jax.grad(
            lambda l: losses.lsep_loss_stable(l, jnp.asarray(targets))
        )(jnp.asarray(logits))
        assert np.isfinite(np.asarray(g)).all()


class TestBceFocal:
    def test_bce_matches_torch(self):
        torch = pytest.importorskip("torch")
        logits, targets = _rand_batch(3)
        expected = torch.nn.functional.binary_cross_entropy(
            torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(targets)
        ).item()
        ours = float(
            losses.binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
        assert ours == pytest.approx(expected, rel=1e-5)

    def test_focal_matches_reference_formula(self):
        torch = pytest.importorskip("torch")
        logits, targets = _rand_batch(4)
        inp = torch.sigmoid(torch.from_numpy(logits))
        tt = torch.from_numpy(targets)
        eps = 1e-7
        prob_true = inp * tt + (1 - inp) * (1 - tt)
        prob_true = torch.clamp(prob_true, eps, 1 - eps)
        expected = (-(1 - prob_true).pow(2.0) * prob_true.log()).mean().item()
        ours = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
        assert ours == pytest.approx(expected, rel=1e-4)


class TestLwlrap:
    def test_matches_sklearn(self):
        sklearn_metrics = pytest.importorskip("sklearn.metrics")
        rng = np.random.RandomState(5)
        truth = (rng.rand(64, 80) < 0.04).astype(np.float32)
        truth[:3] = 0
        scores = rng.rand(64, 80).astype(np.float32)

        sample_weight = np.sum(truth > 0, axis=1)
        nz = np.flatnonzero(sample_weight > 0)
        expected = sklearn_metrics.label_ranking_average_precision_score(
            truth[nz] > 0, scores[nz], sample_weight=sample_weight[nz]
        )
        ours = metrics.lwlrap(truth, scores)
        assert ours == pytest.approx(expected, rel=1e-9)

    def test_jax_matches_numpy(self):
        rng = np.random.RandomState(6)
        truth = (rng.rand(32, 80) < 0.05).astype(np.float32)
        scores = rng.randn(32, 80).astype(np.float32)
        a = metrics.lwlrap(truth, scores)
        b = float(metrics.lwlrap_jax(jnp.asarray(truth), jnp.asarray(scores)))
        assert b == pytest.approx(a, rel=1e-5)

    def test_jax_with_ties(self):
        truth = np.array([[1, 0, 1, 0]], dtype=np.float32)
        scores = np.array([[0.5, 0.5, 0.5, 0.1]], dtype=np.float32)
        a = metrics.lwlrap(truth, scores)
        b = float(metrics.lwlrap_jax(jnp.asarray(truth), jnp.asarray(scores)))
        assert b == pytest.approx(a, rel=1e-6)

    def test_perfect_ranking_is_one(self):
        truth = np.eye(8, dtype=np.float32)
        assert metrics.lwlrap(truth, truth) == pytest.approx(1.0)
        assert float(
            metrics.lwlrap_jax(jnp.asarray(truth), jnp.asarray(truth))
        ) == pytest.approx(1.0)

    def test_all_zero_labels(self):
        truth = np.zeros((4, 8), dtype=np.float32)
        scores = np.random.RandomState(7).rand(4, 8).astype(np.float32)
        assert metrics.lwlrap(truth, scores) == 0.0
        assert float(metrics.lwlrap_jax(jnp.asarray(truth), jnp.asarray(scores))) == 0.0

    def test_per_class_decomposition(self):
        rng = np.random.RandomState(8)
        truth = (rng.rand(48, 20) < 0.1).astype(np.float32)
        scores = rng.rand(48, 20).astype(np.float32)
        per_class, weight = metrics.per_class_lwlrap(truth, scores)
        overall = metrics.lwlrap(truth, scores)
        assert float(np.sum(per_class * weight)) == pytest.approx(overall, rel=1e-9)


class TestSchedules:
    def test_onecycle_matches_reference_shape(self):
        from freesound_classification_tpu.ops.schedules import onecycle_schedule

        max_steps, min_lr, max_lr = 1000, 1e-4, 5e-3
        sched = onecycle_schedule(min_lr, max_lr, max_steps)
        mid = int(round(max_steps * 0.3))
        assert float(sched(0)) == pytest.approx(min_lr)
        assert float(sched(mid)) == pytest.approx(max_lr, rel=1e-5)
        # f32 cancellation at the tiny final lr -> loose relative tolerance
        assert float(sched(max_steps)) == pytest.approx(min_lr / 1e3, rel=2e-2)
        # linear warmup midpoint
        assert float(sched(mid // 2)) == pytest.approx(
            min_lr + (max_lr - min_lr) * ((mid // 2) / mid), rel=1e-5)

    def test_steplr(self):
        from freesound_classification_tpu.ops.schedules import steplr_schedule

        sched = steplr_schedule(0.1, step_size=2, gamma=0.5, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(19)) == pytest.approx(0.1)   # epoch 1
        assert float(sched(20)) == pytest.approx(0.05)  # epoch 2
        assert float(sched(45)) == pytest.approx(0.025)  # epoch 4

    def test_descriptor_dispatch(self):
        from freesound_classification_tpu.ops.schedules import make_schedule

        s = make_schedule("1cycle_0.0001_0.005", 0.1, 100, 10)
        assert float(s(0)) == pytest.approx(1e-4)
        s2 = make_schedule("steplr_1_0.5", 0.1, 100, 10)
        assert float(s2(10)) == pytest.approx(0.05)
        with pytest.raises(ValueError):
            make_schedule("cosine_1", 0.1, 100, 10)
