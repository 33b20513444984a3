"""Vmapped fold-ensemble predictor vs sequential fold averaging."""

import numpy as np
import pytest

from freesound_classification_tpu.training.ensemble import EnsemblePredictor
from tests.test_engine import ListLoader, _make_engine, _synthetic_batches


class TestEnsemblePredictor:
    def test_matches_sequential_fold_average(self, tmp_path):
        train = ListLoader(_synthetic_batches(2, 8, seed=0))

        # train two "folds"
        engines = []
        for fold in (0, 1):
            eng = _make_engine(tmp_path)
            eng.fit_validate(train, train, epochs=1, fold=fold)
            eng.save_checkpoint(fold, "best_model")
            engines.append(eng)

        # sequential average (reference predict_2d_cnn semantics)
        seq = np.zeros((16, 4))
        for eng in engines:
            seq += eng.predict(train) / 2

        # vmapped stacked-fold predictor from the checkpoints
        ref = engines[0]
        paths = [str(tmp_path / f"fold_{k}" / "best_model") for k in (0, 1)]
        predictor = EnsemblePredictor.from_checkpoints(
            ref.model, ref.frontend, paths, ref.state)
        batched = np.concatenate([
            np.asarray(predictor.predict_batch(b["signal"], b["lengths"]))
            for b in train
        ])

        np.testing.assert_allclose(seq, batched, atol=2e-5)

    def test_predict_loader_restores_order(self, tmp_path):
        batches = _synthetic_batches(2, 8, seed=1)
        # give each batch an index field (loader contract)
        batches[0]["index"] = np.arange(8, 16)
        batches[1]["index"] = np.arange(0, 8)
        train = ListLoader(batches)

        eng = _make_engine(tmp_path)
        eng.fit_validate(train, train, epochs=1, fold=0)
        eng.save_checkpoint(0, "best_model")
        predictor = EnsemblePredictor.from_checkpoints(
            eng.model, eng.frontend,
            [str(tmp_path / "fold_0" / "best_model")], eng.state)
        ordered = predictor.predict_loader(train)
        direct = np.concatenate([
            np.asarray(predictor.predict_batch(b["signal"], b["lengths"]))
            for b in batches
        ])
        np.testing.assert_allclose(ordered[batches[0]["index"]], direct[:8],
                                   atol=1e-6)
        np.testing.assert_allclose(ordered[batches[1]["index"]], direct[8:],
                                   atol=1e-6)

    def test_tta_passes_average_on_vmapped_path(self, tmp_path):
        """n_tta > 1 stays on the stacked-fold program: pass 0 clean,
        passes > 0 perturbed on device; result = mean over passes."""
        import jax

        batches = _synthetic_batches(2, 8, seed=2)
        batches[0]["index"] = np.arange(0, 8)
        batches[1]["index"] = np.arange(8, 16)
        train = ListLoader(batches)

        eng = _make_engine(tmp_path)
        eng.fit_validate(train, train, epochs=1, fold=0)
        eng.save_checkpoint(0, "best_model")
        predictor = EnsemblePredictor.from_checkpoints(
            eng.model, eng.frontend,
            [str(tmp_path / "fold_0" / "best_model")], eng.state)

        calls = []

        def tta_fn(wave, lengths, key):
            calls.append(1)
            noise = 0.05 * jax.random.normal(key, wave.shape, wave.dtype)
            return wave + noise, lengths

        key = jax.random.PRNGKey(7)
        got = predictor.predict_loader(train, tta_fn=tta_fn, tta_key=key,
                                       n_tta=3)
        # manual reference: clean pass + two perturbed sweeps, same keys
        tta_jit = jax.jit(tta_fn)
        passes = []
        for t in range(3):
            chunks = []
            for bi, b in enumerate(batches):
                w = np.asarray(b["signal"], np.float32)
                ln = np.asarray(b["lengths"])
                if t > 0:
                    w, ln = tta_jit(w, ln,
                                    jax.random.fold_in(key, 100003 * t + bi))
                chunks.append(np.asarray(
                    predictor.predict_batch(w, ln)))
            passes.append(np.concatenate(chunks))
        want = np.mean(passes, axis=0)
        np.testing.assert_allclose(got, want, atol=2e-6)
        # tta_fn traced once (jitted), never applied on pass 0
        assert len(calls) >= 1

    def test_tta_requires_key_and_recaches_on_fn_change(self, tmp_path):
        """ADVICE r4: tta_fn + n_tta > 1 without tta_key raises up front
        (not an opaque fold_in failure mid-loop), and a second call with a
        DIFFERENT tta_fn must not reuse the first fn's jit cache."""
        import jax

        batches = _synthetic_batches(1, 8, seed=4)
        batches[0]["index"] = np.arange(8)
        train = ListLoader(batches)
        eng = _make_engine(tmp_path)
        eng.fit_validate(train, train, epochs=1, fold=0)
        eng.save_checkpoint(0, "best_model")
        predictor = EnsemblePredictor.from_checkpoints(
            eng.model, eng.frontend,
            [str(tmp_path / "fold_0" / "best_model")], eng.state)

        with pytest.raises(ValueError, match="tta_key"):
            predictor.predict_loader(
                train, tta_fn=lambda w, l, k: (w, l), n_tta=2)

        key = jax.random.PRNGKey(0)
        # fn A: silences the perturbed pass entirely -> pass-1 preds are
        # the model's silence response; fn B: identity -> pass-1 == clean
        silence = lambda w, l, k: (w * 0.0, l)  # noqa: E731
        identity = lambda w, l, k: (w, l)  # noqa: E731
        got_silence = predictor.predict_loader(
            train, tta_fn=silence, tta_key=key, n_tta=2)
        got_identity = predictor.predict_loader(
            train, tta_fn=identity, tta_key=key, n_tta=2)
        clean = predictor.predict_loader(train)
        # identity-TTA must equal the clean prediction (both passes clean);
        # with the stale cache bug it would replay fn A's silencing
        np.testing.assert_allclose(got_identity, clean, atol=1e-6)
        assert not np.allclose(got_silence, clean, atol=1e-4)

    def test_single_pass_unchanged_by_tta_args(self, tmp_path):
        batches = _synthetic_batches(1, 8, seed=3)
        batches[0]["index"] = np.arange(8)
        train = ListLoader(batches)
        eng = _make_engine(tmp_path)
        eng.fit_validate(train, train, epochs=1, fold=0)
        eng.save_checkpoint(0, "best_model")
        predictor = EnsemblePredictor.from_checkpoints(
            eng.model, eng.frontend,
            [str(tmp_path / "fold_0" / "best_model")], eng.state)
        import jax

        a = predictor.predict_loader(train)
        b = predictor.predict_loader(
            train, tta_fn=lambda w, l, k: (w * 0.0, l),
            tta_key=jax.random.PRNGKey(0), n_tta=1)
        np.testing.assert_allclose(a, b, atol=0)
