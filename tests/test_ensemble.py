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
