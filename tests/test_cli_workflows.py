"""Workflow CLI smokes: evaluate, relabel round-trip, CPC pretraining,
adversarial validation — the reference's full noisy-data workflow
(SURVEY.md §3.4) on synthetic data."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.test_cli_other_models import _train_flags, synth  # noqa: F401


@pytest.fixture(scope="module")
def trained(synth, tmp_path_factory):  # noqa: F811
    from freesound_classification_tpu.cli import train_2d_cnn

    exp_dir = tmp_path_factory.mktemp("exp")
    train_2d_cnn.main(_train_flags(synth, exp_dir, [
        "--features", "mel_512_256_32",
        "--aggregation_type", "max",
        "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
        "--conv_base_depth", "8", "--label", "wf",
        "--folds", "0", "1",
    ]))
    names = os.listdir(exp_dir)
    return os.path.join(str(exp_dir), names[0])


class TestEvaluateCLI:
    def test_recomputes_oof_metric(self, synth, trained, capsys):  # noqa: F811
        from freesound_classification_tpu.cli import evaluate_2d_cnn

        evaluate_2d_cnn.main([
            "--experiment", trained,
            "--train_df", str(synth / "train.csv"),
            "--train_data_dir", str(synth / "train"),
            "--classmap", str(synth / "classmap.json"),
            "--batch_size", "8", "--num_workers", "0",
        ])
        out = capsys.readouterr().out
        assert "overall OOF lwlrap" in out


class TestPseudolabelRoundTrip:
    def test_predict_relabel_retrain(self, synth, trained,  # noqa: F811
                                     tmp_path):
        """Reference noisy-data workflow (SURVEY §3.4): predict over a
        'noisy' df -> relabel top-k by agreement -> retrain with
        --noisy_train_df."""
        from freesound_classification_tpu.cli import (
            predict_2d_cnn,
            relabel_noisy_data,
            train_2d_cnn,
        )

        # treat the train set as "noisy": predict, then relabel
        noisy_preds = str(tmp_path / "noisy_preds.csv")
        predict_2d_cnn.main([
            "--experiment", trained,
            "--test_df", str(synth / "train.csv"),
            "--test_data_dir", str(synth / "train"),
            "--classmap", str(synth / "classmap.json"),
            "--output_df", noisy_preds,
            "--batch_size", "8", "--num_workers", "0",
        ])
        relabeled = str(tmp_path / "relabeled.csv")
        relabel_noisy_data.main([
            "--noisy_df", str(synth / "train.csv"),
            "--noisy_predictions_df", noisy_preds,
            "--mode", "scoring_8",
            "--output_df", relabeled,
        ])
        df = pd.read_csv(relabeled)
        assert len(df) == 8
        assert set(df.columns) == {"fname", "labels"}

        # retrain with the relabeled rows as the noisy set
        exp2 = tmp_path / "exp2"
        exp2.mkdir()
        train_2d_cnn.main(_train_flags(synth, exp2, [
            "--features", "mel_512_256_32",
            "--aggregation_type", "max",
            "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
            "--conv_base_depth", "8", "--label", "withnoisy",
            "--noisy_train_df", relabeled,
            "--noisy_train_data_dir", str(synth / "train"),
        ]))
        exp_path = os.path.join(str(exp2), os.listdir(exp2)[0])
        results = json.load(open(os.path.join(exp_path, "results.json")))
        assert np.isfinite(results["fold0"]["metric"])


class TestCPCCLI:
    def test_pretrains(self, synth, tmp_path):  # noqa: F811
        from freesound_classification_tpu.cli import train_cpc

        train_cpc.main([
            "--train_df", str(synth / "train.csv"),
            "--train_data_dir", str(synth / "train"),
            "--classmap", str(synth / "classmap.json"),
            "--experiments_dir", str(tmp_path),
            "--device", "cpu", "--optimizer", "adam", "--lr", "0.001",
            "--scheduler", "1cycle_0.0001_0.001",
            "--batch_size", "8", "--epochs", "1",
            "--n_folds", "2", "--folds", "0",
            "--max_audio_length", "1", "--num_workers", "0",
            "--features", "stft_512_256",
            "--n_encoder_layers", "2", "--conv_base_depth", "8",
            "--context_size", "8", "--prediction_steps", "2",
            "--label", "cpc",
        ])
        exp = os.path.join(str(tmp_path), os.listdir(tmp_path)[0])
        results = json.load(open(os.path.join(exp, "results.json")))
        assert results["fold0"]["metric"] < 0  # -loss


class TestAdversarialCLI:
    def test_reports_auc(self, synth, tmp_path, capsys):  # noqa: F811
        from freesound_classification_tpu.cli import adversarial_test

        adversarial_test.main([
            "--train_df", str(synth / "train.csv"),
            "--train_data_dir", str(synth / "train"),
            "--test_df", str(synth / "sample_submission.csv"),
            "--test_data_dir", str(synth / "test"),
            "--classmap", str(synth / "classmap.json"),
            "--features", "stft_512_256",
            "--batch_size", "8", "--epochs", "1",
            "--max_audio_length", "1", "--num_workers", "0",
            "--val_size", "0.3", "--batches_to_save", "0",
            "--plots_dir", str(tmp_path / "plots"),
            "--device", "cpu",
        ])
        out = capsys.readouterr().out
        assert "AUC:" in out
        assert "classname" in out  # per-class domain scores table
