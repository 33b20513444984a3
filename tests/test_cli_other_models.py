"""Smoke tests for the non-2d train CLIs: hierarchical (1d STFT), backbone
(resnet18), APC pretraining, finetune warm-start. Tiny configs on the CPU
mesh — these verify wiring, artifacts and numerics, not accuracy."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from freesound_classification_tpu.data import audio_io

SR = 44100
CLASSES = ["Bark", "Meow", "Siren"]


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth2")
    (root / "train").mkdir()
    (root / "test").mkdir()
    rng = np.random.RandomState(0)
    freqs = {"Bark": 250.0, "Meow": 1200.0, "Siren": 4000.0}
    rows = []
    for i in range(16):
        label = CLASSES[i % 3]
        n = rng.randint(int(0.6 * SR), int(0.95 * SR))
        t = np.arange(n) / SR
        audio_io.write_wav(
            str(root / "train" / f"t{i}.wav"),
            0.3 * np.sin(2 * np.pi * freqs[label] * t) + 0.01 * rng.randn(n),
            SR)
        rows.append({"fname": f"t{i}.wav", "labels": label})
    pd.DataFrame(rows).to_csv(root / "train.csv", index=False)
    test_rows = []
    for i in range(4):
        audio_io.write_wav(
            str(root / "test" / f"s{i}.wav"),
            0.2 * np.sin(2 * np.pi * 500 * np.arange(SR // 2) / SR), SR)
        test_rows.append({"fname": f"s{i}.wav", "labels": ""})
    pd.DataFrame(test_rows).to_csv(root / "sample_submission.csv",
                                   index=False)
    cm = {c: i for i, c in enumerate(CLASSES)}
    with open(root / "classmap.json", "w") as f:
        json.dump(cm, f)
    return root


def _train_flags(root, exp_dir, extra):
    return [
        "--train_df", str(root / "train.csv"),
        "--train_data_dir", str(root / "train"),
        "--test_data_dir", str(root / "test"),
        "--sample_submission", str(root / "sample_submission.csv"),
        "--classmap", str(root / "classmap.json"),
        "--experiments_dir", str(exp_dir),
        "--device", "cpu", "--optimizer", "adam", "--lr", "0.003",
        "--scheduler", "1cycle_0.0003_0.003",
        "--batch_size", "8", "--epochs", "1",
        "--n_folds", "2", "--folds", "0",
        "--max_audio_length", "1", "--num_workers", "0",
    ] + extra


def _only_experiment(exp_dir):
    names = os.listdir(exp_dir)
    assert len(names) == 1
    return os.path.join(str(exp_dir), names[0])


class TestHierarchicalCLI:
    def test_trains_on_stft_features(self, synth, tmp_path):
        from freesound_classification_tpu.cli import train_hierarchical_cnn

        train_hierarchical_cnn.main(_train_flags(synth, tmp_path, [
            "--features", "stft_512_256",
            "--aggregation_type", "max",
            "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
            "--conv_base_depth", "8", "--label", "hier",
        ]))
        exp = _only_experiment(tmp_path)
        results = json.load(open(os.path.join(exp, "results.json")))
        assert np.isfinite(results["fold0"]["metric"])
        assert os.path.isfile(os.path.join(
            exp, "predictions", "test_preds_fold_0.csv"))


class TestBackboneCLI:
    def test_trains_resnet18(self, synth, tmp_path):
        from freesound_classification_tpu.cli import train_backbone_cnn

        train_backbone_cnn.main(_train_flags(synth, tmp_path, [
            "--features", "mel_512_256_64",
            "--aggregation_type", "max",
            "--backbone", "resnet18", "--label", "bb",
        ]))
        exp = _only_experiment(tmp_path)
        cfg = json.load(open(os.path.join(exp, "config.json")))
        assert cfg["network"]["backbone"] == "resnet18"
        results = json.load(open(os.path.join(exp, "results.json")))
        assert np.isfinite(results["fold0"]["metric"])


class TestAPCCLI:
    def test_pretrains(self, synth, tmp_path):
        from freesound_classification_tpu.cli import train_apc

        train_apc.main([
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
            "--rnn_size", "8", "--rnn_layers", "1",
            "--prediction_steps", "2", "--label", "apc",
        ])
        exp = _only_experiment(tmp_path)
        results = json.load(open(os.path.join(exp, "results.json")))
        # score = -loss for SSL models
        assert results["fold0"]["metric"] < 0
        assert os.path.isdir(os.path.join(
            exp, "checkpoints", "fold_0", "best_model"))


class TestFinetuneCLI:
    def test_warm_starts_from_pretrained(self, synth, tmp_path):
        from freesound_classification_tpu.cli import (
            finetune_hierarchical_cnn,
            train_hierarchical_cnn,
        )

        pre_dir = tmp_path / "pre"
        pre_dir.mkdir()
        train_hierarchical_cnn.main(_train_flags(synth, pre_dir, [
            "--features", "stft_512_256",
            "--aggregation_type", "max",
            "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
            "--conv_base_depth", "8", "--label", "pre",
        ]))
        pre_exp = _only_experiment(pre_dir)

        ft_dir = tmp_path / "ft"
        ft_dir.mkdir()
        finetune_hierarchical_cnn.main(_train_flags(synth, ft_dir, [
            "--features", "ignored_overridden",
            "--aggregation_type", "max",
            "--pretrained_model", pre_exp,
            "--pretrained_fold", "0", "--label", "ft",
        ]))
        ft_exp = _only_experiment(ft_dir)
        results = json.load(open(os.path.join(ft_exp, "results.json")))
        assert np.isfinite(results["fold0"]["metric"])
