"""Experiment tracking (mag-equivalent) tests."""

import json
import os

import pytest

from freesound_classification_tpu.utils.config import (
    Config,
    config_name,
    flatten,
    unflatten,
)
from freesound_classification_tpu.utils.experiment import Experiment


CFG = {
    "network": {"num_conv_blocks": 5, "aggregation_type": "max"},
    "data": {"features": "mel_2048_1024_128", "_n_folds": 5},
    "train": {"learning_rate": 0.001, "_save_every": 2},
    "label": "2d_cnn",
}


class TestConfig:
    def test_attribute_access(self):
        c = Config(CFG)
        assert c.network.num_conv_blocks == 5
        assert c.data.features == "mel_2048_1024_128"
        with pytest.raises(AttributeError):
            _ = c.nope

    def test_flatten_roundtrip(self):
        flat = flatten(CFG)
        assert flat["network.num_conv_blocks"] == 5
        assert unflatten(flat) == json.loads(json.dumps(CFG))

    def test_name_skips_underscore_keys(self):
        name = config_name(CFG)
        assert "5" in name and "mel_2048_1024_128" in name
        # _n_folds / _save_every excluded
        assert name.count("-") == len(
            [k for k in flatten(CFG)
             if not any(p.startswith("_") for p in k.split("."))]) - 1
        assert "2" not in name.split("-")[name.split("-").index("max"):][0:0]

    def test_name_deterministic(self):
        assert config_name(CFG) == config_name(json.loads(json.dumps(CFG)))


class TestExperiment:
    def test_creates_and_persists(self, tmp_path):
        with Experiment(CFG, experiments_dir=str(tmp_path)) as exp:
            exp.register_directory("checkpoints")
            exp.register_directory("predictions")
            exp.register_result("fold0.metric", 0.83)
            exp.register_result("metric", 0.85)
            print("hello log")
        d = exp.experiment_dir
        assert os.path.isfile(os.path.join(d, "config.json"))
        assert os.path.isfile(os.path.join(d, "command"))
        assert os.path.isfile(os.path.join(d, "commit_hash"))
        assert os.path.isdir(os.path.join(d, "checkpoints"))
        with open(os.path.join(d, "results.json")) as f:
            results = json.load(f)
        assert results["fold0"]["metric"] == 0.83
        assert results["metric"] == 0.85
        with open(os.path.join(d, "log")) as f:
            assert "hello log" in f.read()

    def test_refuses_existing_without_resume(self, tmp_path):
        Experiment(CFG, experiments_dir=str(tmp_path))
        with pytest.raises(FileExistsError):
            Experiment(CFG, experiments_dir=str(tmp_path))
        # implicit resuming allowed (train_2d_cnn.py:232)
        Experiment(CFG, experiments_dir=str(tmp_path), implicit_resuming=True)

    def test_resume_from_reloads_config(self, tmp_path):
        exp = Experiment(CFG, experiments_dir=str(tmp_path))
        exp.register_result("fold1.metric", 0.7)
        resumed = Experiment(resume_from=exp.experiment_dir)
        assert resumed.config.network.num_conv_blocks == 5
        assert resumed.results.fold1.metric == 0.7

    def test_results_accumulate(self, tmp_path):
        exp = Experiment(CFG, experiments_dir=str(tmp_path))
        for k in range(3):
            exp.register_result(f"fold{k}.metric", 0.1 * k)
        r = json.load(open(os.path.join(exp.experiment_dir, "results.json")))
        assert set(r) == {"fold0", "fold1", "fold2"}
