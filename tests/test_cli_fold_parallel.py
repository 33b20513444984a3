"""--fold_parallel CLI path: same artifacts as sequential training."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.test_cli_other_models import _train_flags, synth  # noqa: F401


class TestFoldParallelCLI:
    def test_parallel_folds_produce_full_artifacts(self, synth,  # noqa: F811
                                                   tmp_path):
        from freesound_classification_tpu.cli import train_2d_cnn

        train_2d_cnn.main(_train_flags(synth, tmp_path, [
            "--features", "mel_512_256_32",
            "--aggregation_type", "max",
            "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
            "--conv_base_depth", "8", "--label", "foldpar",
            "--folds", "0", "1",
            "--fold_parallel",
        ]))
        exp = os.path.join(str(tmp_path), os.listdir(tmp_path)[0])
        results = json.load(open(os.path.join(exp, "results.json")))
        assert "metric" in results  # global OOF computed
        for fold in (0, 1):
            assert np.isfinite(results[f"fold{fold}"]["metric"])
            assert os.path.isdir(os.path.join(
                exp, "checkpoints", f"fold_{fold}", "best_model"))
            assert os.path.isdir(os.path.join(
                exp, "checkpoints", f"fold_{fold}", "final_model"))
            for stem in ("val_preds", "test_preds"):
                path = os.path.join(
                    exp, "predictions", f"{stem}_fold_{fold}.csv")
                assert os.path.isfile(path)
                df = pd.read_csv(path)
                vals = df.drop(columns="fname").values
                assert ((vals >= 0) & (vals <= 1)).all()
        sub = pd.read_csv(os.path.join(exp, "predictions", "submission.csv"))
        assert len(sub) == 4

    def test_production_five_folds_use_fold_local_mesh(self, synth,  # noqa: F811
                                                       tmp_path):
        """The reference's production fold count (5) on the 8-device CI
        mesh exercises the fold-LOCAL layout end-to-end through the real
        CLI (make_fold_dp_mesh auto picks it when no fold x dp tiling
        covers the devices; unit coverage in test_multifold.py)."""
        from freesound_classification_tpu.cli import train_2d_cnn
        from freesound_classification_tpu.training.multifold import (
            make_fold_dp_mesh,
        )

        # the CLI builds this same mesh; pin the expectation here
        mesh = make_fold_dp_mesh(5)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 8}

        train_2d_cnn.main(_train_flags(synth, tmp_path, [
            "--features", "mel_512_256_32",
            "--aggregation_type", "max",
            "--num_conv_blocks", "2", "--start_deep_supervision_on", "0",
            "--conv_base_depth", "8", "--label", "foldlocal",
            "--n_folds", "5", "--folds", "0", "1", "2", "3", "4",
            "--batch_size", "4",
            "--fold_parallel",
        ]))
        exp = os.path.join(str(tmp_path), os.listdir(tmp_path)[0])
        results = json.load(open(os.path.join(exp, "results.json")))
        assert "metric" in results
        for fold in range(5):
            assert np.isfinite(results[f"fold{fold}"]["metric"])
            assert os.path.isdir(os.path.join(
                exp, "checkpoints", f"fold_{fold}", "best_model"))
