"""Pseudolabeling + linear-blend CLI logic tests."""

import numpy as np
import pandas as pd
import pytest

from freesound_classification_tpu.cli.relabel_noisy_data import (
    binarize,
    binary_to_labels,
    find_threshold,
    merge_labels,
    relabel,
    score_samples,
)


def _dfs(n=40, c=4, seed=0):
    rng = np.random.RandomState(seed)
    classes = ["A", "B", "C", "D"][:c]
    true = (rng.rand(n, c) < 0.3)
    true[true.sum(1) == 0, 0] = True
    labels = [",".join(np.array(classes)[row]) for row in true]
    noisy_df = pd.DataFrame({
        "fname": [f"f{i}.wav" for i in range(n)], "labels": labels})
    # predictions: mostly agree with labels + noise
    probs = true * 0.8 + rng.rand(n, c) * 0.3
    pred_df = pd.DataFrame(probs, columns=classes)
    pred_df["fname"] = noisy_df.fname
    return noisy_df, pred_df, true, classes


class TestThreshold:
    def test_find_threshold_hits_target(self):
        rng = np.random.RandomState(1)
        probs = rng.rand(100, 10)
        for target in (1.0, 2.0, 5.0):
            t = find_threshold(probs, target)
            got = (probs > t).sum(-1).mean()
            assert abs(got - target) < 0.5


class TestScoring:
    def test_perfect_ranking_scores_one(self):
        y_true = np.array([[1, 0, 0], [0, 1, 0]], dtype=float)
        y_score = np.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.2]])
        np.testing.assert_allclose(score_samples(y_true, y_score), [1.0, 1.0])

    def test_matches_sklearn_lrap_per_sample(self):
        from sklearn.metrics import label_ranking_average_precision_score

        rng = np.random.RandomState(2)
        y_true = (rng.rand(20, 8) < 0.3).astype(float)
        y_true[y_true.sum(1) == 0, 0] = 1
        y_score = rng.rand(20, 8)
        ours = score_samples(y_true, y_score)
        for i in range(20):
            expected = label_ranking_average_precision_score(
                y_true[i:i + 1], y_score[i:i + 1])
            assert ours[i] == pytest.approx(expected, rel=1e-9)


class TestModes:
    def test_scoring_keeps_topk(self):
        noisy_df, pred_df, _, _ = _dfs()
        out = relabel(noisy_df, pred_df, "scoring_10")
        assert len(out) == 10

    def test_fullmatch_keeps_exact_matches(self):
        noisy_df, pred_df, true, classes = _dfs()
        out = relabel(noisy_df, pred_df, "fullmatch_1.5")
        assert 0 < len(out) <= len(noisy_df)

    def test_relabelall_replaces_labels(self):
        noisy_df, pred_df, _, classes = _dfs()
        out = relabel(noisy_df, pred_df, "relabelall_1.5")
        assert (out.labels != "").all()
        for item in out.labels:
            for lab in str(item).split(","):
                assert lab in classes

    def test_merge_unions_labels(self):
        merged = merge_labels(["A,B", "C"], ["B,C", ""])
        assert merged == ["A,B,C", "C"]

    def test_binarize_roundtrip(self):
        classes = ["A", "B", "C"]
        binary = np.array([[1, 0, 1], [0, 1, 0]], dtype=np.float32)
        labels = binary_to_labels(binary, classes)
        assert labels == ["A,C", "B"]
        np.testing.assert_array_equal(binarize(labels, classes), binary)

    def test_unknown_mode_raises(self):
        noisy_df, pred_df, _, _ = _dfs()
        with pytest.raises(ValueError):
            relabel(noisy_df, pred_df, "nonsense_1")


class TestLinearBlend:
    def test_optimize_prefers_better_model(self):
        from freesound_classification_tpu.cli.linear_blend import (
            optimize_blend,
        )

        rng = np.random.RandomState(3)
        n, c = 60, 6
        truth = (rng.rand(n, c) < 0.25).astype(np.float32)
        truth[truth.sum(1) == 0, 0] = 1
        good = truth * 0.9 + rng.rand(n, c) * 0.1
        bad = rng.rand(n, c)
        alphas, score = optimize_blend([good, bad], truth)
        assert alphas[0] > alphas[1]
        assert score > 0.8

    def test_blend_cli_end_to_end(self, tmp_path):
        from freesound_classification_tpu.cli import linear_blend

        rng = np.random.RandomState(4)
        classes = ["A", "B", "C"]
        n = 30
        truth = (rng.rand(n, 3) < 0.4).astype(np.float32)
        truth[truth.sum(1) == 0, 0] = 1
        fnames = [f"f{i}.wav" for i in range(n)]
        train_df = pd.DataFrame({
            "fname": fnames,
            "labels": [",".join(np.array(classes)[row > 0]) for row in truth],
        })
        train_df.to_csv(tmp_path / "train.csv", index=False)

        for e, noise in (("exp1", 0.1), ("exp2", 0.8)):
            pred_dir = tmp_path / e / "predictions"
            pred_dir.mkdir(parents=True)
            for fold in (0, 1):
                half = slice(fold * n // 2, (fold + 1) * n // 2)
                probs = truth[half] * (1 - noise) + rng.rand(n // 2, 3) * noise
                df = pd.DataFrame(probs, columns=classes)
                df["fname"] = fnames[half]
                df.to_csv(pred_dir / f"val_preds_fold_{fold}.csv",
                          index=False)
                tprobs = rng.rand(5, 3)
                tdf = pd.DataFrame(tprobs, columns=classes)
                tdf["fname"] = [f"t{i}.wav" for i in range(5)]
                tdf.to_csv(pred_dir / f"test_preds_fold_{fold}.csv",
                           index=False)

        out_csv = tmp_path / "blend.csv"
        linear_blend.main([
            "--experiments", str(tmp_path / "exp1"), str(tmp_path / "exp2"),
            "--train_df", str(tmp_path / "train.csv"),
            "--output_df", str(out_csv),
        ])
        out = pd.read_csv(out_csv)
        assert list(out.columns) == ["fname"] + classes
        assert len(out) == 5
