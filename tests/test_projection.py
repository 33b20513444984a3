"""Representation diagnostics (KNN probe + TSNE image)."""

import numpy as np
import pytest

from freesound_classification_tpu.utils.projection import plot_projection


class TestPlotProjection:
    def test_knn_probe_on_separable_representations(self):
        rng = np.random.RandomState(0)
        vectors, labels = [], []
        for i in range(60):
            cls = i % 3
            # per-frame representations clustered by class
            frames = rng.randn(10, 8) * 0.1 + cls * 3.0
            vectors.append(frames)
            onehot = np.zeros(3, np.float32)
            onehot[cls] = 1
            labels.append(onehot)
        image, score = plot_projection(vectors, np.asarray(labels),
                                       frames_per_example=3)
        assert score > 0.9  # trivially separable
        # reference skips multi-label clips (ops/utils.py:44-45)
        labels2 = [l.copy() for l in labels]
        labels2[0][:] = 1  # multi-label
        _, score2 = plot_projection(vectors, np.asarray(labels2),
                                    frames_per_example=3)
        assert np.isfinite(score2)

    def test_too_few_samples_returns_nan(self):
        image, score = plot_projection(
            [np.zeros((2, 4))], np.asarray([[1.0, 0.0]]))
        assert image is None and np.isnan(score)
