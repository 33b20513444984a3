"""Representation diagnostics: KNN probe accuracy + TSNE projection image
(reference ops/utils.py:39-82 ``plot_projection``, used by APC/CPC eval).

Takes per-frame representations of single-label clips, samples a few frames
per clip, fits a 5-NN probe (accuracy printed) and renders a TSNE scatter to
a PNG for tensorboard.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def plot_projection(vectors, labels, frames_per_example: int = 3,
                    newline: bool = False, seed: int = 0):
    """(image array or None, knn accuracy). Mirrors reference semantics:
    skip multi-label clips, sample frames, standardize, 5-NN accuracy,
    TSNE scatter."""
    from sklearn.manifold import TSNE
    from sklearn.metrics import accuracy_score
    from sklearn.model_selection import train_test_split
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.preprocessing import StandardScaler

    rng = np.random.RandomState(seed)
    representations, classes = [], []
    for sample, label in zip(vectors, labels):
        if label.sum() != 1:
            continue
        n = len(sample)
        choices = rng.choice(
            np.arange(n), replace=False, size=min(frames_per_example, n))
        representations.extend(np.asarray(sample)[choices])
        classes.extend([int(np.argmax(label))] * len(choices))

    if len(representations) < 10:
        return None, float("nan")

    representations = np.asarray(representations)
    X_train, X_valid, y_train, y_valid = train_test_split(
        representations, classes, shuffle=False, test_size=0.2)
    scaler = StandardScaler().fit(X_train)
    model = KNeighborsClassifier(n_neighbors=5)
    model.fit(scaler.transform(X_train), y_train)
    score = accuracy_score(y_valid, model.predict(scaler.transform(X_valid)))
    if newline:
        print()
    print(f"Classification accuracy: {score:.4f}")

    image = None
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        embeddings = TSNE().fit_transform(representations)
        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(111)
        ax.scatter(embeddings[:, 0], embeddings[:, 1], c=classes, s=10)
        fig.canvas.draw()
        image = np.asarray(fig.canvas.renderer.buffer_rgba())
        plt.close(fig)
    except Exception as e:
        print(f"TSNE plot skipped: {e}")
    return image, float(score)


def projection_summary(engine, loader, summaries_dir: str, fold: int,
                       step: int = 0) -> Optional[float]:
    """Collect representations over a loader and write the projection image
    + KNN accuracy (reference apc.py:226-231 behavior)."""
    import numpy as np

    all_outputs, all_labels = [], []
    for batch in loader:
        device_batch, n = engine._prep_batch(batch)
        inputs, fl = engine.frontend(
            device_batch["signal"], device_batch["lengths"])
        out = engine.model.apply(
            {"params": engine.state.params,
             "batch_stats": engine.state.batch_stats},
            inputs, fl, train=False)
        if "output" not in out:
            return None
        reps = np.asarray(out["output"])[:n]
        lengths = np.asarray(batch["lengths"])[:n]
        for i in range(n):
            valid = max(int(lengths[i]) // max(
                1, batch["signal"].shape[1] // reps.shape[1]), 1)
            all_outputs.append(reps[i, : min(valid, reps.shape[1])])
        all_labels.extend(np.asarray(batch["labels"])[:n])

    image, score = plot_projection(all_outputs, np.asarray(all_labels),
                                   frames_per_example=5, newline=True)
    if image is not None:
        try:
            import imageio  # pragma: no cover

            imageio.imwrite(
                os.path.join(summaries_dir, f"projection_fold{fold}.png"),
                image)
        except Exception:
            try:
                from matplotlib import pyplot as plt

                plt.imsave(
                    os.path.join(summaries_dir, f"projection_fold{fold}.png"),
                    image)
            except Exception:
                pass
    return score
