"""K-fold split generators (reference ops/folds.py:6-24).

- ``train_validation_data``: plain shuffled KFold (noisy set).
- ``train_validation_data_stratified``: multilabel-stratified KFold (curated
  set). The reference uses ``iterstrat.ml_stratifiers.MultilabelStratifiedKFold``;
  that package is a pure-Python implementation of Sechidis et al. (2011)
  iterative stratification, re-implemented here from the algorithm so fold
  *semantics* (balanced per-class label counts across folds, deterministic
  under a seed) are preserved without the dependency.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
from sklearn.model_selection import KFold


def train_validation_data(ids, labels, n_folds: int, seed: int):
    """Plain shuffled KFold, reference ops/folds.py:6-10."""
    for train, valid in KFold(
        n_folds, shuffle=True, random_state=seed
    ).split(np.arange(len(ids))):
        yield train, valid


def iterative_stratification(
    binary_labels: np.ndarray, n_folds: int, seed: int
) -> np.ndarray:
    """Assign each sample to a fold via iterative stratification.

    Sechidis, Tsoumakas & Vlahavas, "On the Stratification of Multi-Label
    Data" (ECML 2011) — the algorithm behind iterstrat. Returns fold id per
    sample. Samples with no labels are dealt round-robin to the least-filled
    folds at the end.
    """
    rng = np.random.RandomState(seed)
    n_samples, n_classes = binary_labels.shape
    labels = binary_labels > 0

    # desired number of samples / per-class labels per fold (uniform ratios)
    fold_sizes = np.full(n_folds, n_samples / n_folds)
    per_class_total = labels.sum(axis=0).astype(np.float64)
    fold_class_desired = np.tile(per_class_total / n_folds, (n_folds, 1))

    fold_of = np.full(n_samples, -1, dtype=np.int64)
    remaining = labels.copy()
    unassigned = np.ones(n_samples, dtype=bool)

    while True:
        counts = remaining[unassigned].sum(axis=0)
        active = np.flatnonzero(counts > 0)
        if active.size == 0:
            break
        # class with fewest remaining labels (ties broken randomly)
        min_count = counts[active].min()
        tied = active[counts[active] == min_count]
        cls = tied[rng.randint(len(tied))] if len(tied) > 1 else tied[0]

        sample_ids = np.flatnonzero(unassigned & remaining[:, cls])
        # iterstrat shuffles candidate processing order under the rng
        rng.shuffle(sample_ids)
        for s in sample_ids:
            # fold wanting this class most; tie -> fold wanting most samples
            # overall; further tie -> random
            want = fold_class_desired[:, cls]
            best = np.flatnonzero(want == want.max())
            if len(best) > 1:
                sizes = fold_sizes[best]
                best = best[sizes == sizes.max()]
                fold = best[rng.randint(len(best))] if len(best) > 1 else best[0]
            else:
                fold = best[0]
            fold_of[s] = fold
            unassigned[s] = False
            fold_class_desired[fold, labels[s]] -= 1
            fold_sizes[fold] -= 1
            remaining[s] = False

    # leftover zero-label samples: feed the emptiest folds
    for s in np.flatnonzero(unassigned):
        fold = int(np.argmax(fold_sizes))
        fold_of[s] = fold
        fold_sizes[fold] -= 1

    return fold_of


class MultilabelStratifiedKFold:
    """Drop-in equivalent of iterstrat's MultilabelStratifiedKFold."""

    def __init__(self, n_splits: int, shuffle: bool = True,
                 random_state: int | None = None):
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def split(self, X, y) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        y = np.asarray(y)
        seed = self.random_state if self.random_state is not None else 0
        fold_of = iterative_stratification(y, self.n_splits, seed)
        indices = np.arange(len(y))
        for fold in range(self.n_splits):
            valid = indices[fold_of == fold]
            train = indices[fold_of != fold]
            yield train, valid


def binarize_label_strings(label_strings, classmap: dict) -> np.ndarray:
    """Comma-separated class-name strings -> (N, C) binary matrix
    (reference ops/folds.py:16-20 / ops/transforms.py:25-41)."""
    out = np.zeros((len(label_strings), len(classmap)), dtype=np.float32)
    for k, item in enumerate(label_strings):
        for label in str(item).split(","):
            out[k, classmap[label]] = 1.0
    return out


def train_validation_data_stratified(
    ids, labels, classmap: dict, n_folds: int, seed: int
):
    """Reference ops/folds.py:13-24: stratified splits over the curated set."""
    label_values = labels.values if hasattr(labels, "values") else labels
    binary = binarize_label_strings(list(label_values), classmap)
    for train, valid in MultilabelStratifiedKFold(
        n_folds, shuffle=True, random_state=seed
    ).split(np.arange(len(binary)), binary):
        yield train, valid
